"""CLI: single-process few-shot adaptation pipeline.

Runs the full chain train_face -> train_mouth -> train_fuse -> synthesize
(the reference's scripts/train_xx_few.sh, which spawns four interpreters)
inside ONE process: the JAX backend initializes once, the eager-op warmup
happens once, and intermediate bundles pass in memory instead of through
disk round trips. Saves the exact same artifacts as the per-stage CLIs, so
the pipelines are interchangeable.

    python -m instag_tpu.cli.adapt --source_path data/<id> \
        --model_path output/<id> [--pretrain_path output/pretrain] \
        [--long] [--iterations 10000] [--fuse_iterations 2000] \
        [--n_views 250] [--dilate]
"""

from __future__ import annotations

import dataclasses
import os
import time

from ..config import make_parser, parse_all, save_cfg
from ..io.checkpoints import (load_bundle, save_bundle, save_gaussian_ply,
                              state_to_dict)


def main(argv=None):
    parser = make_parser("Single-process few-shot adaptation")
    parser.add_argument("--long", action="store_true")
    parser.add_argument("--pretrain_path", type=str, default="",
                        help="pretrain output dir holding "
                             "chkpnt_ema_{face,mouth}_latest.pkl")
    parser.add_argument("--fuse_iterations", type=int, default=2000)
    parser.add_argument("--dilate", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--skip_synthesis", action="store_true")
    parser.add_argument("--fast", action="store_true",
                        help="skip variant videos, PLY dumps and metrics "
                             "(reference synthesize_fuse.py --fast)")
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="frames per face-adaptation optimizer step; "
                             ">1 shards the batch over a 'dp' device mesh")
    mc, _, oc, args = parse_all(parser, argv)
    t0 = time.time()

    dp_mesh = None
    if args.data_parallel > 1:
        from ..parallel import make_mesh
        dp_mesh = make_mesh(args.data_parallel)

    def stage(name):
        print(f"[adapt] {name} (t={time.time() - t0:.0f}s)", flush=True)

    def load_pre(which):
        if not args.pretrain_path:
            return None
        p = os.path.join(args.pretrain_path,
                         f"chkpnt_ema_{which}_latest.pkl")
        if not os.path.exists(p):
            return None
        b = load_bundle(p)
        return ({"umf_params": b["ema_params"]} if "ema_params" in b else b)

    # ---- face ----
    stage("train_face")
    from ..train.face import train_face
    mc.type = "face"
    face_res = train_face(mc, oc, pretrain_bundle=load_pre("face"),
                          long=args.long, seed=args.seed,
                          data_parallel=args.data_parallel, dp_mesh=dp_mesh)
    face_bundle = dict(state=face_res["state"],
                       umf_params=face_res["umf_params"],
                       pmf_params=face_res["pmf_params"],
                       gopt=face_res["gopt"],
                       umf_opt_state=face_res["umf_opt_state"],
                       pmf_opt_state=face_res["pmf_opt_state"])
    save_cfg(mc.model_path, mc)
    save_bundle(os.path.join(mc.model_path, "chkpnt_face_latest.pkl"),
                {**face_bundle, "state": state_to_dict(face_res["state"]),
                 "iteration": oc.iterations,
                 "max_sh_degree": face_res["max_sh_degree"]})
    save_gaussian_ply(os.path.join(
        mc.model_path, "point_cloud", f"iteration_{oc.iterations}_face",
        "point_cloud.ply"), face_res["state"])

    # ---- mouth ----
    stage("train_mouth")
    from ..train.mouth import train_mouth
    mcm = dataclasses.replace(mc, type="mouth")
    mouth_res = train_mouth(mcm, oc, face_bundle=face_bundle,
                            pretrain_bundle=load_pre("mouth"),
                            long=args.long, seed=args.seed)
    save_bundle(os.path.join(mc.model_path, "chkpnt_mouth_latest.pkl"),
                dict(state=state_to_dict(mouth_res["state"]),
                     umf_params=mouth_res["umf_params"],
                     pmf_params=mouth_res["pmf_params"],
                     gopt=mouth_res["gopt"],
                     umf_opt_state=mouth_res["umf_opt_state"],
                     pmf_opt_state=mouth_res["pmf_opt_state"],
                     iteration=oc.iterations))

    # ---- fuse ----
    stage("train_fuse")
    from ..train.fuse import train_fuse
    # fusion opacity LR 1e-3 as the reference pipeline passes it
    # (train_xx_few.sh:21 --opacity_lr 0.001)
    ocf = dataclasses.replace(oc, iterations=args.fuse_iterations,
                              opacity_lr=1e-3)
    mouth_bundle = dict(state=mouth_res["state"],
                        umf_params=mouth_res["umf_params"],
                        pmf_params=mouth_res["pmf_params"])
    fuse_res = train_fuse(mc, ocf, face_bundle, mouth_bundle, seed=args.seed)
    fuse_bundle = dict(
        face_state=fuse_res["face_state"],
        mouth_state=fuse_res["mouth_state"],
        face_umf_params=fuse_res["face_umf_params"],
        mouth_umf_params=fuse_res["mouth_umf_params"],
        face_pmf_params=fuse_res["face_pmf_params"],
        mouth_pmf_params=fuse_res["mouth_pmf_params"])
    save_bundle(os.path.join(mc.model_path, "chkpnt_fuse_latest.pkl"),
                {**fuse_bundle,
                 "face_state": state_to_dict(fuse_res["face_state"]),
                 "mouth_state": state_to_dict(fuse_res["mouth_state"]),
                 "iteration": args.fuse_iterations})

    # ---- synthesize + metrics (the reference chain ends with
    # `metrics.py renders/out.mp4 gt/out.mp4`, train_xx_few.sh last line) ----
    if not args.skip_synthesis:
        stage("synthesize")
        from ..synthesize import synthesize
        out = os.path.join(mc.model_path, "out.mp4")
        video, fps = synthesize(
            mc, fuse_bundle, split="val", audio_file=mc.audio,
            dilate=args.dilate, out_path=out, dump_plys=0 if args.fast else 11,
            ply_dir=os.path.join(mc.model_path, "deformed_ply"),
            fast=args.fast)
        print(f"[adapt] wrote {out}: {video.shape[0]} frames "
              f"@ {fps:.1f} FPS synthesis")

        if not args.fast:
            stage("metrics")
            import json
            import numpy as np
            from ..data.dataset import load_frames
            from ..metrics import evaluate_frames
            gt = np.stack([r.image for r in load_frames(
                mc.source_path, "val", mc.audio_extractor, -1)])
            scores = evaluate_frames(video, gt.astype(np.uint8))
            mpath = os.path.join(mc.model_path, "metrics.json")
            with open(mpath, "w") as f:
                json.dump(scores, f, indent=1)
            print("[adapt] metrics: " + " ".join(
                f"{k}={v:.4f}" for k, v in scores.items()
                if isinstance(v, float)) + f" -> {mpath}")

    print(f"[adapt] total wall: {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
