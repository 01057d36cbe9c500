"""CLI: single-process pre-training chain (face UMF -> mouth UMF).

Equivalent to cli/pretrain_face followed by cli/pretrain_mouth (the
reference's scripts/pretrain_con.sh two-process chain, pretrain_con.sh:10-11)
but in ONE process: the JAX backend initializes once, dataset records and
device frame batches are memoized across the two stages (load_frames /
build_frame_batch caches), and the face result feeds pretrain_mouth in
memory instead of via bundle reload. Saves the exact same artifacts as the
per-stage CLIs, so the pipelines are interchangeable.

    python -m instag_tpu.cli.pretrain --source_path data/pretrain \
        --model_path output/pretrain [--init_num 2000] [--mouth_init_num 5000]
        [--iterations 30000] [--densify_grad_threshold 5e-4]
        [--share_audio_net] [--identity_parallel]

Stage-specific constants follow the reference script: --init_num /
--densify_grad_threshold apply to the FACE stage; the mouth stage trains
with --mouth_init_num and the default densify threshold (the reference
passes neither to pretrain_mouth).
"""

from __future__ import annotations

import dataclasses
import os
import time

from ..config import make_parser, parse_all, save_cfg
from ..io.checkpoints import save_bundle, state_to_dict


def main(argv=None):
    parser = make_parser("Single-process pre-training chain (face -> mouth)")
    parser.add_argument("--data_list", type=str, default="",
                        help="comma-separated identity dir names under "
                             "source_path; default: all subdirs")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--share_audio_net", action="store_true",
                        help="tie PMF audio encoders to the UMF's "
                             "(reference pretrain_face.py:79; the esperanto/"
                             "hubert pipelines pass it)")
    parser.add_argument("--identity_parallel", action="store_true",
                        help="train all identities simultaneously over an "
                             "'id' device mesh (one device per identity)")
    parser.add_argument("--mouth_init_num", type=int, default=5000,
                        help="initial mouth-cloud size "
                             "(reference pretrain_con.sh:11)")
    parser.add_argument("--skip_mouth", action="store_true")
    mc, _, oc, args = parse_all(parser, argv)
    t0 = time.time()

    if args.data_list:
        data_list = args.data_list.split(",")
    else:
        data_list = sorted(
            d for d in os.listdir(mc.source_path)
            if os.path.isdir(os.path.join(mc.source_path, d)))

    def stage(name):
        print(f"[pretrain] {name} (t={time.time() - t0:.0f}s)", flush=True)

    # ---- face branch ----
    stage("pretrain_face")
    from ..train.pretrain import pretrain_face
    mcf = dataclasses.replace(mc, type="face")
    face = pretrain_face(mcf, oc, data_list, seed=args.seed,
                         share_audio_net=args.share_audio_net,
                         identity_parallel=args.identity_parallel)

    save_cfg(mc.model_path, mcf)
    save_bundle(os.path.join(mc.model_path, "chkpnt_face_latest.pkl"),
                dict(umf_params=face["umf_params"], data_list=data_list))
    save_bundle(os.path.join(mc.model_path, "chkpnt_ema_face_latest.pkl"),
                dict(umf_params=face["ema_params"],
                     ema_params=face["ema_params"], data_list=data_list))
    import jax
    for k, (name, st) in enumerate(zip(data_list, face["states"])):
        pmf = jax.tree.map(lambda x, k=k: x[k], face["pmf_stack"])
        save_bundle(os.path.join(mc.model_path, f"{name}_face_latest.pkl"),
                    dict(state=state_to_dict(st), pmf_params=pmf))

    if args.skip_mouth:
        print(f"[pretrain] total wall: {time.time() - t0:.0f}s", flush=True)
        return

    # ---- mouth branch (in-memory face result; reference pretrain_mouth.py
    # reloads chkpnt_face_latest.pth + the EMA face UMF, :80-98) ----
    stage("pretrain_mouth")
    from ..config import OptimizationConfig
    from ..train.pretrain import pretrain_mouth
    mcm = dataclasses.replace(mc, type="mouth", init_num=args.mouth_init_num)
    # the reference mouth stage runs with the DEFAULT densify threshold
    # (pretrain_con.sh:11 passes only init_num/iterations)
    ocm = dataclasses.replace(
        oc, densify_grad_threshold=OptimizationConfig().densify_grad_threshold)
    face_result = dict(states=face["states"], ema_params=face["ema_params"])
    mouth = pretrain_mouth(mcm, ocm, data_list, face_result, seed=args.seed,
                           identity_parallel=args.identity_parallel)

    save_bundle(os.path.join(mc.model_path, "chkpnt_mouth_latest.pkl"),
                dict(umf_params=mouth["umf_params"], data_list=data_list))
    save_bundle(os.path.join(mc.model_path, "chkpnt_ema_mouth_latest.pkl"),
                dict(umf_params=mouth["ema_params"],
                     ema_params=mouth["ema_params"], data_list=data_list))
    print(f"[pretrain] total wall: {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
