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


def _warm_stage_compiles(mc, oc, fuse_iterations: int,
                         mouth_init_num: int = 0, dilate: bool = False,
                         fast: bool = False) -> None:
    """Background thread: AOT-compile the mouth and fuse training blocks
    with this run's exact shapes while the face stage trains, so the later
    stages hit the persistent compile cache (~4 s) instead of paying the
    cold XLA compile (~45-60 s each).

    Builds the same blocks the trainers build (same nets, optimizer
    schedules, batch shapes and baked constants — these determine the HLO
    cache key). Any drift from the real trainers is benign: the cache
    simply misses and the stage compiles exactly as before.
    """
    try:
        import dataclasses
        import time as _time

        # let the face stage's own (cold) block compile claim the host CPU
        # first; by now face training is device-bound and the core is idle.
        # On warm-cache runs these compiles are hits (~seconds) anyway.
        _time.sleep(90)

        import jax
        import jax.numpy as jnp

        from ..data.dataset import random_init_points, scene_extent
        from ..models import gaussians as G
        from ..models.lpips import load_lpips_params
        from ..models.motion import (MotionNetwork, MouthMotionNetwork,
                                     PersonalizedMotionNetwork)
        from ..ops.rasterize import RasterizeConfig
        from ..train.common import build_frame_batch, load_training_frames
        from ..train.fuse import fuse_patch_sizes, make_fuse_block
        from ..train.mouth import MouthFlags, make_mouth_block
        from ..train.optim import pmf_optimizer, umf_optimizer

        records = load_training_frames(mc)
        if len(records) > 1000:       # streaming shapes differ per block
            return
        batch = build_frame_batch(records)
        _, extent = scene_extent(records)
        h, w = records[0].height, records[0].width
        cfg = RasterizeConfig(h, w, max_per_tile=mc.max_per_tile,
                              approx_topk=mc.approx_topk)
        capacity = mc.resolve_capacity()
        m_init = mouth_init_num or mc.init_num
        mcm = dataclasses.replace(mc, init_num=m_init)
        m_capacity = mcm.resolve_capacity()
        interval = oc.densification_interval

        def mk_state(seed, init=None, cap=None):
            xyz, colors = random_init_points(init or mc.init_num, seed)
            st = G.create_from_points(jnp.asarray(xyz), jnp.asarray(colors),
                                      cap or capacity, mc.sh_degree, extent)
            return st, G.adam_init(st.params)

        # ---- mouth block (mirrors train/mouth.py setup) ----
        mouth_net = MouthMotionNetwork(mc.audio_extractor)
        mouth_pmf = PersonalizedMotionNetwork("mouth", mc.audio_extractor)
        face_net = MotionNetwork(mc.audio_extractor)
        st, gopt = mk_state(0, init=m_init, cap=m_capacity)
        k = jax.random.key(0)
        x0, a0 = st.params.xyz[:8], batch.auds[0]
        m_umf = jax.jit(mouth_net.init)(k, x0, a0, jnp.zeros((1, 3)))
        m_pmf = jax.jit(mouth_pmf.init)(k, x0, a0)
        f_umf = jax.jit(face_net.init)(k, x0, a0, batch.au_exp[0])
        umf_tx, umf_opt = umf_optimizer(m_umf, total_iters=oc.iterations,
                                        warm_step=3000, long=False)
        pmf_tx, pmf_opt = pmf_optimizer(m_pmf)
        # the face state the mouth trainer freezes has FACE sh_degree (1
        # unless --long; cli/adapt trains face with max_sh 1)
        fst = G.create_from_points(st.params.xyz[:mc.init_num] * 1.0,
                                   jnp.ones((mc.init_num, 3)) * 0.5,
                                   capacity, 1, extent)
        blk = make_mouth_block(cfg, oc, mouth_net, mouth_pmf, face_net,
                               extent, umf_tx, pmf_tx)
        n = interval
        flags = MouthFlags(align=jnp.ones((n,), jnp.float32),
                           use_regs=jnp.ones((n,), jnp.float32),
                           valid=jnp.ones((n,), jnp.float32))
        blk.lower(st, gopt, m_umf, umf_opt, m_pmf, pmf_opt, fst, f_umf,
                  batch, jnp.zeros((n, 1), jnp.int32),
                  jnp.arange(1, n + 1, dtype=jnp.int32),
                  jnp.full((n,), 10, jnp.int32), flags).compile()
        print("[adapt] warmed mouth-block executable", flush=True)

        # ---- fuse block (mirrors train/fuse.py setup) ----
        face_net_i = MotionNetwork(mc.audio_extractor, onehot=False)
        mouth_net_i = MouthMotionNetwork(mc.audio_extractor, onehot=False)
        face_pmf_i = PersonalizedMotionNetwork("face", mc.audio_extractor,
                                               onehot=False)
        mouth_pmf_i = PersonalizedMotionNetwork("mouth", mc.audio_extractor,
                                                onehot=False)
        lm, lp, _ = load_lpips_params()
        lpips_call = lambda lp_, a, b: lm.apply(lp_, a, b)
        patch_sizes = fuse_patch_sizes(h, w)
        ocf = dataclasses.replace(oc, iterations=fuse_iterations,
                                  opacity_lr=1e-3)
        fblk = make_fuse_block(cfg, ocf, face_net_i, mouth_net_i, face_pmf_i,
                               mouth_pmf_i, extent, lpips_call, patch_sizes)
        # fuse consumes the trained face cloud (max_sh 1 in few-shot,
        # train_face.py:95-96) and the mouth cloud (mc.sh_degree)
        xyzf, colf = random_init_points(mc.init_num, 1)
        fst2 = G.create_from_points(jnp.asarray(xyzf), jnp.asarray(colf),
                                    capacity, 1, extent)
        fgopt = G.adam_init(fst2.params)
        mst2, mgopt = mk_state(2, init=m_init, cap=m_capacity)
        f_umf2 = jax.jit(face_net_i.init)(k, x0, a0, batch.au_exp[0])
        m_umf2 = jax.jit(mouth_net_i.init)(k, x0, a0, jnp.zeros((1, 3)))
        f_pmf2 = jax.jit(face_pmf_i.init)(k, x0, a0, batch.au_exp[0])
        m_pmf2 = jax.jit(mouth_pmf_i.init)(k, x0, a0)
        bl = 100
        fblk.lower(fst2, fgopt, mst2, mgopt, f_umf2, m_umf2, f_pmf2, m_pmf2,
                   batch, jnp.zeros((bl, 1), jnp.int32),
                   jnp.arange(1, bl + 1, dtype=jnp.int32),
                   jnp.zeros((bl,), jnp.int32),
                   jnp.zeros((bl,), jnp.float32),
                   jnp.ones((bl,), jnp.float32), lp).compile()
        print("[adapt] warmed fuse-block executable", flush=True)

        # ---- synthesis program (arg-based since round 3 => its cache key
        # is shapes-only, so warming here saves the ~60-100 s compile the
        # synthesis stage used to pay on every run) ----
        if not fast:
            from ..data.dataset import load_frames
            from ..synthesize import (DISPATCH_CHUNK,
                                      make_synthesis_chunk_fn)
            vrecords = load_frames(mc.source_path, "val", mc.audio_extractor,
                                   -1, audio_file=mc.audio)
            if vrecords:
                vbatch = build_frame_batch(vrecords)
                synth = make_synthesis_chunk_fn(cfg, mc, dilate, False,
                                                variants=True)
                synth.lower(fst2, mst2, f_umf2, m_umf2, f_pmf2, m_pmf2,
                            vbatch,
                            jnp.zeros((DISPATCH_CHUNK,), jnp.int32)
                            ).compile()
                print("[adapt] warmed synthesis executable", flush=True)
    except Exception as e:  # warming is best-effort; stages self-compile
        print(f"[adapt] stage warm-ahead skipped: {type(e).__name__}: {e}",
              flush=True)


def main(argv=None):
    parser = make_parser("Single-process few-shot adaptation")
    parser.add_argument("--long", action="store_true")
    parser.add_argument("--pretrain_path", type=str, default="",
                        help="pretrain output dir holding "
                             "chkpnt_ema_{face,mouth}_latest.pkl")
    parser.add_argument("--fuse_iterations", type=int, default=2000)
    parser.add_argument("--mouth_init_num", type=int, default=0,
                        help="initial mouth-cloud size; 0 keeps --init_num. "
                             "The reference pipeline trains mouth with 5000 "
                             "vs face 2000 (train_xx_few.sh:19-20)")
    parser.add_argument("--dilate", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--skip_synthesis", action="store_true")
    parser.add_argument("--fast", action="store_true",
                        help="skip variant videos, PLY dumps and metrics "
                             "(reference synthesize_fuse.py --fast)")
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="frames per face-adaptation optimizer step; "
                             ">1 shards the batch over a 'dp' device mesh")
    parser.add_argument("--no_warm_ahead", action="store_true",
                        help="disable background compilation of the mouth/"
                             "fuse executables during the face stage")
    parser.add_argument("--no_lpips", action="store_true",
                        help="drop the perceptual-loss phases (face "
                             "lpips_start..densify_until, fuse second half) "
                             "— for A/Bs bounding the random-feature "
                             "fallback (scripts/exp_lpips_fallback.py)")
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

    # overlap the mouth/fuse XLA compiles with the face stage (cold-run
    # warm-up: each big block costs ~45-60 s to compile; warming populates
    # the persistent cache so the real stages compile in seconds).
    # Under --adaptive_capacity the runtime shapes depend on how the cloud
    # prunes, so pre-built executables would mostly miss — and the warm
    # thread's compile RPCs measurably stall the face stage's dispatches
    # over a tunneled device (BASELINE.md r3) — skip it.
    if getattr(mc, "adaptive_capacity", False):
        pass
    elif not (args.long or args.no_warm_ahead):
        import threading
        threading.Thread(target=_warm_stage_compiles,
                         args=(mc, oc, args.fuse_iterations,
                               args.mouth_init_num, args.dilate, args.fast),
                         daemon=True).start()

    # ---- face ----
    stage("train_face")
    from ..train.face import train_face
    mc.type = "face"
    face_res = train_face(mc, oc, pretrain_bundle=load_pre("face"),
                          long=args.long, seed=args.seed,
                          lpips_enabled=not args.no_lpips,
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
    if args.mouth_init_num > 0:
        mcm = dataclasses.replace(mcm, init_num=args.mouth_init_num,
                                  capacity=mc.capacity)
    mouth_res = train_mouth(mcm, oc, face_bundle=face_bundle,
                            pretrain_bundle=load_pre("mouth"),
                            long=args.long, seed=args.seed,
                            data_parallel=args.data_parallel,
                            dp_mesh=dp_mesh)
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
    fuse_res = train_fuse(mc, ocf, face_bundle, mouth_bundle, seed=args.seed,
                          lpips_enabled=not args.no_lpips,
                          data_parallel=args.data_parallel, dp_mesh=dp_mesh)
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
            from ..metrics import (evaluate_frames, lmd_from_landmarks,
                                   load_gt_landmarks, track_video_landmarks)
            val_records = load_frames(mc.source_path, "val",
                                      mc.audio_extractor, -1)
            gt = np.stack([r.image for r in val_records])
            scores = evaluate_frames(video, gt.astype(np.uint8))
            # LMD: dataset .lms for GT + FAN tracking on rendered frames
            # (reference metrics.py:189-217; FAN weights egress-gated —
            # track_video_landmarks loud-skips without them)
            t_lmd = min(len(video), len(val_records))
            gt_lms = load_gt_landmarks(
                mc.source_path, [r.img_id for r in val_records[:t_lmd]])
            if gt_lms is not None:
                pred_lms = track_video_landmarks(video[:t_lmd])
                if pred_lms is not None:
                    scores["lmd"] = lmd_from_landmarks(pred_lms, gt_lms)
            mpath = os.path.join(mc.model_path, "metrics.json")
            with open(mpath, "w") as f:
                json.dump(scores, f, indent=1)
            print("[adapt] metrics: " + " ".join(
                f"{k}={v:.4f}" for k, v in scores.items()
                if isinstance(v, float)) + f" -> {mpath}")

    print(f"[adapt] total wall: {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
