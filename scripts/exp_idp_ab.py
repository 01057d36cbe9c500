"""Identity-parallel vs serial pre-training convergence A/B (VERDICT r3
item 5): one idp step trains all n identities with a synchronized UMF
update (large-batch semantics, parallel/identity_parallel.py) — per-step
loss equality is tested in tests/test_parallel.py, but training OUTCOMES
over a real budget are what decide UMF quality. This script runs both arms
at the same seed/budget on the virtual CPU mesh and reports tail loss +
per-identity held-out PSNR.

The eval target matches the pre-training objective: render_motion with the
EMA UMF + the identity's PMF on held-out frames, scored against the
head-masked GREEN-background GT (train/pretrain.py make_pretrain_face_step).

Usage:
    python scripts/exp_idp_ab.py [--n_ids 2] [--iterations 2000]
        [--size 128] [--n_frames 40] [--warm_per_id 300] [--seed 11]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/idp_ab")
    ap.add_argument("--n_ids", type=int, default=2)
    ap.add_argument("--iterations", type=int, default=2000)
    ap.add_argument("--warm_per_id", type=int, default=300)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--n_frames", type=int, default=40)
    ap.add_argument("--n_val", type=int, default=8)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from instag_tpu.config import (ModelConfig, OptimizationConfig,
                                   enable_persistent_compile_cache)
    from instag_tpu.data.synthetic import generate_scene
    from instag_tpu.data.dataset import load_frames
    from instag_tpu.models.motion import (MotionNetwork,
                                          PersonalizedMotionNetwork)
    from instag_tpu.train.common import build_frame_batch
    from instag_tpu.train.pretrain import GREEN, pretrain_face
    from instag_tpu.render import render_motion
    from instag_tpu.utils.losses import psnr

    enable_persistent_compile_cache()
    names = [f"id{k}" for k in range(args.n_ids)]
    for k, name in enumerate(names):
        d = os.path.join(args.root, name)
        if not os.path.exists(os.path.join(d, "transforms_train.json")):
            generate_scene(d, n_frames=args.n_frames, size=args.size,
                           n_val=args.n_val, seed=args.seed + k,
                           variation=1.0, focal_mult=8.0)

    mc = ModelConfig(source_path=args.root, init_num=1000,
                     adaptive_capacity=False, capacity=4096)
    oc = OptimizationConfig(iterations=args.iterations,
                            densify_grad_threshold=0.0005,
                            position_lr_max_steps=args.iterations * 2)

    umf_net = MotionNetwork(mc.audio_extractor)
    pmf_net = PersonalizedMotionNetwork("face", mc.audio_extractor)

    def evaluate(res):
        """Per-identity held-out PSNR under the pre-training objective."""
        from instag_tpu.ops.rasterize import RasterizeConfig
        scores = []
        for k, name in enumerate(names):
            recs = load_frames(os.path.join(args.root, name), "val",
                               mc.audio_extractor, -1)
            vb = build_frame_batch(recs)
            cfg = res["cfg"]
            state = res["states"][k]
            pmf_p = jax.tree.map(lambda x, k=k: x[k], res["pmf_stack"])
            umf_p = res["ema_params"]

            @jax.jit
            def frame_psnr(i):
                cam = vb.camera(i)
                gt = vb.gt_image(i)
                head = vb.face_mask[i] | vb.hair_mask[i]
                gt_m = jnp.where(head[None], gt, GREEN[:, None, None])
                gt_m = jnp.where(vb.mouth_mask[i][None],
                                 GREEN[:, None, None], gt_m)
                mr = render_motion(
                    cfg, cam, state,
                    umf=lambda x, a, e: umf_net.apply(umf_p, x, a, e),
                    aud=vb.auds[i], exp=vb.au_exp[i], bg=GREEN,
                    pmf=lambda x, a, e: pmf_net.apply(pmf_p, x, a, e),
                    personalized=True, align=True)
                return psnr(mr.out.image, gt_m)

            vals = [float(frame_psnr(jnp.int32(i)))
                    for i in range(vb.num_frames)]
            scores.append(float(np.mean(vals)))
        return scores

    out = {"metric": "idp_vs_serial_psnr_delta_db", "unit": "dB",
           "n_ids": args.n_ids, "iterations_per_id": args.iterations,
           "size": args.size, "seed": args.seed}
    for arm, idp in (("serial", False), ("idp", True)):
        t0 = time.time()
        res = pretrain_face(mc, oc, names, seed=args.seed,
                            warm_per_id=args.warm_per_id,
                            identity_parallel=idp)
        wall = time.time() - t0
        tail = float(np.mean(res["losses"][-500:]))
        scores = evaluate(res)
        out[arm] = {"tail_loss": round(tail, 5),
                    "heldout_psnr_per_id": [round(s, 3) for s in scores],
                    "heldout_psnr_mean": round(float(np.mean(scores)), 3),
                    "wall_s": round(wall, 1)}
        print(f"# arm {arm}: tail {tail:.5f} "
              f"psnr {out[arm]['heldout_psnr_mean']} wall {wall:.0f}s",
              file=sys.stderr, flush=True)
    out["value"] = round(out["idp"]["heldout_psnr_mean"]
                         - out["serial"]["heldout_psnr_mean"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
