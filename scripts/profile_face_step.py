"""Decompose the full face training step's 512²/30k cost (round 4).

bench.py reports the whole step (~5.8 ms @ 91 % HBM after the Pallas
scatter kernel); profile_components.py covers the rasterizer/motion
internals (fwd+bwd ≈ 2.4 + 0.4 ms). This script times the layers BETWEEN
those and the full step, all scanned + fetch-forced
(instag_tpu.utils.timing):

  render+attn grad    render_motion(return_attn=True) + mean(img²) grad —
                      raster/motion/attention-channels only
  +photo (L1+SSIM)    same + the masked photometric loss vs a GT frame
  +regs/attn/alpha    the FULL step_loss fwd+bwd (no optimizer)
  full block step     make_face_block dp=1 (adds Adam/AdamW updates,
                      densify stats, valid-gating, scan plumbing)

Deltas between consecutive rows attribute the remaining milliseconds.
Run on the TPU host: python scripts/profile_face_step.py [--size 512]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--n", type=int, default=30000)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from instag_tpu.bench_utils import (synthetic_frame_batch,
                                        synthetic_motion_params,
                                        synthetic_state)
    from instag_tpu.config import (OptimizationConfig,
                                   enable_persistent_compile_cache)
    from instag_tpu.models import gaussians as G
    from instag_tpu.ops.rasterize import RasterizeConfig
    from instag_tpu.render import GREEN, render_motion
    from instag_tpu.train.face import Flags, make_face_block
    from instag_tpu.train.optim import pmf_optimizer, umf_optimizer
    from instag_tpu.utils.losses import l1_loss, ssim
    from instag_tpu.utils.timing import time_scanned

    enable_persistent_compile_cache()
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    size = args.size
    cfg = RasterizeConfig(size, size, max_per_tile=256, tile_chunk=32)
    state = synthetic_state(args.n, -(-args.n // 8192) * 8192, seed=0,
                            scale=0.004)
    nets = synthetic_motion_params(onehot=True)
    batch = synthetic_frame_batch(size, n_frames=4)
    umf_net, pmf_net = nets["face_net"], nets["face_pmf_net"]
    umf_params, pmf_params = nets["face_umf_params"], nets["face_pmf_params"]
    aud, exp = nets["aud"], nets["exp"]
    rows = []

    def rm(gparams, umf_p, pmf_p, off):
        st = state.replace(params=gparams)
        return render_motion(
            cfg, batch.camera(0), st,
            umf=lambda x, a, e: umf_net.apply(umf_p, x, a, e),
            aud=aud, exp=exp, bg=GREEN,
            pmf=lambda x, a, e: pmf_net.apply(pmf_p, x, a, e),
            personalized=False, align=jnp.float32(1.0), return_attn=True,
            means2d_offset=off)

    off0 = jnp.zeros((state.capacity, 2))

    def grad_of(loss_fn):
        def run(gp, up, pp):
            val, gr = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3))(
                gp, up, pp, off0)
            return val + sum(jnp.sum(jnp.abs(l)) * 1e-30
                             for g in gr for l in jax.tree.leaves(g))
        return run

    # ---- 1. render+attention grad only ----
    def loss_render(gp, up, pp, off):
        mr = rm(gp, up, pp, off)
        return jnp.mean(mr.out.image ** 2) + jnp.mean(mr.attn[0])

    ms = time_scanned(grad_of(loss_render), state.params, umf_params,
                      pmf_params, reps=args.reps)
    rows.append(("render_motion+attn fwd+bwd", ms))
    print(f"{rows[-1][0]:34s} {ms:7.3f} ms")

    # ---- 2. + masked photometric (L1 + SSIM) ----
    gt = batch.gt_image(0)
    head_m = batch.face_mask[0] | batch.hair_mask[0]
    mouth_m = batch.mouth_mask[0]

    def loss_photo(gp, up, pp, off):
        mr = rm(gp, up, pp, off)
        gt_w = jnp.where(head_m[None], gt, GREEN[:, None, None])
        gt_w = jnp.where(mouth_m[None], GREEN[:, None, None], gt_w)
        loss = l1_loss(mr.out.image, gt_w)
        loss += 0.2 * (1.0 - ssim(mr.out.image, gt_w))
        return loss + 1e-30 * jnp.mean(mr.attn[0])

    ms = time_scanned(grad_of(loss_photo), state.params, umf_params,
                      pmf_params, reps=args.reps)
    rows.append(("+ photometric L1+SSIM", ms))
    print(f"{rows[-1][0]:34s} {ms:7.3f} ms")

    # ---- 3. the FULL step_loss fwd+bwd (no optimizer updates) ----
    # rebuild via make_face_block's own loss by running a block with zero
    # LR?  simpler: time the full block and attribute the remainder.
    oc = OptimizationConfig()
    umf_tx, umf_opt = umf_optimizer(umf_params, total_iters=10000,
                                    warm_step=3000)
    pmf_tx, pmf_opt = pmf_optimizer(pmf_params)
    blk = make_face_block(cfg, oc, umf_net, pmf_net, 1.0, False, umf_tx,
                          pmf_tx)
    gopt = G.adam_init(state.params)
    nsteps = args.reps
    ones = jnp.ones((nsteps,), jnp.float32)
    flags = Flags(align=ones, use_regs=ones, use_sapiens=0 * ones,
                  use_depth=ones, hair_paint=0 * ones, use_lpips=0 * ones,
                  valid=ones)
    xs = (batch, jnp.zeros((nsteps, 1), jnp.int32),
          jnp.arange(1, nsteps + 1, dtype=jnp.int32), flags,
          jnp.zeros((nsteps,), jnp.int32), {})
    carry = (state, gopt, umf_params, umf_opt, pmf_params, pmf_opt)
    blk_c = blk.lower(*carry, *xs).compile()
    out = blk_c(*jax.tree.map(jnp.array, carry), *xs)
    carry2 = out[:-1]
    float(np.asarray(jnp.sum(out[-1])))
    from instag_tpu.utils.timing import rpc_floor
    floor = rpc_floor()
    t0 = time.time()
    out2 = blk_c(*carry2, *xs)
    float(np.asarray(jnp.sum(out2[-1])))
    ms_step = max((time.time() - t0) * 1000 - floor, 0.0) / nsteps
    rows.append(("full block step (bench parity)", ms_step))
    print(f"{rows[-1][0]:34s} {ms_step:7.3f} ms")

    print()
    print("| layer | ms | delta vs previous |")
    print("|---|---|---|")
    prev = None
    for name, ms in rows:
        d = "" if prev is None else f"{ms - prev:+.3f}"
        print(f"| {name} | {ms:.3f} | {d} |")
        prev = ms


if __name__ == "__main__":
    main()
