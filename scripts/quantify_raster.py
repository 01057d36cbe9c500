"""Quantify the rasterizer's approximation knobs (VERDICT r1 item 4).

Measures, at 512x512 / 30k splats (adapted-model scale):
  * per-tile front-K truncation: K in {128, 256, 512} vs an exact K=1024
    oracle image (PSNR of the rendered image against the oracle);
  * approx_max_k selection (recall 0.95) vs exact top_k at each K;
  * fwd and fwd+bwd wall time per config on the Pallas backend;
  * tile-saturation stats from `selection_stats`.

Prints a markdown table for BASELINE.md. Run on the TPU host:
    python scripts/quantify_raster.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from instag_tpu.ops.rasterize import (RasterizeConfig, rasterize,
                                      selection_stats)
from instag_tpu.utils.graphics import projection_matrix, world_to_view


def make_inputs(n=30000, seed=0):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32))
    scales = jnp.asarray((0.004 + 0.006 * rng.uniform(size=(n, 3))).astype(np.float32))
    rots = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.3, 0.95, (n, 1)).astype(np.float32))
    shs = jnp.asarray((0.3 * rng.normal(size=(n, 4, 3))).astype(np.float32))
    Rm = np.eye(3)
    w2c = world_to_view(Rm, np.array([0.0, 0.0, 2.0]))
    proj = projection_matrix(0.01, 100.0, 0.7, 0.7)
    cam = (jnp.asarray(w2c.T), jnp.asarray((proj @ w2c).T),
           jnp.asarray(np.linalg.inv(w2c)[:3, 3].astype(np.float32)),
           float(np.tan(0.35)), float(np.tan(0.35)))
    return (means, opac, scales, rots, shs), cam


def render_img(cfg, inputs, cam):
    means, opac, scales, rots, shs = inputs
    view, full, campos, tfx, tfy = cam
    bg = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    fn = jax.jit(lambda *a: rasterize(cfg, *a, shs=shs, sh_degree=1, bg=bg))
    img = fn(means, opac, scales, rots, view, full, campos, tfx, tfy).image
    return np.asarray(jax.block_until_ready(img))


def time_fwd_bwd(cfg, inputs, cam, steps=20):
    from instag_tpu.utils.timing import time_scanned
    means, opac, scales, rots, shs = inputs
    view, full, campos, tfx, tfy = cam
    bg = jnp.array([0.0, 1.0, 0.0], jnp.float32)

    def loss(m, o, s, r, sh):
        out = rasterize(cfg, m, o, s, r, view, full, campos, tfx, tfy, bg,
                        shs=sh, sh_degree=1)
        return jnp.mean(jnp.abs(out.image)) + 0.1 * jnp.mean(out.alpha)

    grad = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))
    return {
        "fwd": time_scanned(loss, *inputs, reps=steps),
        "fwd+bwd": time_scanned(grad, *inputs, reps=steps),
    }


def psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def main():
    H = W = 512
    inputs, cam = make_inputs()
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    oracle_cfg = RasterizeConfig(H, W, max_per_tile=1024, approx_topk=False,
                                 backend="xla", tile_chunk=8)
    print("rendering exact K=1024 oracle...", file=sys.stderr)
    oracle = render_img(oracle_cfg, inputs, cam)

    stats_fn = jax.jit(lambda m, s, r: selection_stats(
        RasterizeConfig(H, W, max_per_tile=256), m, s, r, cam[0], cam[1],
        cam[2], cam[3], cam[4]))
    st = {k: float(v) for k, v in
          stats_fn(inputs[0], inputs[2], inputs[3]).items()}
    print(f"tile hits: mean={st['mean_hits']:.1f} max={st['max_hits']:.0f} "
          f"saturated(K=256)={st['saturated_frac']*100:.2f}%")

    print("| K | select | PSNR vs exact-1024 (dB) | fwd ms | fwd+bwd ms |")
    print("|---|--------|--------------------------|--------|------------|")
    for K in (128, 256, 512):
        for approx in (False, True):
            cfg = RasterizeConfig(H, W, max_per_tile=K, approx_topk=approx,
                                  backend=backend)
            img = render_img(cfg, inputs, cam)
            tms = time_fwd_bwd(cfg, inputs, cam)
            sel = "approx .95" if approx else "exact"
            print(f"| {K} | {sel} | {psnr(img, oracle):.1f} "
                  f"| {tms['fwd']:.1f} | {tms['fwd+bwd']:.1f} |", flush=True)


if __name__ == "__main__":
    main()
