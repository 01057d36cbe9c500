"""Full-frame rasterizer parity vs the brute-force sequential oracle.

VERDICT r3 missing 3 context: reference-vs-ours cross-framework parity
needs reference GPU outputs this image cannot produce. The in-env
complement: the brute-force oracle (`ops/reference_splat.py`) implements
the CUDA rasterizer's exact sequential semantics — global depth order, no
tiling, no per-tile K truncation, the alpha floor / transmittance
early-exit of diff_gauss forward.cu — so comparing the production TPU
rasterizer against it AT PRODUCTION SCALE (512x512, 30k splats, the
adapted-model shape bench.py times) bounds every approximation the
TPU-native design introduces (per-tile front-K truncation + approx_max_k
selection + f32 cumsum-composite order), on top of the tiny-scene unit
tests that already pin the math (tests/test_rasterize.py).

Rows: the production config (approx recall 0.9 — what ships) and the
exact-selection config (approx_topk=False), decomposing approximate
selection from K truncation. Run on the TPU host:

    python scripts/parity_fullframe.py [N]

Prints a markdown table for BASELINE.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from instag_tpu.ops.rasterize import RasterizeConfig, rasterize
from instag_tpu.ops.reference_splat import splat_reference
from quantify_raster import make_inputs


def psnr(a, b, peak=1.0):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10 * np.log10(peak * peak / max(mse, 1e-20))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    size = 512
    inputs, cam = make_inputs(n=n)
    means, opac, scales, rots, shs = inputs
    view, full, campos, tfx, tfy = cam
    bg = jnp.array([0.0, 1.0, 0.0], jnp.float32)

    t0 = time.time()
    oracle = splat_reference(RasterizeConfig(size, size), means, opac,
                             scales, rots, view, full, campos, tfx, tfy,
                             bg, shs=shs, sh_degree=1, bbox_sigma=4.0)
    o_img, o_dep, o_nrm, o_alp = (np.asarray(x) for x in oracle)
    t_oracle = time.time() - t0
    print(f"# oracle sweep ({n} splats @ {size}^2, bbox 4 sigma): "
          f"{t_oracle:.1f} s")

    rows = []
    for label, cfg in [
        ("production (approx recall 0.9, K=256)",
         RasterizeConfig(size, size)),
        ("exact selection (top_k, K=256)",
         RasterizeConfig(size, size, approx_topk=False)),
        ("exact selection, K=1024",
         RasterizeConfig(size, size, approx_topk=False, max_per_tile=1024,
                         tile_chunk=8)),
    ]:
        fn = jax.jit(lambda *a, c=cfg: rasterize(
            c, *a, shs=shs, sh_degree=1, bg=bg))
        out = jax.block_until_ready(
            fn(means, opac, scales, rots, view, full, campos, tfx, tfy))
        img = np.asarray(out.image)
        alp = np.asarray(out.alpha)
        dep = np.asarray(out.depth)
        nrm = np.asarray(out.normal)
        covered = o_alp[0] > 0.5
        dep_mae = float(np.abs(dep[0] - o_dep[0])[covered].mean())
        rows.append((label, psnr(img, o_img), psnr(alp, o_alp),
                     psnr(nrm, o_nrm, peak=2.0), dep_mae))

    print()
    print("| config | image PSNR (dB) | alpha PSNR | normal PSNR | "
          "depth MAE (alpha>0.5) |")
    print("|---|---|---|---|---|")
    for label, pi, pa, pn, dm in rows:
        print(f"| {label} | {pi:.1f} | {pa:.1f} | {pn:.1f} | {dm:.2e} |")


if __name__ == "__main__":
    main()
