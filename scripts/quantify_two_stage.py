"""Quantify the two-stage (row-prefiltered) tile selection at bench scale.

512²/30k-splat scene (same as quantify_raster.py): PSNR vs the exact
K=1024 single-stage oracle, plus fwd / fwd+bwd wall time per config and the
row-overflow diagnostic. Run on the TPU host:
    python scripts/quantify_two_stage.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from instag_tpu.config import enable_persistent_compile_cache
from instag_tpu.ops.rasterize import (RasterizeConfig, rasterize,
                                      selection_stats)
from scripts.quantify_raster import make_inputs, render_img


def psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def timing(cfg, inputs, cam, reps=10):
    means, opac, scales, rots, shs = inputs
    view, full, campos, tfx, tfy = cam
    bg = jnp.array([0.0, 1.0, 0.0], jnp.float32)

    def fwd(m):
        return rasterize(cfg, m, opac, scales, rots, view, full, campos,
                         tfx, tfy, bg, shs=shs, sh_degree=1).image

    from instag_tpu.utils.timing import time_scanned
    ms_f = time_scanned(fwd, means, reps=reps)
    ms_fb = time_scanned(jax.grad(lambda m: jnp.mean(fwd(m) ** 2)), means,
                         reps=reps)
    return ms_f, ms_fb


def main():
    enable_persistent_compile_cache()
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    inputs, cam = make_inputs()

    oracle_cfg = RasterizeConfig(512, 512, max_per_tile=1024, tile_chunk=8,
                                 approx_topk=False, two_stage_select=False,
                                 backend="xla")
    oracle = render_img(oracle_cfg, inputs, cam)

    stats_cfg = RasterizeConfig(512, 512)
    means, opac, scales, rots, shs = inputs
    view, full, campos, tfx, tfy = cam
    st = jax.jit(lambda m: selection_stats(stats_cfg, m, scales, rots, view,
                                           full, campos, tfx, tfy))(means)
    print(f"# mean_hits/tile {float(st['mean_hits']):.0f}  max {int(st['max_hits'])}"
          f"  sat_frac {float(st['saturated_frac']):.3f}"
          f"  max_row_hits {int(st['max_row_hits'])}"
          f"  row_overflow_frac {float(st['row_overflow_frac']):.3f}")

    rows = []
    configs = [
        ("1-stage approx (r2 default)", dict(two_stage_select=False)),
        ("2-stage approx M=2048 (new)", dict(two_stage_select=True,
                                             row_select_m=2048)),
        ("2-stage approx M=1024", dict(two_stage_select=True,
                                       row_select_m=1024)),
        ("2-stage approx M=4096", dict(two_stage_select=True,
                                       row_select_m=4096)),
        ("2-stage exact M=2048", dict(two_stage_select=True,
                                      row_select_m=2048, approx_topk=False)),
    ]
    for name, kw in configs:
        cfg = RasterizeConfig(512, 512, max_per_tile=256, **kw)
        img = render_img(cfg, inputs, cam)
        ms_f, ms_fb = timing(cfg, inputs, cam)
        p = psnr(img, oracle)
        rows.append((name, p, ms_f, ms_fb))
        print(f"| {name} | {p:.1f} dB | {ms_f:.1f} | {ms_fb:.1f} |")

    print("\n| config | PSNR vs exact-1024 | fwd ms | fwd+bwd ms |")
    print("|---|---|---|---|")
    for name, p, f, fb in rows:
        print(f"| {name} | {p:.1f} | {f:.1f} | {fb:.1f} |")


if __name__ == "__main__":
    main()
