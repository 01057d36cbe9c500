"""Measure alternatives for the tile-gather's scatter-add transpose.

The rasterizer backward's dominant cost (BASELINE.md round-3 component
table) is the VJP of ``feats[F, N] -> ftiles[F, T, K]``: a scatter-add of
T*K index columns into [F, N]. Round-3 landed a 4-way scan-sharded scatter
(4.5 -> 3.0 ms at 512²/30k). This script measures further variants:

  xla1          one big scatter (baseline reference point)
  scanS         S sequential scatters over one accumulator (current, S=4)
  vmapS         S-batched scatter into [S, F, N] accumulators + sum
  sortseg       sort ids once, permute grad columns, segment-sum the runs,
                scatter one column per unique id (bounded by N not T*K)
  window        sort splats by tile row; per-row scatter windows (measures
                feasibility of a Pallas windowed matmul)

Usage: python scripts/quantify_scatter.py [--n 30000] [--size 512]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=30000)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--f", type=int, default=16)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from instag_tpu.bench_utils import synthetic_state, synthetic_camera
    from instag_tpu.config import enable_persistent_compile_cache
    from instag_tpu.ops import rasterize as R
    from instag_tpu.utils.timing import time_scanned

    enable_persistent_compile_cache()
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    N = -(-args.n // 8192) * 8192
    size, F = args.size, args.f
    cfg = R.RasterizeConfig(size, size, max_per_tile=256)
    T, K = cfg.num_tiles, cfg.max_per_tile

    # real selection indices from a bench-scale scene (not uniform random —
    # scatter cost depends on the index distribution)
    state = synthetic_state(args.n, N, seed=0, scale=0.004)
    cam = synthetic_camera(size)
    proj = jax.jit(lambda: R.project_gaussians(
        cfg, state.params.xyz, state.get_scaling(),
        state.params.rotation, cam.view_transform,
        cam.full_proj_transform, cam.camera_center,
        cam.tanfovx, cam.tanfovy, active=state.alive))()
    ids, valid = jax.jit(lambda: R._tile_select(cfg, proj))()
    ids = jax.block_until_ready(ids)
    print(f"# T={T} K={K} N={N} F={F} "
          f"valid={float(jnp.mean(jnp.sum(valid, -1))):.0f}/tile",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    g0 = jnp.asarray(rng.normal(size=(F, T, K)).astype(np.float32))

    def run(name, fn):
        ms = time_scanned(fn, g0, ids, reps=args.reps)
        ref = np.asarray(jax.jit(xla1)(g0, ids))
        out = np.asarray(jax.jit(fn)(g0, ids))
        err = float(np.max(np.abs(out - ref)) / (np.abs(ref).max() + 1e-9))
        print(f"{name:10s} {ms:7.2f} ms   relerr {err:.2e}")

    def xla1(g, ids):
        return jnp.zeros((F, N), g.dtype).at[:, ids].add(g)

    def scan_s(S):
        def fn(g, ids):
            gs = jnp.moveaxis(g.reshape(F, T // S, S, K), 2, 0)
            idss = jnp.moveaxis(ids.reshape(T // S, S, K), 1, 0)

            def body(acc, xs):
                gg, ii = xs
                return acc.at[:, ii].add(gg), None
            return jax.lax.scan(body, jnp.zeros((F, N), g.dtype),
                                (gs, idss))[0]
        return fn

    def vmap_s(S):
        def fn(g, ids):
            gs = jnp.moveaxis(g.reshape(F, T // S, S, K), 2, 0)
            idss = jnp.moveaxis(ids.reshape(T // S, S, K), 1, 0)
            accs = jax.vmap(
                lambda gg, ii: jnp.zeros((F, N), g.dtype).at[:, ii].add(gg)
            )(gs, idss)
            return jnp.sum(accs, axis=0)
        return fn

    def sortseg(g, ids):
        flat_ids = ids.reshape(-1)                        # [T*K]
        order = jnp.argsort(flat_ids)
        sids = flat_ids[order]
        gperm = g.reshape(F, -1)[:, order]                # [F, T*K] gather
        csum = jnp.cumsum(gperm, axis=1)
        # end-of-run positions per splat id: searchsorted right - 1
        ends = jnp.searchsorted(sids, jnp.arange(N), side="right") - 1
        starts = jnp.searchsorted(sids, jnp.arange(N), side="left") - 1
        has = ends > starts
        tot = csum[:, ends] - jnp.where(starts >= 0, csum[:, starts], 0.0)
        return jnp.where(has[None], tot, 0.0)

    run("xla1", xla1)
    for S in (2, 4, 8, 16):
        if T % S == 0:
            run(f"scan{S}", scan_s(S))
    for S in (4, 8, 16):
        if T % S == 0:
            run(f"vmap{S}", vmap_s(S))
    run("sortseg", sortseg)


if __name__ == "__main__":
    main()
