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
    ap.add_argument("--scale", type=float, default=0.004,
                    help="splat scale — drives tile occupancy")
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
    state = synthetic_state(args.n, N, seed=0, scale=args.scale)
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

    # ------------------------------------------------------------------
    # compact: scatter only the VALID entries. Top-k validity is a depth-
    # sorted prefix per tile and invalid slots carry exactly-zero cotangents
    # (opacity row masked upstream; every other row's grad rides dpow =
    # dα·op·e^p with op=0). Rank the valid entries with one cumsum, find the
    # r-th valid entry with a vectorized searchsorted, gather its grad
    # column + id, and scatter a static budget B of columns. Exact whenever
    # total_valid <= B; callers wrap a lax.cond falling back to the full
    # scatter. Cost: B updates instead of T*K.
    # ------------------------------------------------------------------
    vflat = jnp.asarray(valid.reshape(-1))
    occ = float(jnp.mean(jnp.sum(valid, -1)))

    def compact_b(B):
        def fn(g, ids):
            gm = jnp.where(vflat[None, :], g.reshape(F, -1), 0.0)
            cs = jnp.cumsum(vflat.astype(jnp.int32))
            total = cs[-1]
            pos = jnp.searchsorted(cs, jnp.arange(1, B + 1, dtype=jnp.int32),
                                   side="left")
            pos = jnp.minimum(pos, T * K - 1)
            live = jnp.arange(B) < total
            gsel = jnp.where(live[None], gm[:, pos], 0.0)
            isel = ids.reshape(-1)[pos]
            return jnp.zeros((F, N), g.dtype).at[:, isel].add(gsel)
        return fn

    def compact_cond(B):
        small = compact_b(B)
        full = scan_s(4)

        def fn(g, ids):
            total = jnp.sum(vflat.astype(jnp.int32))
            return jax.lax.cond(total <= B, small, full, g, ids)
        return fn

    def masked_ref(g, ids):
        gm = jnp.where(vflat[None, :], g.reshape(F, T, K), 0.0)
        return jnp.zeros((F, N), g.dtype).at[:, ids].add(gm.reshape(F, T, K))

    run("xla1", xla1)
    for S in (2, 4, 8, 16):
        if T % S == 0:
            run(f"scan{S}", scan_s(S))
    for S in (4, 8, 16):
        if T % S == 0:
            run(f"vmap{S}", vmap_s(S))
    run("sortseg", sortseg)
    print(f"# occupancy {occ:.0f}/tile -> total_valid "
          f"{occ * T:.0f} of {T * K}", file=sys.stderr)
    g0v = jnp.where(vflat[None, :], g0.reshape(F, -1), 0.0).reshape(F, T, K)

    def run_v(name, fn):
        from instag_tpu.utils.timing import time_scanned
        ms = time_scanned(fn, g0v, ids, reps=args.reps)
        ref = np.asarray(jax.jit(xla1)(g0v, ids))
        out = np.asarray(jax.jit(fn)(g0v, ids))
        err = float(np.max(np.abs(out - ref)) / (np.abs(ref).max() + 1e-9))
        print(f"{name:12s} {ms:7.2f} ms   relerr {err:.2e}")

    for B in (16384, 32768):
        run_v(f"compact{B // 1024}k", compact_b(B))
        run_v(f"cond{B // 1024}k", compact_cond(B))

    # slot-chunk while_loop bounded by max(cnt) — rejected: the densest face
    # tile saturates K, so trips = K/C and nothing is saved
    valid_dev = jnp.asarray(valid)

    def chunked(C):
        def fn(g, ids):
            max_cnt = jnp.max(jnp.sum(valid_dev, -1, dtype=jnp.int32))
            trips = (max_cnt + C - 1) // C

            def body(state):
                j, acc = state
                ic = jax.lax.dynamic_slice_in_dim(ids, j * C, C, axis=1)
                vc = jax.lax.dynamic_slice_in_dim(valid_dev, j * C, C, axis=1)
                gc = jax.lax.dynamic_slice_in_dim(g, j * C, C, axis=2)
                gc = jnp.where(vc[None], gc, 0.0)
                return j + 1, acc.at[:, ic].add(gc)

            return jax.lax.while_loop(lambda s: s[0] < trips, body,
                                      (jnp.int32(0),
                                       jnp.zeros((F, N), g.dtype)))[1]
        return fn

    for C in (16, 32, 64):
        run_v(f"chunk{C}", chunked(C))

    # sorted-staircase (what ops/rasterize.py ships): exercise through the
    # shipping custom VJP
    from instag_tpu.ops.rasterize import _tile_gather
    feats0 = jnp.asarray(rng.normal(size=(F, N)).astype(np.float32))

    def mode_vjp(mode):
        def fn(g, ids):
            _, vjp = jax.vjp(
                lambda f: _tile_gather(f, ids, valid_dev, mode), feats0)
            return vjp(g)[0]
        return fn

    run_v("staircase", mode_vjp("cond"))

    # Pallas VMEM-resident accumulator (ops/pallas_scatter.py): walks only
    # the first cnt[t] valid slots per tile, scalar-driven VMEM RMWs
    if jax.default_backend() == "tpu":
        run_v("pallas", mode_vjp("pallas"))


if __name__ == "__main__":
    main()
