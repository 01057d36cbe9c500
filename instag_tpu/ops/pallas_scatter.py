"""Pallas tile->splat scatter-add: the rasterizer backward's tail.

The VJP of the per-tile feature gather ``feats[F, N] -> ftiles[F, T, K]``
is a scatter-add of up to T*K index columns into [F, N]. XLA lowers a
non-unique-index scatter to a serial per-index update loop in HBM — the
~3-4 ms tail of the training step at 512²/30k before the round-3
occupancy staircase (ops/rasterize._tile_gather docstring) cut it to
~1 ms. This kernel probes the remaining headroom: keep the WHOLE
accumulator resident in VMEM (2 MB at F=16, N=32k — v5e VMEM is ~16 MB)
across a grid over tile groups, and walk only the first ``cnt[t]``
(valid) slots of each tile — talking-head scenes leave most of T*K empty,
and top-k validity is a depth-sorted prefix. Invalid slots carry zero
cotangents upstream, so skipping them is exact.

Mosaic constraint that shapes the layout (measured round 4): dynamic
indexing on the LANE (last) dimension cannot lower ("cannot statically
prove that index in dimension 1 is a multiple of 128"), so a naive
``acc[:, idx] += col`` kernel does not compile. Both the accumulator and
the gradient live as ``[rows, F, 128]`` — splat/slot id ``i`` maps to
(row ``i // 128``, lane ``i % 128``); the row index is an UNTILED leading
dimension Pallas may index dynamically, and lane selection happens
through iota==lane masks on full [F, 128] registers:

    gw  = g[row_g]                      # [F, 128] dynamic-row load
    col = sum(gw * (iota == lane_g))    # extract source column (lane reduce)
    acc[row_a] += col * (iota == lane_a)  # masked outer-product RMW

Cost: a handful of [F, 128] VPU ops per VALID element, all in VMEM —
element count is Σcnt (the true occupancy), not a static budget.

Reference behavior being transposed: the CUDA backward tile pass of
diff-gaussian-rasterization (cuda_rasterizer/backward.cu) likewise walks
each tile's depth-sorted list accumulating per-splat grads with atomics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TS = 8    # tiles per grid step
_L = 128   # lane width


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _scatter_kernel(cnt_ref, ids_ref, g_ref, acc_ref, *, kk: int):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    f = acc_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (f, _L), 1)

    def tile_body(i, _):
        cnt = cnt_ref[step, i]
        nwin = (cnt + _L - 1) // _L

        def win_body(w, _):
            # one [F, 128] register-resident load covers 128 elements
            gw = g_ref[(i * kk) // _L + w]
            lim = jnp.minimum(cnt - w * _L, _L)

            def el_body(j, _):
                idx = ids_ref[i, w * _L + j]
                lane = idx % _L
                # rotate column j onto lane (idx % 128), mask every other
                # lane: ONE dynamic rotate replaces the mask-reduce extract
                # + outer-product broadcast (both are full-[F,128] passes)
                moved = pltpu.roll(gw, (lane - j) % _L, 1)
                acc_ref[idx // _L] += jnp.where(iota == lane, moved, 0.0)
                return 0

            jax.lax.fori_loop(0, lim, el_body, 0)
            return 0

        jax.lax.fori_loop(0, nwin, win_body, 0)
        return 0

    jax.lax.fori_loop(0, _TS, tile_body, 0)


@functools.partial(jax.jit, static_argnums=(3, 4))
def scatter_add_tiles(g: jnp.ndarray, ids: jnp.ndarray, cnt: jnp.ndarray,
                      n: int, interpret: bool = False) -> jnp.ndarray:
    """``zeros([F, n]).at[:, ids].add(where(prefix_valid, g, 0))`` with the
    accumulator resident in VMEM.

    Args:
      g: [F, T, K] float32 per-(tile, slot) gradient columns. Slots >= cnt
        are ignored (the gather forward zero-masks them, so their
        cotangents are exactly zero).
      ids: [T, K] int32 destination splat per slot (values in [0, n)).
      cnt: [T] int32 number of valid (depth-sorted prefix) slots per tile.
      n: number of splats; must be a multiple of 128 ([n/128, F, 128] must
        fit VMEM alongside one [TS*K/128, F, 128] gradient block).
    """
    F, T, K = g.shape
    n_pad = _round_up(n, _L)
    Kp = _round_up(K, _L)            # window-hoisted loads need K % 128 == 0
    Tp = _round_up(max(T, _TS), _TS)
    if Tp > T or Kp > K:
        g = jnp.pad(g, ((0, 0), (0, Tp - T), (0, Kp - K)))
        ids = jnp.pad(ids, ((0, Tp - T), (0, Kp - K)))
        cnt = jnp.pad(cnt, (0, Tp - T))
        K = Kp
    # slot id i -> (row i//128, lane i%128), F in the middle (sublanes)
    g_rows = (g.reshape(F, Tp * K // _L, _L).transpose(1, 0, 2)
              .astype(jnp.float32))
    kern = functools.partial(_scatter_kernel, kk=K)
    acc = pl.pallas_call(
        kern,
        grid=(Tp // _TS,),
        in_specs=[
            pl.BlockSpec((Tp // _TS, _TS), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TS, K), lambda t: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TS * K // _L, F, _L), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_pad // _L, F, _L), lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad // _L, F, _L), jnp.float32),
        interpret=interpret,
    )(cnt.astype(jnp.int32).reshape(Tp // _TS, _TS), ids.astype(jnp.int32),
      g_rows)
    return acc.transpose(1, 0, 2).reshape(F, n_pad)[:, :n]
