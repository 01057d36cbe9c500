"""Fused per-tile Gaussian compositing — Pallas TPU kernel with custom VJP.

This is the hot half of the rasterizer (SURVEY.md §2.4 contract; the
reference's CUDA forward.cu/backward.cu tile loop). The XLA-composed
composite in ``rasterize._composite_tiles`` materializes [tiles, P, K]
alpha/transmittance intermediates in HBM for autodiff — at 512²/30k that is
hundreds of MB of residual traffic per step. This kernel is flash-attention
style instead: nothing per-(pixel, splat) ever leaves VMEM.

MXU-first inner loop (v2 — the round-3 kernel moved the per-(pixel, splat)
quadratic work off the VPU):

  * The Gaussian log-density is a quadratic in pixel coordinates, so its
    evaluation over a tile is ONE [P, 8] @ [8, K] matmul of a per-tile pixel
    basis (1, x, y, x², xy, y²) against per-splat coefficients, in
    tile-LOCAL coordinates so every term is O(cA·(tile+radius)²) ≈ 36 and
    f32-exact — not ~10 VPU ops over [P, K].
  * Transmittance: the front-to-back cumulative sum of log(1 − α) along the
    sorted K axis is an upper-triangular-ones matmul [P, K] @ [K, K] on the
    MXU (the CUDA early-exit T < 1e-4 is exactly the prefix mask it feeds).
  * Channel accumulation: one [P, K] @ [K, C+1+A] matmul (alpha rides a ones
    column; aux/attention channels ride the same pass).
  * Backward: recomputes the forward (flash style) and expresses the six
    per-splat reductions (d_conic, d_mean2d, d_opacity) as ONE pixel-moment
    matmul — m_rk = Σ_p basis[p,r]·dpow[p,k] — followed by [1, K] algebra:
        dA = −½(m_x² − 2gx·m_x + gx²·m_1)        (and symmetrically dC)
        dB = −(m_xy − gx·m_y − gy·m_x + gx·gy·m_1)
        dgx = cA(m_x − gx·m_1) + cB(m_y − gy·m_1)  (the means2D stats)
        d_op = m_1 / opacity                        (since dpow = dα·op·e^p)
    The suffix sum Σ_{j>i} w_j(c_j·g) of the analytic 3DGS gradient
        dL/dα_i = T_excl_i·(c_i·g) − (Σ_{j>i} w_j(c_j·g) + T_fin·g_T)/(1−α_i)
    is a strict-lower-triangular matmul. Aux channels receive w-weighted
    grads with stop-gradient weights, matching the reference's
    detached-geometry attention renders (gaussian_renderer/__init__.py:258-283).

Early exit (the CUDA rasterizer's per-tile range + done flag, TPU-shaped):
the per-tile valid count (top-k validity is a depth-sorted prefix) arrives
in SMEM; the K axis is processed in 128-lane chunks, each statically
unrolled and wrapped in ``pl.when(j < ceil(cnt/128) AND max_p T >= 1e-4)``
so exhausted or transmittance-saturated chunks are genuinely skipped.
Background tiles cost a handful of scalar compares; results are
bit-identical to the full sweep because skipped splats have zero
contribution and zero gradient by construction. The backward re-derives the
same predicates from per-chunk entry transmittances recorded in scratch.

Feature-row layout ([F, T, K], fields on sublanes, splats on lanes):
  0 px, 1 py, 2 conicA, 3 conicB, 4 conicC, 5 opacity (0 where invalid),
  6..6+C-1 composited channels (C=3 light / 8 full: r,g,b,depth,nx,ny,nz,extra),
  then A aux channels, zero-padded to a multiple of 8 rows.

Output-row layout (channel-major [T, OC, P], pixels on LANES):
  0..C-1 accumulated channels, C alpha, C+1 T_final, C+2..C+2+A-1 aux,
  OC zero-padded to a multiple of 8.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALPHA_MIN = 1.0 / 255.0
_T_MIN = 1e-4
_LOG_T_MIN = math.log(_T_MIN)


class CompositeStatic(NamedTuple):
    tile: int          # tile side (16)
    tiles_x: int       # tiles per image row
    n_chan: int        # composited channels C (3 light / 8 full)
    n_aux: int         # aux (stop-grad-weight) channels
    interpret: bool    # Pallas interpret mode (CPU tests)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _chunk(k: int) -> int:
    """K-axis chunk: 128 lanes when K divides evenly, else one chunk."""
    return 128 if (k % 128 == 0 and k > 128) else k


def _cumsum_lanes(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inclusive cumulative sum along the last (lane) axis of a 2-D block.

    Hillis–Steele with ``pltpu.roll``: log2(K) shift+add steps, all in VMEM.
    (Kept for unit tests/reference; the kernels use the triangular matmul.)
    """
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < k:
        shifted = pltpu.roll(x, shift=s, axis=1)
        x = x + jnp.where(col >= s, shifted, 0.0)
        s *= 2
    return x


_TILES_PER_STEP = 8  # grid-step batch; keeps block sublane dims 8-aligned


def _tri_inclusive(ch: int) -> jnp.ndarray:
    """[ch, ch] lower-triangular ones (incl. diagonal): T @ x = inclusive
    prefix sum down the sublane (splat) axis, on the MXU."""
    r = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1)
    return (r >= c).astype(jnp.float32)


def _tri_strict_upper(ch: int) -> jnp.ndarray:
    """[ch, ch] strict upper ones: U @ x = suffix-exclusive sum Σ_{i>j}."""
    r = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1)
    return (r < c).astype(jnp.float32)


def _pixel_basis(tile: int) -> jnp.ndarray:
    """[P, 8] tile-local pixel polynomial basis (1, x, y, x², xy, y², 0, 0)."""
    P = tile * tile
    pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    x = (pid % tile).astype(jnp.float32)
    y = (pid // tile).astype(jnp.float32)
    one = jnp.ones((P, 1), jnp.float32)
    zero = jnp.zeros((P, 1), jnp.float32)
    return jnp.concatenate([one, x, y, x * x, x * y, y * y, zero, zero], 1)


def _mm(a, b, contract):
    # HIGHEST: the MXU rounds f32 operands to bf16 at DEFAULT precision —
    # fatal for the exp(power) chain and the log-transmittance prefix sums
    # (observed 1e-2-level image error on chip). f32x3 decomposition keeps
    # these exact at 3x MXU passes, still far cheaper than the VPU form.
    return jax.lax.dot_general(a, b, (contract, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _alpha_chunk(f, basis, eye, tri_inc, txf, tyf, log_t0):
    """Shared fwd/bwd chunk recompute. ``f`` [F, ch] feature rows;
    ``log_t0`` [1, P] accumulated log-transmittance entering this chunk.

    All per-(splat, pixel) matrices are [ch, P] — pixels on LANES — so the
    narrow per-pixel reductions/transcendentals of the [P, ·] orientation
    (8/128-lane utilization) become full-width [1, P] rows. The quadratic
    is evaluated in tile-local coordinates: every coefficient term is
    bounded by ~cA·(tile+3σ)² ≈ 36 for a splat overlapping the tile
    (radius = 3σ_max), so the basis-matmul form loses no f32 precision.
    """
    gx = f[0:1, :] - txf
    gy = f[1:2, :] - tyf
    cA, cB, cC = f[2:3, :], f[3:4, :], f[4:5, :]
    op = f[5:6, :]
    a0 = -0.5 * (cA * gx * gx + cC * gy * gy) - cB * gx * gy
    a1 = cA * gx + cB * gy
    a2 = cC * gy + cB * gx
    zero = jnp.zeros_like(gx)
    coef = jnp.concatenate(
        [a0, a1, a2, -0.5 * cA, -cB, -0.5 * cC, zero, zero], axis=0)
    power = _mm(coef, basis, ((0,), (1,)))            # [ch, P] MXU
    op_c = _mm(eye, op, ((1,), (1,)))                 # [ch, 1] via MXU transpose
    pre = op_c * jnp.exp(power)
    alpha = jnp.minimum(0.99, pre)
    ok = (power <= 0.0) & (alpha >= _ALPHA_MIN)
    alpha = jnp.where(ok, alpha, 0.0)
    log_t = jnp.log1p(-alpha)
    cum = _mm(tri_inc, log_t, ((1,), (0,)))           # inclusive prefix, MXU
    t_incl = jnp.exp(log_t0 + cum)
    contrib = t_incl >= _T_MIN                        # CUDA early-exit prefix
    one_m = 1.0 - alpha                               # >= 0.01 (alpha <= .99)
    w = jnp.where(contrib, t_incl * alpha / one_m, 0.0)
    # two carries: the FULL Σ log(1-α) drives transmittance/contrib in later
    # chunks (matching the XLA prefix cumsum over all K); the contributing-
    # only Σ is what t_final integrates (where(contrib, log_t, 0) in XLA).
    adv_full = jnp.sum(log_t, axis=0, keepdims=True)            # [1, P]
    adv_contrib = jnp.sum(jnp.where(contrib, log_t, 0.0), axis=0,
                          keepdims=True)
    return dict(gx=gx, gy=gy, cA=cA, cB=cB, cC=cC, op=op, pre=pre,
                alpha=alpha, ok=ok, one_m=one_m, t_incl=t_incl,
                contrib=contrib, w=w, adv_full=adv_full,
                adv_contrib=adv_contrib)


def _fwd_kernel(cnt_ref, feats_ref, out_ref, acc_ref, logt_ref, *,
                tile, tiles_x, n_chan, n_aux, kk, oc_pad):
    P = tile * tile
    pid = pl.program_id(0)
    t0 = pid * _TILES_PER_STEP
    ch = _chunk(kk)
    n_chunks = kk // ch
    basis = _pixel_basis(tile)
    eye = jnp.eye(ch, dtype=jnp.float32)
    tri_inc = _tri_inclusive(ch)
    nacc = n_chan + 1 + n_aux
    nacc_pad = acc_ref.shape[0]

    # empty-tile result (zeros, T_final = 1), written once for all TS tiles;
    # occupied tiles overwrite their row below — background tiles then cost
    # only the scalar count check
    empty_row = jnp.concatenate(
        [jnp.zeros((n_chan + 1, P), jnp.float32),
         jnp.ones((1, P), jnp.float32),
         jnp.zeros((oc_pad - n_chan - 2, P), jnp.float32)], axis=0)
    out_ref[:] = jnp.broadcast_to(empty_row[None],
                                  (_TILES_PER_STEP, oc_pad, P))

    def body(i, _):
        n_used = (cnt_ref[pid, i] + ch - 1) // ch

        @pl.when(n_used > 0)
        def _tile():
            _fwd_tile(i, n_used)
        return 0

    def _fwd_tile(i, n_used):
        t = t0 + i
        txf = ((t % tiles_x) * tile).astype(jnp.float32)
        tyf = ((t // tiles_x) * tile).astype(jnp.float32)
        acc_ref[:] = jnp.zeros((nacc_pad, P), jnp.float32)
        logt_ref[:] = jnp.zeros((8, P), jnp.float32)   # row0 full, row1 contrib

        for j in range(n_chunks):
            pred = (j < n_used) & (jnp.max(logt_ref[0:1, :]) >= _LOG_T_MIN)

            @pl.when(pred)
            def _process(j=j):
                f = feats_ref[:, pl.ds(i * n_chunks + j, 1), :]
                f = f.reshape(f.shape[0], ch)
                tm = _alpha_chunk(f, basis, eye, tri_inc, txf, tyf,
                                  logt_ref[0:1, :])
                rows = [f[6:6 + n_chan, :], jnp.ones((1, ch), jnp.float32)]
                if n_aux:
                    rows.append(f[6 + n_chan:6 + n_chan + n_aux, :])
                if nacc_pad > nacc:
                    rows.append(jnp.zeros((nacc_pad - nacc, ch), jnp.float32))
                chan_full = jnp.concatenate(rows, axis=0)  # [nacc_pad, ch]
                acc_ref[:] += _mm(chan_full, tm["w"], ((1,), (0,)))  # [nacc,P]
                logt_ref[0:2, :] += jnp.concatenate(
                    [tm["adv_full"], tm["adv_contrib"]], axis=0)

        t_final = jnp.exp(logt_ref[1:2, :])               # [1, P]
        acc = acc_ref[:]
        parts = [acc[:n_chan + 1, :], t_final]
        if n_aux:
            parts.append(acc[n_chan + 1:nacc, :])
        pad = oc_pad - (n_chan + 2 + n_aux)
        if pad:
            parts.append(jnp.zeros((pad, P), jnp.float32))
        out_ref[pl.ds(i, 1)] = jnp.concatenate(parts, axis=0)[None]

    jax.lax.fori_loop(0, _TILES_PER_STEP, body, 0)


def _bwd_kernel(cnt_ref, feats_ref, g_ref, dfeats_ref,
                clog_ref, ssuf_ref, *, tile, tiles_x, n_chan, n_aux, kk,
                f_pad):
    P = tile * tile
    pid = pl.program_id(0)
    t0 = pid * _TILES_PER_STEP
    ch = _chunk(kk)
    n_chunks = kk // ch
    basis = _pixel_basis(tile)
    eye = jnp.eye(ch, dtype=jnp.float32)
    tri_inc = _tri_inclusive(ch)
    tri_up = _tri_strict_upper(ch)

    dfeats_ref[:] = jnp.zeros(dfeats_ref.shape, jnp.float32)

    def body(i, _):
        n_used = (cnt_ref[pid, i] + ch - 1) // ch

        @pl.when(n_used > 0)
        def _tile():
            _bwd_tile(i, n_used)
        return 0

    def _bwd_tile(i, n_used):
        t = t0 + i
        txf = ((t % tiles_x) * tile).astype(jnp.float32)
        tyf = ((t // tiles_x) * tile).astype(jnp.float32)
        g = g_ref[pl.ds(i, 1)].reshape(g_ref.shape[1], g_ref.shape[2])

        # ---- forward sweep: record each chunk's ENTRY full log-transmittance
        # in clog[j, :] (clog[n_chunks, :] = final full; clog[n_chunks+1, :]
        # accumulates the contributing-only sum for t_final). Skipped chunks
        # copy the entry forward, so pred_j = (j < n_used) & (max clog[j, :]
        # >= log T_min) reproduces the forward's skip decisions in reverse.
        nc = n_chunks
        clog_ref[:] = jnp.zeros((clog_ref.shape[0], P), jnp.float32)
        for j in range(n_chunks):
            entry = clog_ref[j:j + 1, :]
            clog_ref[j + 1:j + 2, :] = entry
            pred = (j < n_used) & (jnp.max(entry) >= _LOG_T_MIN)

            @pl.when(pred)
            def _advance(j=j):
                f = feats_ref[:, pl.ds(i * n_chunks + j, 1), :]
                f = f.reshape(f.shape[0], ch)
                tm = _alpha_chunk(f, basis, eye, tri_inc, txf, tyf,
                                  clog_ref[j:j + 1, :])
                clog_ref[j + 1:j + 2, :] = (clog_ref[j:j + 1, :]
                                            + tm["adv_full"])
                clog_ref[nc + 1:nc + 2, :] += tm["adv_contrib"]

        t_final = jnp.exp(clog_ref[nc + 1:nc + 2, :])     # [1, P]
        btf = g[n_chan + 1:n_chan + 2, :] * t_final       # [1, P]
        g_w = g[:n_chan + 1, :]                           # chan rows + alpha

        # ---- reverse sweep: analytic gradients, last chunk -> first ----
        ssuf_ref[:] = jnp.zeros((8, P), jnp.float32)
        for j in reversed(range(n_chunks)):
            entry = clog_ref[j:j + 1, :]
            pred = (j < n_used) & (jnp.max(entry) >= _LOG_T_MIN)

            @pl.when(pred)
            def _grads(j=j):
                f = feats_ref[:, pl.ds(i * n_chunks + j, 1), :]
                f = f.reshape(f.shape[0], ch)
                log_t0 = clog_ref[j:j + 1, :]
                tm = _alpha_chunk(f, basis, eye, tri_inc, txf, tyf, log_t0)
                w, one_m = tm["w"], tm["one_m"]
                t_excl = tm["t_incl"] / one_m
                cmask = tm["contrib"].astype(jnp.float32)

                chan = f[6:6 + n_chan, :]
                chan_w = jnp.concatenate(
                    [chan, jnp.ones((1, ch), jnp.float32)], axis=0)
                G = _mm(chan_w, g_w, ((0,), (0,)))        # [ch, P] dL/dw
                Gw = G * w
                S = _mm(tri_up, Gw, ((1,), (0,))) + ssuf_ref[0:1, :]  # Σ_{j>i}
                dalpha = cmask * G * t_excl - (S + btf * cmask) / one_m

                live = (tm["ok"] & (tm["pre"] < 0.99)).astype(jnp.float32)
                dpow = dalpha * tm["pre"] * live          # [ch, P]

                # six per-splat reductions as ONE pixel-moment matmul
                m = _mm(basis, dpow, ((0,), (1,)))        # [8, ch]
                m1, mx, my = m[0:1, :], m[1:2, :], m[2:3, :]
                mxx, mxy, myy = m[3:4, :], m[4:5, :], m[5:6, :]
                gx, gy = tm["gx"], tm["gy"]
                cA, cB, cC, op = tm["cA"], tm["cB"], tm["cC"], tm["op"]
                cmx = mx - gx * m1                        # Σ dpow·dx
                cmy = my - gy * m1
                dA = -0.5 * (mxx - 2.0 * gx * mx + gx * gx * m1)
                dB = -(mxy - gx * my - gy * mx + gx * gy * m1)
                dC = -0.5 * (myy - 2.0 * gy * my + gy * gy * m1)
                dgx = cA * cmx + cB * cmy                 # means2D stats
                dgy = cC * cmy + cB * cmx
                d_op = jnp.where(op > 0.0, m1 / jnp.maximum(op, 1e-20), 0.0)

                dchan = _mm(g[:n_chan, :], w, ((1,), (1,)))  # [C, ch]
                parts = [dgx, dgy, dA, dB, dC, d_op, dchan]
                if n_aux:
                    g_aux = g[n_chan + 2:n_chan + 2 + n_aux, :]
                    parts.append(_mm(g_aux, w, ((1,), (1,))))  # stop-grad w
                pad = f_pad - (6 + n_chan + n_aux)
                if pad:
                    parts.append(jnp.zeros((pad, ch), jnp.float32))
                dfeats_ref[:, pl.ds(i * n_chunks + j, 1), :] = (
                    jnp.concatenate(parts, axis=0)[:, None, :])
                ssuf_ref[0:1, :] += jnp.sum(Gw, axis=0, keepdims=True)

    jax.lax.fori_loop(0, _TILES_PER_STEP, body, 0)


def _fwd_call(static: CompositeStatic, feats: jnp.ndarray,
              cnt: jnp.ndarray) -> jnp.ndarray:
    F, T, K = feats.shape
    TS = _TILES_PER_STEP
    Tp = _round_up(T, TS)
    if Tp > T:
        feats = jnp.pad(feats, ((0, 0), (0, Tp - T), (0, 0)))
        cnt = jnp.pad(cnt, (0, Tp - T))
    P = static.tile * static.tile
    oc = static.n_chan + 2 + static.n_aux
    oc_pad = _round_up(oc, 8)
    nacc_pad = _round_up(static.n_chan + 1 + static.n_aux, 8)
    ch = _chunk(K)
    nc = K // ch
    kern = functools.partial(
        _fwd_kernel, tile=static.tile, tiles_x=static.tiles_x,
        n_chan=static.n_chan, n_aux=static.n_aux, kk=K, oc_pad=oc_pad)
    out = pl.pallas_call(
        kern,
        grid=(Tp // TS,),
        in_specs=[
            pl.BlockSpec((Tp // TS, TS), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((F, TS * nc, ch), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TS, oc_pad, P), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, oc_pad, P), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nacc_pad, P), jnp.float32),
                        pltpu.VMEM((8, P), jnp.float32)],
        interpret=static.interpret,
    )(cnt.astype(jnp.int32).reshape(Tp // TS, TS),
      feats.reshape(F, Tp * nc, ch))
    return out[:T, :oc, :]


def _bwd_call(static: CompositeStatic, feats: jnp.ndarray, cnt: jnp.ndarray,
              g: jnp.ndarray) -> jnp.ndarray:
    F, T, K = feats.shape
    TS = _TILES_PER_STEP
    Tp = _round_up(T, TS)
    P = static.tile * static.tile
    oc = static.n_chan + 2 + static.n_aux
    oc_pad = _round_up(oc, 8)
    if Tp > T:
        feats = jnp.pad(feats, ((0, 0), (0, Tp - T), (0, 0)))
        cnt = jnp.pad(cnt, (0, Tp - T))
    g = jnp.pad(g, ((0, Tp - T), (0, oc_pad - g.shape[1]), (0, 0)))
    ch = _chunk(K)
    nc = K // ch
    kern = functools.partial(
        _bwd_kernel, tile=static.tile, tiles_x=static.tiles_x,
        n_chan=static.n_chan, n_aux=static.n_aux, kk=K, f_pad=F)
    dfeats = pl.pallas_call(
        kern,
        grid=(Tp // TS,),
        in_specs=[
            pl.BlockSpec((Tp // TS, TS), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((F, TS * nc, ch), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, oc_pad, P), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, TS * nc, ch), lambda t: (0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, Tp * nc, ch), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_round_up(nc + 2, 8), P), jnp.float32),
                        pltpu.VMEM((8, P), jnp.float32)],
        interpret=static.interpret,
    )(cnt.astype(jnp.int32).reshape(Tp // TS, TS),
      feats.reshape(F, Tp * nc, ch), g)
    return dfeats.reshape(F, Tp, K)[:, :T, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def composite_tiles_fused(static: CompositeStatic, feats: jnp.ndarray,
                          cnt: jnp.ndarray) -> jnp.ndarray:
    """Per-tile fused composite.

    Args:
      static: CompositeStatic (hashable; tile geometry + channel counts).
      feats: [F, T, K] float32 pre-gathered per-tile splat features
        (row layout in the module docstring; invalid slots must carry
        opacity 0).
      cnt: [T] int32 per-tile valid-splat counts; valid slots must be a
        prefix of the K axis (the depth top-k guarantees this). Drives the
        early-exit chunk loop; results are exact regardless of cnt as long
        as slots >= cnt carry opacity 0.

    Returns channel-major [T, C+2+A, P] (pixels on lanes): per-tile
    accumulated channels, alpha, residual transmittance T_final, aux.
    """
    return _fwd_call(static, feats, cnt)


def _vjp_fwd(static, feats, cnt):
    return _fwd_call(static, feats, cnt), (feats, cnt)


def _vjp_bwd(static, res, g):
    feats, cnt = res
    dcnt = np.zeros(cnt.shape, dtype=jax.dtypes.float0)
    return _bwd_call(static, feats, cnt, g), dcnt


composite_tiles_fused.defvjp(_vjp_fwd, _vjp_bwd)
