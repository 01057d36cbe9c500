"""Fused per-tile Gaussian compositing — Pallas TPU kernel with custom VJP.

This is the hot half of the rasterizer (SURVEY.md §2.4 contract; the
reference's CUDA forward.cu/backward.cu tile loop). The XLA-composed
composite in ``rasterize._composite_tiles`` materializes [tiles, P, K]
alpha/transmittance intermediates in HBM for autodiff — at 512²/30k that is
hundreds of MB of residual traffic per step. This kernel is flash-attention
style instead:

  * forward: one VMEM-resident pass per 16×16 tile — alpha evaluation,
    transmittance via an in-register Hillis–Steele cumsum over the K sorted
    splats (``pltpu.roll``), and one [P,K]@[K,C] MXU matmul for all output
    channels. Nothing per-(pixel,splat) is written to HBM.
  * backward: recomputes alpha/transmittance from the same gathered features
    and applies the analytic 3DGS compositing gradients (suffix-sum form):
        dL/dα_i = T_excl_i·(c_i·g) − (Σ_{j>i} w_j (c_j·g) + T_final·g_T)/(1−α_i)
    then chains through α = min(.99, o·exp(power)) to per-splat grads for
    screen position (the means2D densification stats), conic, opacity and
    channels. Aux channels (attention maps) receive w-weighted grads with
    **stop-gradient weights**, matching the reference's detached-geometry
    attention renders (gaussian_renderer/__init__.py:258-283).

The custom-VJP boundary takes pre-gathered per-tile features, so XLA's own
gather VJP performs the tile→splat scatter-add, and projection (cheap [N]
math) stays under XLA autodiff.

Feature-row layout ([F, T, K], fields on sublanes, splats on lanes):
  0 px, 1 py, 2 conicA, 3 conicB, 4 conicC, 5 opacity (0 where invalid),
  6..6+C-1 composited channels (C=3 light / 8 full: r,g,b,depth,nx,ny,nz,extra),
  then A aux channels, zero-padded to a multiple of 8 rows.

Output-column layout ([T, P, OC], pixels on sublanes):
  0..C-1 accumulated channels, C alpha, C+1 T_final, C+2..C+2+A-1 aux,
  zero-padded to a multiple of 128 lanes... (OC is small; padding to 8).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALPHA_MIN = 1.0 / 255.0
_T_MIN = 1e-4


class CompositeStatic(NamedTuple):
    tile: int          # tile side (16)
    tiles_x: int       # tiles per image row
    n_chan: int        # composited channels C (3 light / 8 full)
    n_aux: int         # aux (stop-grad-weight) channels
    interpret: bool    # Pallas interpret mode (CPU tests)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _cumsum_lanes(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inclusive cumulative sum along the last (lane) axis of a 2-D block.

    Hillis–Steele with ``pltpu.roll``: log2(K) shift+add steps, all in VMEM.
    """
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < k:
        shifted = pltpu.roll(x, shift=s, axis=1)
        x = x + jnp.where(col >= s, shifted, 0.0)
        s *= 2
    return x


_TILES_PER_STEP = 8  # grid-step batch; keeps block sublane dims 8-aligned


def _alpha_terms(f, t, tile: int, tiles_x: int, kk: int):
    """Shared fwd/bwd recompute: per-(pixel, splat) alpha and transmittance.

    ``f``: [F, K] feature rows for tile index ``t``. Returns everything both
    passes need; lives entirely in VMEM.
    """
    P = tile * tile
    tx0 = (t % tiles_x) * tile
    ty0 = (t // tiles_x) * tile

    pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    pxs = (tx0 + pid % tile).astype(jnp.float32)    # [P, 1]
    pys = (ty0 + pid // tile).astype(jnp.float32)

    gx, gy = f[0:1, :], f[1:2, :]                   # [1, K]
    cA, cB, cC = f[2:3, :], f[3:4, :], f[4:5, :]
    op = f[5:6, :]

    dx = pxs - gx                                   # [P, K]
    dy = pys - gy
    power = -0.5 * (cA * dx * dx + cC * dy * dy) - cB * dx * dy
    pre = op * jnp.exp(power)
    alpha = jnp.minimum(0.99, pre)
    ok = (power <= 0.0) & (alpha >= _ALPHA_MIN)
    alpha = jnp.where(ok, alpha, 0.0)

    log_t = jnp.log1p(-alpha)
    cum = _cumsum_lanes(log_t, kk)
    t_excl = jnp.exp(cum - log_t)
    contrib = jnp.exp(cum) >= _T_MIN                # CUDA early-exit prefix
    w = jnp.where(contrib, alpha * t_excl, 0.0)
    return dict(dx=dx, dy=dy, cA=cA, cB=cB, cC=cC, power=power, pre=pre,
                alpha=alpha, ok=ok, log_t=log_t, t_excl=t_excl,
                contrib=contrib, w=w)


def _fwd_kernel(feats_ref, out_ref, *, tile, tiles_x, n_chan, n_aux, kk, oc_pad):
    P = tile * tile
    t0 = pl.program_id(0) * _TILES_PER_STEP

    def body(i, _):
        f = feats_ref[:, pl.ds(i, 1), :].reshape(feats_ref.shape[0], kk)
        tm = _alpha_terms(f, t0 + i, tile, tiles_x, kk)
        w, log_t, contrib = tm["w"], tm["log_t"], tm["contrib"]

        # chan rows + a ones row (alpha rides the same matmul) + aux
        rows = [f[6:6 + n_chan, :], jnp.ones((1, w.shape[1]), jnp.float32)]
        if n_aux:
            rows.append(f[6 + n_chan:6 + n_chan + n_aux, :])
        chan_full = jnp.concatenate(rows, axis=0)        # [C+1+A, K]
        acc = jax.lax.dot_general(
            w, chan_full, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [P, C+1+A]

        t_final = jnp.exp(jnp.sum(jnp.where(contrib, log_t, 0.0), axis=1,
                                  keepdims=True))        # [P, 1]
        pad = oc_pad - (n_chan + 2 + n_aux)
        parts = [acc[:, :n_chan + 1], t_final]
        if n_aux:
            parts.append(acc[:, n_chan + 1:])
        if pad:
            parts.append(jnp.zeros((P, pad), jnp.float32))
        out_ref[pl.ds(i, 1)] = jnp.concatenate(parts, axis=1)[None]
        return 0

    jax.lax.fori_loop(0, _TILES_PER_STEP, body, 0)


def _bwd_kernel(feats_ref, g_ref, dfeats_ref, *, tile, tiles_x, n_chan,
                n_aux, kk, f_pad):
    t0 = pl.program_id(0) * _TILES_PER_STEP

    def body(i, _):
        f = feats_ref[:, pl.ds(i, 1), :].reshape(f_pad, kk)
        g = g_ref[pl.ds(i, 1)].reshape(g_ref.shape[1], g_ref.shape[2])
        tm = _alpha_terms(f, t0 + i, tile, tiles_x, kk)
        w, alpha, t_excl = tm["w"], tm["alpha"], tm["t_excl"]
        contrib, log_t = tm["contrib"], tm["log_t"]
        K = w.shape[1]

        chan = f[6:6 + n_chan, :]                        # [C, K]
        chan_w = jnp.concatenate(
            [chan, jnp.ones((1, K), jnp.float32)], axis=0)  # [C+1, K]
        g_w = g[:, :n_chan + 1]                          # chan cols + alpha

        # dL/dw per (pixel, splat)
        G = jax.lax.dot_general(g_w, chan_w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [P, K]
        Gw = G * w
        total = jnp.sum(Gw, axis=1, keepdims=True)
        S = total - _cumsum_lanes(Gw, kk)            # suffix-exclusive Σ_{j>i}

        t_final = jnp.exp(jnp.sum(jnp.where(contrib, log_t, 0.0), axis=1,
                                  keepdims=True))        # [P, 1]
        btf = g[:, n_chan + 1:n_chan + 2] * t_final      # [P, 1]

        one_m = 1.0 - alpha                          # >= 0.01 (alpha <= .99)
        cmask = contrib.astype(jnp.float32)
        dalpha = cmask * G * t_excl - (S + btf * cmask) / one_m

        live = (tm["ok"] & (tm["pre"] < 0.99)).astype(jnp.float32)
        d_op = jnp.sum(dalpha * jnp.exp(tm["power"]) * live, axis=0,
                       keepdims=True)                    # [1, K]
        dpow = dalpha * tm["pre"] * live                 # [P, K]
        dx, dy, cA, cB, cC = tm["dx"], tm["dy"], tm["cA"], tm["cB"], tm["cC"]
        dA = jnp.sum(dpow * (-0.5 * dx * dx), axis=0, keepdims=True)
        dB = jnp.sum(dpow * (-dx * dy), axis=0, keepdims=True)
        dC = jnp.sum(dpow * (-0.5 * dy * dy), axis=0, keepdims=True)
        dgx = jnp.sum(dpow * (cA * dx + cB * dy), axis=0, keepdims=True)
        dgy = jnp.sum(dpow * (cC * dy + cB * dx), axis=0, keepdims=True)

        dchan = jax.lax.dot_general(
            g[:, :n_chan], w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [C, K]
        parts = [dgx, dgy, dA, dB, dC, d_op, dchan]
        if n_aux:
            g_aux = g[:, n_chan + 2:n_chan + 2 + n_aux]  # [P, A]
            daux = jax.lax.dot_general(
                g_aux, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [A, K] (stop-grad w)
            parts.append(daux)
        pad = f_pad - (6 + n_chan + n_aux)
        if pad:
            parts.append(jnp.zeros((pad, K), jnp.float32))
        dfeats_ref[:, pl.ds(i, 1), :] = jnp.concatenate(parts, axis=0)[:, None, :]
        return 0

    jax.lax.fori_loop(0, _TILES_PER_STEP, body, 0)


def _fwd_call(static: CompositeStatic, feats: jnp.ndarray) -> jnp.ndarray:
    F, T, K = feats.shape
    TS = _TILES_PER_STEP
    Tp = _round_up(T, TS)
    if Tp > T:
        feats = jnp.pad(feats, ((0, 0), (0, Tp - T), (0, 0)))
    P = static.tile * static.tile
    oc = static.n_chan + 2 + static.n_aux
    oc_pad = _round_up(oc, 8)
    kern = functools.partial(
        _fwd_kernel, tile=static.tile, tiles_x=static.tiles_x,
        n_chan=static.n_chan, n_aux=static.n_aux, kk=K, oc_pad=oc_pad)
    out = pl.pallas_call(
        kern,
        grid=(Tp // TS,),
        in_specs=[pl.BlockSpec((F, TS, K), lambda t: (0, t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TS, P, oc_pad), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, P, oc_pad), jnp.float32),
        interpret=static.interpret,
    )(feats)
    return out[:T, :, :oc]


def _bwd_call(static: CompositeStatic, feats: jnp.ndarray,
              g: jnp.ndarray) -> jnp.ndarray:
    F, T, K = feats.shape
    TS = _TILES_PER_STEP
    Tp = _round_up(T, TS)
    P = static.tile * static.tile
    oc = static.n_chan + 2 + static.n_aux
    oc_pad = _round_up(oc, 8)
    if Tp > T:
        feats = jnp.pad(feats, ((0, 0), (0, Tp - T), (0, 0)))
    g = jnp.pad(g, ((0, Tp - T), (0, 0), (0, oc_pad - g.shape[-1])))
    kern = functools.partial(
        _bwd_kernel, tile=static.tile, tiles_x=static.tiles_x,
        n_chan=static.n_chan, n_aux=static.n_aux, kk=K, f_pad=F)
    dfeats = pl.pallas_call(
        kern,
        grid=(Tp // TS,),
        in_specs=[
            pl.BlockSpec((F, TS, K), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, P, oc_pad), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, TS, K), lambda t: (0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, Tp, K), jnp.float32),
        interpret=static.interpret,
    )(feats, g)
    return dfeats[:, :T, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def composite_tiles_fused(static: CompositeStatic,
                          feats: jnp.ndarray) -> jnp.ndarray:
    """Per-tile fused composite.

    Args:
      static: CompositeStatic (hashable; tile geometry + channel counts).
      feats: [F, T, K] float32 pre-gathered per-tile splat features
        (row layout in the module docstring; invalid slots must carry
        opacity 0).

    Returns [T, P, C+2+A]: per-tile-pixel accumulated channels, alpha,
    residual transmittance T_final, and aux channels.
    """
    return _fwd_call(static, feats)


def _vjp_fwd(static, feats):
    return _fwd_call(static, feats), feats


def _vjp_bwd(static, feats, g):
    return (_bwd_call(static, feats, g),)


composite_tiles_fused.defvjp(_vjp_fwd, _vjp_bwd)
