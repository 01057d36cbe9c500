"""Differentiable 3D Gaussian splatting rasterizer, TPU-native.

Functional replacement for the reference's ``diff_gauss`` CUDA extension
(contract reconstructed in SURVEY.md §2.4 from every call site in
gaussian_renderer/__init__.py:58-121,171-251,322-423). Outputs the same
6-tuple: (image, depth, normal, alpha, radii, extra), composited over ``bg``,
with gradients to means3D, screen-space means2D (via ``means2d_offset``),
SH/colors, opacities, scales and rotations.

TPU-first design (NOT a port of the CUDA tile scheduler):

  * Projection + EWA 2-D covariance: batched dense math over all N Gaussians
    (VPU-friendly; fuses under jit).
  * Tile binning: instead of the CUDA duplicate→radix-sort→range pipeline
    (dynamic shapes XLA can't tile), each 16x16 tile selects its front-most
    ``max_per_tile`` intersecting Gaussians with a masked top-k over depth.
    Because transmittance decays monotonically front-to-back, truncating the
    per-tile list at K front-most splats bounds the error by the residual
    transmittance; K is configurable (default 256).
  * Compositing: the sequential front-to-back loop becomes an exclusive
    cumulative sum of log(1 - alpha) along the sorted K axis — transmittance
    T_i = exp(cumsum_{j<i} log1p(-a_j)) — so the whole tile composites in
    parallel, and channel accumulation is one [pixels, K] @ [K, C] MXU matmul.
    The CUDA early-exit (T < 1e-4 → stop; rasterizer forward impl) is exactly
    the prefix mask T_incl >= 1e-4 since T is monotone non-increasing.
  * Backward: pure XLA autodiff through cumsum/exp/matmul/gather — analytic,
    no hand-written VJP needed; gathers transpose to scatter-adds.

Alpha math parity (CUDA forward.cu semantics): power = -0.5 (A dx² + C dy²)
- B dx dy with the conic from the EWA covariance + 0.3 px low-pass;
alpha = min(0.99, opacity · exp(power)); splats with alpha < 1/255 or
power > 0 skipped; radius = ceil(3 sqrt(λ_max)).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.general import quat_normalize, quat_to_rotmat
from ..utils.sh import eval_sh


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    image_height: int
    image_width: int
    tile: int = 16
    max_per_tile: int = 256       # K front-most splats composited per tile
    tile_chunk: int = 32          # tiles processed per scan step
    depth_cull: float = 0.2       # view-space near cull (CUDA: p_view.z <= 0.2)
    # TPU-native approximate top-k (PartialReduce) for per-tile selection —
    # ~10x faster than exact top_k at 512px/30k splats; the nearest splat is
    # never missed (it is always a bin maximum) and misses concentrate at the
    # far tail where transmittance is already saturated. Set False for
    # bit-exact oracle comparisons. Recall sweep at 512²/30k dense scene
    # (mean 137 hits/tile, K=256, PSNR vs exact-K=1024 oracle, v5e):
    # .95 → 50.5 dB / 4.1 ms fwd; .90 → 48.0 dB / 2.5 ms; .85 → 44.5 dB /
    # 2.2 ms; exact → 56.6 dB / 36 ms. 0.9 is the default: comfortably
    # beyond training noise (K=128 truncation at 33 dB is where error
    # becomes visible) at ~60% of the .95 sweep cost.
    approx_topk: bool = True
    approx_recall: float = 0.9
    # dtype of the [chunk, N] selection KEY matrix the top-k sweeps consume
    # (the selection stage's dominant traffic). bfloat16 halves it; the
    # cost is depth-ordering quantization (~0.4% relative: splats within a
    # bf16 depth quantum composite in arbitrary relative order) and is
    # selection-only — projection, alpha and compositing stay f32. The
    # membership hit test always runs in f32 (px-scale values lose whole
    # pixels in bf16). Measured on v5e before shipping a default change
    # (scripts/quantify_raster.py).
    select_key_dtype: str = "float32"
    # tiles per top-k sweep in _tile_select; a [select_chunk, N] key matrix
    # per scan step — 128 measured fastest at 512²/30k (1.42 ms vs 1.60 at
    # 256, 4.8 at 1024; the sweet spot balances sweep count against the
    # approx_max_k working-set size)
    select_chunk: int = 128
    # Two-stage selection: stage 1 picks the front `row_select_m` splats per
    # 16-px tile ROW (one [rows, N] sweep), stage 2 selects each tile's
    # front-K from its row's M candidates ([T, M] instead of [T, N] keys).
    # Measured at 512²/30k on v5e (scripts/quantify_two_stage.py): +1.6 dB
    # selection accuracy (52.1 vs 50.5 dB vs the exact-1024 oracle) but
    # ~1.2x SLOWER fwd (9.7 vs 8.2 ms) — the row-candidate gathers and the
    # [T, M] remap cost more than the avoided [T, N] key traffic, so the
    # single-stage sweep stays the default. Rows overflowing M are counted
    # by selection_stats (row_overflow_frac); auto-disabled when
    # N <= row_select_m.
    two_stage_select: bool = False
    row_select_m: int = 2048
    # composite math dtype — XLA backend only: bfloat16 halves VPU/HBM cost
    # of the alpha evaluation with ~1e-3 relative image error (accumulation
    # stays f32 via preferred_element_type); keep float32 for oracle-exact
    # runs. The fused Pallas kernel is always float32 (its log1p/cumsum
    # transmittance recurrence loses visible precision in bf16), so on TPU
    # (backend "auto" -> pallas) this knob must stay at its default;
    # rasterize() raises if a non-f32 dtype reaches the Pallas path.
    compute_dtype: str = "float32"
    # compositing backend: "auto" = fused Pallas kernel on TPU, XLA-composed
    # elsewhere; "pallas" / "xla" force; "pallas_interpret" runs the Pallas
    # kernel in interpreter mode (CPU correctness tests).
    backend: str = "auto"
    # tile-gather backward scatter (measured r4, /tmp-A/B at 512²/30k):
    #   "auto"   -> "pallas" on TPU when the [N/128, F, 128] accumulator
    #               fits VMEM, else "cond" (also off-TPU). Default.
    #   "pallas" VMEM-resident Pallas kernel (ops/pallas_scatter.py):
    #            raster fwd+bwd 3.96 -> 2.75 ms vs "cond" — the staircase's
    #            in-graph argsort/cond machinery costs ~1.2 ms that the
    #            cnt-only kernel skips.
    #   "cond"   occupancy staircase + lax.cond exactness fallback (r3).
    #   "full"   4-way scan-sharded full scatter — right under vmap
    #            (--data_parallel), where a batched cond predicate runs
    #            BOTH branches (~1.25x; VERDICT r3 weak 4). The DP
    #            trainers replace() this statically per dp mode.
    scatter_mode: str = "auto"

    @property
    def tiles_y(self) -> int:
        return -(-self.image_height // self.tile)

    @property
    def tiles_x(self) -> int:
        return -(-self.image_width // self.tile)

    @property
    def num_tiles(self) -> int:
        return self.tiles_y * self.tiles_x


class Projected(NamedTuple):
    px: jnp.ndarray        # [N] pixel x of the 2-D mean
    py: jnp.ndarray        # [N] pixel y
    depth: jnp.ndarray     # [N] view-space z
    conic: jnp.ndarray     # [N, 3] inverse 2-D covariance (A, B, C)
    radius: jnp.ndarray    # [N] float screen radius (3 sigma)
    visible: jnp.ndarray   # [N] bool
    normal_cam: jnp.ndarray  # [N, 3] camera-space splat normal


class RasterizeOutput(NamedTuple):
    image: jnp.ndarray     # [3, H, W]
    depth: jnp.ndarray     # [1, H, W]
    normal: jnp.ndarray    # [3, H, W]
    alpha: jnp.ndarray     # [1, H, W]
    radii: jnp.ndarray     # [N] int32 (0 => culled/invisible)
    extra: jnp.ndarray     # [1, H, W] accumulated extra_attrs


def project_gaussians(cfg: RasterizeConfig, means3d, scales, rotations,
                      viewmatrix, projmatrix, campos, tanfovx, tanfovy,
                      active=None, cov3d_precomp=None) -> Projected:
    """Project Gaussians to screen space with EWA covariance.

    ``viewmatrix``/``projmatrix`` are stored transposed (row-vector
    convention, scene/cameras.py:61-63): p_view = [p,1] @ viewmatrix.

    ``cov3d_precomp`` [N, 6]: upper-triangular world covariance entries
    (c00, c01, c02, c11, c12, c22 — the reference's compute_cov3D_python
    layout, scene/gaussian_model.py:33-41); overrides scales/rotations for
    the EWA (the diff_gauss ``cov3Ds_precomp`` input, SURVEY.md §2.4).

    Fully scalarized: every step is expressed as element-wise math over [N]
    vectors — no [N,3,3] batched matmuls, no scatter updates. TPU lays [N]
    out across (sublanes, lanes); the batched-small-matrix form costs ~7 ms
    at N=30k on v5e where this form costs <1 ms, and its autodiff transpose
    is equally element-wise.
    """
    H, W = cfg.image_height, cfg.image_width
    focal_x = W / (2.0 * tanfovx)
    focal_y = H / (2.0 * tanfovy)

    mx, my, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    V, Pm = viewmatrix, projmatrix

    pvx = mx * V[0, 0] + my * V[1, 0] + mz * V[2, 0] + V[3, 0]
    pvy = mx * V[0, 1] + my * V[1, 1] + mz * V[2, 1] + V[3, 1]
    pvz = mx * V[0, 2] + my * V[1, 2] + mz * V[2, 2] + V[3, 2]

    phx = mx * Pm[0, 0] + my * Pm[1, 0] + mz * Pm[2, 0] + Pm[3, 0]
    phy = mx * Pm[0, 1] + my * Pm[1, 1] + mz * Pm[2, 1] + Pm[3, 1]
    phw = mx * Pm[0, 3] + my * Pm[1, 3] + mz * Pm[2, 3] + Pm[3, 3]
    # sign-preserving clamp: a splat crossing the camera plane can make
    # phw + 1e-7 exactly 0 (f32) -> inf px -> NaN leaking through the
    # zero-cotangent backward of the compiled graph even though the splat
    # is culled. Visible splats (tz > depth_cull) never hit the clamp.
    denom = phw + 1e-7
    denom = jnp.where(jnp.abs(denom) < 1e-6,
                      jnp.where(denom < 0, -1e-6, 1e-6), denom)
    p_w = 1.0 / denom

    # ndc -> pixel: ((v + 1) * S - 1) * 0.5  (CUDA ndc2Pix)
    px = ((phx * p_w + 1.0) * W - 1.0) * 0.5
    py = ((phy * p_w + 1.0) * H - 1.0) * 0.5
    tz = pvz

    # Rotation entries from the normalized quaternion (w, x, y, z).
    # safe form: gradient is 0 (not NaN) for the zero quats of dead padded
    # slots (see utils.general.safe_normalize)
    qn = rotations / jnp.sqrt(
        jnp.sum(rotations * rotations, -1, keepdims=True) + 1e-24)
    qr, qx, qy, qz = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    R00 = 1 - 2 * (qy * qy + qz * qz)
    R01 = 2 * (qx * qy - qr * qz)
    R02 = 2 * (qx * qz + qr * qy)
    R10 = 2 * (qx * qy + qr * qz)
    R11 = 1 - 2 * (qx * qx + qz * qz)
    R12 = 2 * (qy * qz - qr * qx)
    R20 = 2 * (qx * qz - qr * qy)
    R21 = 2 * (qy * qz + qr * qx)
    R22 = 1 - 2 * (qx * qx + qy * qy)

    # Sigma = R S^2 R^T: Sigma_ab = sum_j R_aj R_bj s_j^2 (6 unique entries)
    if cov3d_precomp is not None:
        c00, c01, c02 = (cov3d_precomp[:, 0], cov3d_precomp[:, 1],
                         cov3d_precomp[:, 2])
        c11, c12, c22 = (cov3d_precomp[:, 3], cov3d_precomp[:, 4],
                         cov3d_precomp[:, 5])
    else:
        s0, s1, s2 = scales[:, 0] ** 2, scales[:, 1] ** 2, scales[:, 2] ** 2
        c00 = R00 * R00 * s0 + R01 * R01 * s1 + R02 * R02 * s2
        c11 = R10 * R10 * s0 + R11 * R11 * s1 + R12 * R12 * s2
        c22 = R20 * R20 * s0 + R21 * R21 * s1 + R22 * R22 * s2
        c01 = R00 * R10 * s0 + R01 * R11 * s1 + R02 * R12 * s2
        c02 = R00 * R20 * s0 + R01 * R21 * s1 + R02 * R22 * s2
        c12 = R10 * R20 * s0 + R11 * R21 * s1 + R12 * R22 * s2

    # EWA projection: clamp view-space angles to 1.3 * fov.
    # tz clamps at the near-cull depth, NOT at eps: the CUDA kernel never
    # evaluates the EWA for culled splats (p_view.z <= 0.2, forward.cu), and
    # at tz -> 0 the focal/tz^2 Jacobian terms overflow f32 (a*c ~ 1e40),
    # making det = inf - inf = NaN — which then leaks through the 0-cotangent
    # backward of the fused graph (0 * NaN = NaN) into EVERY parameter. For
    # visible splats (tz > depth_cull) the math is bit-identical.
    safe_tz = jnp.maximum(tz, cfg.depth_cull)
    limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
    txz = jnp.clip(pvx / safe_tz, -limx, limx) * safe_tz
    tyz = jnp.clip(pvy / safe_tz, -limy, limy) * safe_tz
    z2 = safe_tz * safe_tz
    j00 = focal_x / safe_tz
    j02 = -(focal_x * txz) / z2
    j11 = focal_y / safe_tz
    j12 = -(focal_y * tyz) / z2

    # T = J @ Wrot with Wrot = viewmatrix[:3,:3].T, i.e. Wrot[i,k] = V[k,i]:
    # t0k = j00 V[k,0] + j02 V[k,2];  t1k = j11 V[k,1] + j12 V[k,2]
    t00 = j00 * V[0, 0] + j02 * V[0, 2]
    t01 = j00 * V[1, 0] + j02 * V[1, 2]
    t02 = j00 * V[2, 0] + j02 * V[2, 2]
    t10 = j11 * V[0, 1] + j12 * V[0, 2]
    t11 = j11 * V[1, 1] + j12 * V[1, 2]
    t12 = j11 * V[2, 1] + j12 * V[2, 2]

    # cov2d = T Sigma T^T (+ 0.3 px low-pass on the diagonal)
    a = (t00 * t00 * c00 + t01 * t01 * c11 + t02 * t02 * c22
         + 2 * (t00 * t01 * c01 + t00 * t02 * c02 + t01 * t02 * c12)) + 0.3
    b = (t00 * t10 * c00 + t01 * t11 * c11 + t02 * t12 * c22
         + (t00 * t11 + t01 * t10) * c01 + (t00 * t12 + t02 * t10) * c02
         + (t01 * t12 + t02 * t11) * c12)
    c = (t10 * t10 * c00 + t11 * t11 * c11 + t12 * t12 * c22
         + 2 * (t10 * t11 * c01 + t10 * t12 * c02 + t11 * t12 * c12)) + 0.3

    det = a * c - b * b
    det_safe = jnp.where(det <= 0, 1.0, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam, 0.0)))

    visible = (tz > cfg.depth_cull) & (det > 0) & (radius > 0)
    if active is not None:
        visible = visible & active

    # Splat normal: shortest principal axis (column argmin(scales) of R),
    # oriented toward the camera, in camera coordinates (diff_gauss
    # depth/normal fork contract, SURVEY.md §2.4 — consumed by the sapiens
    # normal-prior loss).
    sx, sy, sz = scales[:, 0], scales[:, 1], scales[:, 2]
    sel0 = (sx <= sy) & (sx <= sz)
    sel1 = (~sel0) & (sy <= sz)
    w0 = sel0.astype(means3d.dtype)
    w1 = sel1.astype(means3d.dtype)
    w2 = 1.0 - w0 - w1
    nwx = w0 * R00 + w1 * R01 + w2 * R02
    nwy = w0 * R10 + w1 * R11 + w2 * R12
    nwz = w0 * R20 + w1 * R21 + w2 * R22
    dot_cam = (nwx * (campos[0] - mx) + nwy * (campos[1] - my)
               + nwz * (campos[2] - mz))
    flip = jnp.where(dot_cam < 0, -1.0, 1.0)
    nwx, nwy, nwz = nwx * flip, nwy * flip, nwz * flip
    # n_cam_i = sum_k n_world_k Wrot[i,k] = sum_k n_world_k V[k,i]
    n_cam = jnp.stack([
        nwx * V[0, 0] + nwy * V[1, 0] + nwz * V[2, 0],
        nwx * V[0, 1] + nwy * V[1, 1] + nwz * V[2, 1],
        nwx * V[0, 2] + nwy * V[1, 2] + nwz * V[2, 2],
    ], axis=-1)

    return Projected(px, py, tz, conic, radius, visible, n_cam)


def _topk_keys(cfg: RasterizeConfig, keys: jnp.ndarray, k: int):
    """Front-k (largest) selection over the last axis, approx or exact."""
    if cfg.approx_topk and k >= 8:
        return jax.lax.approx_max_k(keys, k, recall_target=cfg.approx_recall)
    return jax.lax.top_k(keys, k)


def _tile_select_two_stage(cfg: RasterizeConfig, proj: Projected):
    """Row-prefiltered per-tile selection (see RasterizeConfig).

    Stage 1: each of the ``tiles_y`` tile rows picks its front-M splats by
    depth from a y-overlap test — ONE [rows, N] sweep. Stage 2: each tile
    selects its front-K from its row's M candidates with the x-overlap test
    applied — [T, M] keys instead of the single-stage [T, N]. At 512²/30k
    (M=2048) that is ~15x less key traffic and top-k work; correctness holds
    whenever every tile's true front-K lies within its row's front-M
    (monitored by selection_stats row_overflow_frac).
    """
    T, K, tile = cfg.num_tiles, cfg.max_per_tile, cfg.tile
    R, TX = cfg.tiles_y, cfg.tiles_x
    N = proj.px.shape[0]
    M = min(cfg.row_select_m, N)

    r = proj.radius
    xmin, xmax = proj.px - r, proj.px + r
    ymin, ymax = proj.py - r, proj.py + r
    neg_depth = jnp.where(proj.visible, -proj.depth, -jnp.inf)

    rows = jnp.arange(R, dtype=proj.px.dtype)
    y0, y1 = rows * tile, (rows + 1) * tile
    rhit = (ymax[None, :] >= y0[:, None]) & (ymin[None, :] <= y1[:, None])
    rkeys = jnp.where(rhit, neg_depth[None, :], -jnp.inf)       # [R, N]
    rvals, rids = _topk_keys(cfg, rkeys, M)                     # [R, M]

    cxmin, cxmax = xmin[rids], xmax[rids]                       # [R, M]
    xs = (jnp.arange(TX, dtype=proj.px.dtype) * tile)           # [TX]
    hit2 = ((cxmax[:, None, :] >= xs[None, :, None]) &
            (cxmin[:, None, :] <= (xs + tile)[None, :, None]))  # [R, TX, M]
    keys2 = jnp.where(hit2, rvals[:, None, :], -jnp.inf).reshape(R * TX, M)

    kk = min(K, M)
    vals2, loc = _topk_keys(cfg, keys2, kk)                     # [T', kk]
    row_of_tile = jnp.arange(R * TX, dtype=jnp.int32) // TX
    ids = rids[row_of_tile[:, None], loc].astype(jnp.int32)
    valid = vals2 > -jnp.inf
    if kk < K:
        ids = jnp.pad(ids, ((0, 0), (0, K - kk)))
        valid = jnp.pad(valid, ((0, 0), (0, K - kk)))
    return ids[:T], valid[:T]


def _tile_select(cfg: RasterizeConfig, proj: Projected):
    """Per-tile front-most-K selection.

    Returns (ids [T, K] int32, valid [T, K] bool), sorted by ascending depth.
    """
    if cfg.two_stage_select and proj.px.shape[0] > cfg.row_select_m:
        return _tile_select_two_stage(cfg, proj)
    T, K, tile = cfg.num_tiles, cfg.max_per_tile, cfg.tile
    tx_count = cfg.tiles_x

    r = proj.radius
    xmin, xmax = proj.px - r, proj.px + r
    ymin, ymax = proj.py - r, proj.py + r

    tile_ids = jnp.arange(T, dtype=jnp.int32)
    chunk = min(cfg.select_chunk, T)
    pad = (-T) % chunk
    tile_ids = jnp.pad(tile_ids, (0, pad))
    tile_ids = tile_ids.reshape(-1, chunk)

    kdt = jnp.dtype(cfg.select_key_dtype)
    neg_depth = jnp.where(proj.visible, -proj.depth, -jnp.inf)
    if kdt != jnp.float32:
        # bf16 precision is RELATIVE: a head at view depth ~3.3 with ~0.3
        # of depth spread has a 0.013 quantum (whole-slab ordering ties);
        # rebasing to the nearest visible depth moves the spread next to
        # zero where the quantum is ~10x finer (~1 mm)
        d0 = jnp.min(jnp.where(proj.visible, proj.depth, jnp.inf))
        neg_depth = jnp.where(proj.visible, d0 - proj.depth, -jnp.inf)
    neg_depth = neg_depth.astype(kdt)
    neg_inf = jnp.asarray(-jnp.inf, kdt)

    kk = min(K, proj.px.shape[0])

    def select(tids):
        ty = (tids // tx_count).astype(proj.px.dtype)
        tx = (tids % tx_count).astype(proj.px.dtype)
        x0, x1 = tx * tile, (tx + 1) * tile
        y0, y1 = ty * tile, (ty + 1) * tile
        hit = ((xmax[None, :] >= x0[:, None]) & (xmin[None, :] <= x1[:, None]) &
               (ymax[None, :] >= y0[:, None]) & (ymin[None, :] <= y1[:, None]))
        keys = jnp.where(hit, neg_depth[None, :], neg_inf)    # [chunk, N]
        vals, idx = _topk_keys(cfg, keys, kk)                 # nearest first
        if kk < K:
            idx = jnp.pad(idx, ((0, 0), (0, K - kk)))
            vals = jnp.pad(vals, ((0, 0), (0, K - kk)), constant_values=-jnp.inf)
        return idx.astype(jnp.int32), vals > -jnp.inf

    ids, valid = jax.lax.map(select, tile_ids)
    return ids.reshape(-1, K)[:T], valid.reshape(-1, K)[:T]


# public alias: the staleness-guarded serving mode (synthesize
# --select_auto) rebuilds fresh tile lists from a Prepared's projection
# inside a lax.cond refresh branch
tile_select = _tile_select


def rasterize(cfg: RasterizeConfig,
              means3d: jnp.ndarray,
              opacities: jnp.ndarray,
              scales: jnp.ndarray,
              rotations: jnp.ndarray,
              viewmatrix: jnp.ndarray,
              projmatrix: jnp.ndarray,
              campos: jnp.ndarray,
              tanfovx: float,
              tanfovy: float,
              bg: jnp.ndarray,
              shs: jnp.ndarray | None = None,
              sh_degree: int = 0,
              colors_precomp: jnp.ndarray | None = None,
              extra_attrs: jnp.ndarray | None = None,
              means2d_offset: jnp.ndarray | None = None,
              active: jnp.ndarray | None = None,
              cov3d_precomp: jnp.ndarray | None = None) -> RasterizeOutput:
    """Rasterize N Gaussians to an image (SURVEY.md §2.4 contract).

    Args:
      cfg: static config (image size, tile, K).
      means3d: [N, 3] world positions.
      opacities: [N, 1] post-sigmoid opacity.
      scales: [N, 3] post-softplus scales.
      rotations: [N, 4] quaternions (normalized internally).
      viewmatrix / projmatrix: [4, 4] transposed (row-vector) transforms.
      campos: [3] camera center.
      bg: [3] background color.
      shs: [N, Ksh, 3] SH coefficients (deg<=3) — exclusive with colors_precomp.
      sh_degree: static active SH degree.
      colors_precomp: [N, 3] precomputed colors (attention-map path).
      extra_attrs: [N, 1] extra channel, alpha-composited into ``extra``.
      means2d_offset: [N, 2] zeros; gradients w.r.t. it are the *pixel-space*
        position gradients used for densification stats (the reference's
        screenspace_points trick, gaussian_renderer/__init__.py:47-52).
      active: [N] bool liveness mask for padded capacity slots.
      cov3d_precomp: [N, 6] upper-triangular world covariance, overriding
        scales/rotations (diff_gauss ``cov3Ds_precomp``, SURVEY.md §2.4).

    Returns RasterizeOutput; fully differentiable.
    """
    opac = opacities.reshape(-1)

    proj = project_gaussians(cfg, means3d, scales, rotations, viewmatrix,
                             projmatrix, campos, tanfovx, tanfovy, active,
                             cov3d_precomp)
    px, py = proj.px, proj.py
    if means2d_offset is not None:
        px = px + means2d_offset[:, 0]
        py = py + means2d_offset[:, 1]

    if colors_precomp is not None:
        colors = colors_precomp
    else:
        colors = sh_colors(means3d, campos, shs, sh_degree)

    if extra_attrs is None:
        extra_attrs = jnp.ones((means3d.shape[0],), means3d.dtype)
    else:
        extra_attrs = extra_attrs.reshape(-1)

    ids, valid = _tile_select(cfg, proj)                    # [T, K]
    return _composite_tiles(cfg, px, py, proj, opac, colors, extra_attrs,
                            ids, valid, bg)


class Prepared(NamedTuple):
    """Shared projection + per-tile selection, reusable across multiple
    color channels over the same geometry (e.g. the attention-map renders
    in render_motion, which the reference re-rasterizes from scratch)."""
    proj: Projected
    px: jnp.ndarray
    py: jnp.ndarray
    ids: jnp.ndarray
    valid: jnp.ndarray


def prepare(cfg: RasterizeConfig, means3d, scales, rotations, viewmatrix,
            projmatrix, campos, tanfovx, tanfovy,
            means2d_offset=None, active=None, selection=None) -> Prepared:
    """Projection + tile selection only (no compositing).

    ``selection``: optional ``(ids, valid)`` from a previous frame's
    ``Prepared`` — the per-tile [T, N] top-K sweep is skipped and the
    stale lists reused against the CURRENT projection (alpha/color/depth
    all per-frame exact; only WHICH splats each tile composites, and
    their front-to-back order, is frames-old). This is the temporal
    coherence of talking-head synthesis: the head moves millimetres
    between 40 ms frames, so tile membership barely changes. Callers
    compositing a reused selection must mask now-invisible splats
    (``composite_prepared(mask_invisible=True)``) since the stale lists
    may reference splats the current frustum culls.

    ``selection`` may also be a CALLABLE ``(proj, px, py) -> (ids, valid)``
    — it sees the CURRENT frame's projection before any compositing and
    decides the tile lists itself (e.g. the --select_auto staleness guard,
    which lax.cond's between reusing carried lists and running
    ``tile_select`` fresh THIS frame — refresh without a frame of lag).
    """
    proj = project_gaussians(cfg, means3d, scales, rotations, viewmatrix,
                             projmatrix, campos, tanfovx, tanfovy, active)
    px, py = proj.px, proj.py
    if means2d_offset is not None:
        px = px + means2d_offset[:, 0]
        py = py + means2d_offset[:, 1]
    if selection is None:
        ids, valid = _tile_select(cfg, proj)
    elif callable(selection):
        ids, valid = selection(proj, px, py)
    else:
        ids, valid = selection
    return Prepared(proj, px, py, ids, valid)


def composite_prepared(cfg: RasterizeConfig, prep: Prepared, opacities,
                       colors, bg, extra_attrs=None,
                       light: bool = False, aux_colors=None,
                       mask_invisible: bool = False):
    """Composite given an existing Prepared (selection is reused; pass a
    stop_gradient'd Prepared for detached-geometry side renders).

    ``light=True`` accumulates color+alpha only (depth/normal/extra outputs
    are zeros) — right for the attention-map side renders which consume
    only the image.

    ``aux_colors`` [N, A]: extra per-splat channels composited with
    *stop-gradient* weights in the same pass, returned as a second value
    [A, H, W]. This is exactly the reference's detached-geometry attention
    render (gaussian_renderer/__init__.py:258-283) fused into the main
    composite: same per-tile weights, gradients flow only to the channels.

    ``mask_invisible``: zero the opacity of frustum-culled splats before
    compositing — required when ``prep`` carries a REUSED selection
    (``prepare(selection=...)``), whose stale per-tile lists may reference
    splats the current projection culls; a fresh selection only ever picks
    visible splats, so the default path needs (and pays) nothing."""
    opac = opacities.reshape(-1)
    if mask_invisible:
        opac = jnp.where(prep.proj.visible, opac, 0.0)
    if extra_attrs is None:
        extra_attrs = jnp.ones_like(opac)
    else:
        extra_attrs = extra_attrs.reshape(-1)
    return _composite_tiles(cfg, prep.px, prep.py, prep.proj, opac, colors,
                            extra_attrs, prep.ids, prep.valid, bg, light,
                            aux_colors)


def _resolve_backend(cfg: RasterizeConfig) -> str:
    if cfg.backend != "auto":
        return cfg.backend
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _composite_tiles(cfg: RasterizeConfig, px, py, proj: Projected, opac,
                     colors, extra_attrs, ids, valid, bg,
                     light: bool = False, aux_colors=None):
    backend = _resolve_backend(cfg)
    if backend in ("pallas", "pallas_interpret"):
        if jnp.dtype(cfg.compute_dtype) != jnp.float32:
            raise ValueError(
                f"compute_dtype={cfg.compute_dtype!r} is an XLA-backend "
                "knob; the fused Pallas composite is float32-only (see "
                "RasterizeConfig.compute_dtype). Use backend='xla' for "
                "reduced-precision compositing.")
        return _composite_tiles_pallas(
            cfg, px, py, proj, opac, colors, extra_attrs, ids, valid, bg,
            light, aux_colors, interpret=(backend == "pallas_interpret"))
    H, W, tile = cfg.image_height, cfg.image_width, cfg.tile
    K = cfg.max_per_tile
    cdt = jnp.dtype(cfg.compute_dtype)

    # Per-gaussian packed features gathered per tile.
    if light:
        feats = jnp.concatenate([
            px[:, None], py[:, None], proj.conic, opac[:, None], colors,
        ], axis=-1)                                         # [N, 9]
    else:
        feats = jnp.concatenate([
            px[:, None], py[:, None], proj.conic, opac[:, None],
            colors, proj.depth[:, None], proj.normal_cam,
            extra_attrs[:, None],
        ], axis=-1)                                         # [N, 14]
    n_aux = 0 if aux_colors is None else aux_colors.shape[-1]

    tiles_x = cfg.tiles_x
    chunk = cfg.tile_chunk
    T = cfg.num_tiles
    pad_t = (-T) % chunk

    tile_idx = jnp.arange(T + pad_t, dtype=jnp.int32)
    ids_p = jnp.pad(ids, ((0, pad_t), (0, 0)))
    valid_p = jnp.pad(valid, ((0, pad_t), (0, 0)))

    # In-tile pixel grid offsets [tile*tile, 2] (x, y)
    oy, ox = jnp.meshgrid(jnp.arange(tile), jnp.arange(tile), indexing="ij")
    pix_off = jnp.stack([ox.reshape(-1), oy.reshape(-1)], -1).astype(px.dtype)

    def composite(args):
        tids, gids, gvalid = args                           # [c], [c,K], [c,K]
        f = feats[gids].astype(cdt)                         # [c, K, 14]
        gx, gy = f[..., 0], f[..., 1]
        A, B, C = f[..., 2], f[..., 3], f[..., 4]
        gop = f[..., 5]
        gcol = f[..., 6:9]
        if not light:
            gdepth = f[..., 9]
            gnorm = f[..., 10:13]
            gextra = f[..., 13]

        ty = (tids // tiles_x).astype(px.dtype)
        tx = (tids % tiles_x).astype(px.dtype)
        pxs = tx[:, None] * tile + pix_off[None, :, 0]      # [c, P]
        pys = ty[:, None] * tile + pix_off[None, :, 1]

        dx = (pxs[:, :, None] - gx[:, None, :]).astype(cdt)  # [c, P, K]
        dy = (pys[:, :, None] - gy[:, None, :]).astype(cdt)
        power = (-0.5 * (A[:, None, :] * dx * dx + C[:, None, :] * dy * dy)
                 - B[:, None, :] * dx * dy)
        alpha = jnp.minimum(0.99, gop[:, None, :] * jnp.exp(power))
        ok = (power <= 0.0) & (alpha >= (1.0 / 255.0)) & gvalid[:, None, :]
        alpha = jnp.where(ok, alpha, 0.0)

        log_t = jnp.log1p(-alpha.astype(jnp.float32))       # [c, P, K]
        cum = jnp.cumsum(log_t, axis=-1)
        t_incl = jnp.exp(cum)
        t_excl = jnp.exp(cum - log_t)
        contrib = t_incl >= 1e-4                            # prefix mask == CUDA early-exit
        w = jnp.where(contrib, alpha * t_excl, 0.0)         # [c, P, K]

        if light:
            chan = gcol                                     # [c, K, 3]
        else:
            chan = jnp.concatenate([
                gcol, gdepth[..., None], gnorm, gextra[..., None],
            ], axis=-1)                                     # [c, K, 8]
        if n_aux:
            # aux channels use stop-gradient WEIGHTS (detached geometry)
            gaux = aux_colors[gids].astype(chan.dtype)      # [c, K, A]
            aux_acc = jnp.einsum("cpk,cka->cpa",
                                 jax.lax.stop_gradient(w), gaux,
                                 preferred_element_type=jnp.float32)
        acc = jnp.einsum("cpk,ckd->cpd", w, chan,
                         preferred_element_type=jnp.float32)  # MXU matmul
        if n_aux:
            acc = jnp.concatenate([acc, aux_acc], axis=-1)
        t_final = jnp.exp(jnp.sum(jnp.where(contrib, log_t, 0.0), axis=-1))
        alpha_out = jnp.sum(w, axis=-1)
        return acc, t_final, alpha_out

    acc, t_final, alpha_out = jax.lax.map(
        composite,
        (tile_idx.reshape(-1, chunk), ids_p.reshape(-1, chunk, K),
         valid_p.reshape(-1, chunk, K)))
    P = tile * tile
    nch = (3 if light else 8) + n_aux
    acc = acc.reshape(-1, P, nch)[:T]
    t_final = t_final.reshape(-1, P)[:T]
    alpha_out = alpha_out.reshape(-1, P)[:T]

    def to_image(flat, ch):
        return _tiles_to_image(cfg, flat, ch)

    image = to_image(acc[..., 0:3], 3) + to_image(t_final[..., None], 1) * bg[:, None, None]
    base = 3 if light else 8
    if light:
        depth = jnp.zeros((1, H, W), image.dtype)
        normal = jnp.zeros((3, H, W), image.dtype)
        extra = jnp.zeros((1, H, W), image.dtype)
    else:
        depth = to_image(acc[..., 3:4], 1)
        normal = to_image(acc[..., 4:7], 3)
        extra = to_image(acc[..., 7:8], 1)
    alpha_img = to_image(alpha_out[..., None], 1)

    radii = jnp.where(proj.visible, proj.radius, 0.0).astype(jnp.int32)
    out = RasterizeOutput(image, depth, normal, alpha_img, radii, extra)
    if n_aux:
        return out, to_image(acc[..., base:base + n_aux], n_aux)
    return out


def _tiles_to_image(cfg: RasterizeConfig, flat, ch: int):
    """[T, P, ch] tile-major pixels -> [ch, H, W] image (crop padding)."""
    tile = cfg.tile
    img = flat.reshape(cfg.tiles_y, cfg.tiles_x, tile, tile, ch)
    img = img.transpose(4, 0, 2, 1, 3).reshape(ch, cfg.tiles_y * tile,
                                               cfg.tiles_x * tile)
    return img[:, :cfg.image_height, :cfg.image_width]


def _tiles_to_image_cm(cfg: RasterizeConfig, flat, ch: int):
    """Channel-major [T, ch, P] tile pixels -> [ch, H, W] (crop padding)."""
    tile = cfg.tile
    img = flat.reshape(cfg.tiles_y, cfg.tiles_x, ch, tile, tile)
    img = img.transpose(2, 0, 3, 1, 4).reshape(ch, cfg.tiles_y * tile,
                                               cfg.tiles_x * tile)
    return img[:, :cfg.image_height, :cfg.image_width]


def _staircase(T: int, K: int) -> list[tuple[int, int]]:
    """Static (tiles, slot-budget) groups for the sorted-staircase scatter.

    Talking-head scenes are a few saturated tiles (the face) in a mostly
    empty frame (measured on the bench scene: mean cnt 8, ~32 tiles at
    cnt=K=256, the rest near zero), so after sorting tiles by count the
    budget can shrink steeply: T/16 tiles keep the full K, the next 3T/16
    get K/4, the rest K/8. 53k index columns instead of T*K=262k at
    512²/K=256.
    """
    t1 = max(T // 16, 1)
    k2 = max(K // 4, min(32, K))
    t2 = max(T // 4 - t1, 0)
    k3 = max(K // 8, min(32, K))
    groups = [(t1, K)]
    if t2:
        groups.append((t2, k2))
    if T - t1 - t2 > 0:
        groups.append((T - t1 - t2, k3))
    return groups


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _tile_gather(feats: jnp.ndarray, ids: jnp.ndarray,
                 valid: jnp.ndarray, mode: str = "cond") -> jnp.ndarray:
    """``where(valid, feats[:, ids], 0)`` with an occupancy-adaptive VJP.

    The scatter-add transpose of the [F, N] -> [F, T, K] gather costs ~9 ns
    per index column on v5e whether the column is valid or not (~2.3 ms for
    T*K=262k at 512²/K=256, scripts/quantify_scatter.py), yet talking-head
    scenes leave most slots invalid: a handful of face tiles saturate K
    while background tiles are empty. Top-k validity is a depth-sorted
    prefix, so after sorting tiles by valid count a static budget staircase
    (T/16 tiles @ K, 3T/16 @ K/4, rest @ K/8 — ``_staircase``) covers every
    valid slot with ~5x fewer index columns; a ``lax.cond`` falls back to
    the full 4-way scan-sharded scatter when the sorted counts overflow the
    staircase, so the result is exact for ANY distribution. Skipped columns
    are exactly zero (the forward masks invalid slots, so their cotangents
    are zero as well) and addition reassociates per column.

    Measured-and-rejected alternatives (scripts/quantify_scatter.py,
    scripts/quantify_compact_parts.py): slot-chunk while_loop bounded by
    max(cnt) — degenerates to the full sweep because the densest face tile
    saturates K; sort-compaction ∝ Σcnt — searchsorted + column gathers
    cost more than the scatter updates they save; one-hot MXU matmul —
    FLOPs ∝ B·N.

    ``mode`` (static): "cond" = staircase + exactness fallback; "full" =
    always the 4-way scan-sharded scatter — the right choice under vmap
    (``--data_parallel``), where a batched cond predicate runs BOTH
    branches (~1.25x the full cost). RasterizeConfig.scatter_mode threads
    it; the DP trainers set "full" statically.
    """
    return _tile_gather_fwd(feats, ids, valid, mode)[0]


def _tile_gather_fwd(feats, ids, valid, mode="cond"):
    out = jnp.where(valid[None], feats[:, ids], 0.0)
    return out, (ids, valid, feats.shape)


def _tile_gather_bwd(mode, res, g):
    ids, valid, (F, N) = res
    T, K = ids.shape
    cnt = jnp.sum(valid, axis=-1, dtype=jnp.int32)          # [T]

    gm = jnp.where(valid[None], g, 0.0)

    if mode == "auto":
        # pallas needs the [N/128, F, 128] f32 accumulator + one
        # [TS*K/128, F, 128] grad block resident in VMEM (~16 MB on v5e);
        # Mosaic pads the sublane dim (F) to a multiple of 8
        f_sub = -(-F // 8) * 8
        fits = (-(-N // 128) * 128 * f_sub * 4) <= 6 * 2**20
        mode = ("pallas" if fits and jax.default_backend() == "tpu"
                else "cond")

    if mode in ("pallas", "pallas_interpret"):
        # VMEM-resident accumulator kernel: walks only the first cnt[t]
        # (valid, depth-sorted-prefix) slots of each tile, one VMEM RMW per
        # element instead of an HBM scatter update (ops/pallas_scatter.py).
        from .pallas_scatter import scatter_add_tiles
        acc = scatter_add_tiles(gm, ids, cnt, N,
                                interpret=(mode == "pallas_interpret"))
        return (acc.astype(g.dtype),
                np.zeros(ids.shape, dtype=jax.dtypes.float0),
                np.zeros(valid.shape, dtype=jax.dtypes.float0))

    def run_staircase(gm):
        acc = jnp.zeros((F, N), g.dtype)
        start = 0
        for tg, kg in groups:
            tidx = jax.lax.slice_in_dim(order, start, start + tg)
            acc = acc.at[:, ids[tidx, :kg]].add(gm[:, tidx, :kg])
            start += tg
        return acc

    def run_full(gm):
        S = 4 if T % 4 == 0 else 1
        gs = jnp.moveaxis(gm.reshape(F, T // S, S, K), 2, 0)
        idss = jnp.moveaxis(ids.reshape(T // S, S, K), 1, 0)

        def body(acc, xs):
            return acc.at[:, xs[1]].add(xs[0]), None

        return jax.lax.scan(body, jnp.zeros((F, N), g.dtype),
                            (gs, idss))[0]

    if mode == "full":
        acc = run_full(gm)
    else:
        # the staircase covers iff each later group's largest count fits
        # its budget (group boundaries index the DESCENDING-sorted counts)
        order = jnp.argsort(-cnt)
        groups = _staircase(T, K)
        ok = jnp.bool_(True)
        start = groups[0][0]
        for tg, kg in groups[1:]:
            ok = jnp.logical_and(ok, cnt[order[start]] <= kg)
            start += tg
        acc = jax.lax.cond(ok, run_staircase, run_full, gm)
    return (acc, np.zeros(ids.shape, dtype=jax.dtypes.float0),
            np.zeros(valid.shape, dtype=jax.dtypes.float0))


_tile_gather.defvjp(_tile_gather_fwd, _tile_gather_bwd)


def _composite_tiles_pallas(cfg: RasterizeConfig, px, py, proj: Projected,
                            opac, colors, extra_attrs, ids, valid, bg,
                            light: bool, aux_colors, interpret: bool):
    """Fused-kernel composite: gather per-tile features (XLA — its VJP is the
    tile→splat scatter-add), run the Pallas kernel, assemble images."""
    from .pallas_composite import CompositeStatic, composite_tiles_fused

    n_chan = 3 if light else 8
    n_aux = 0 if aux_colors is None else aux_colors.shape[-1]

    # [F, N] row layout — the gather then lands directly in the kernel's
    # fields-on-sublanes layout with no transpose pass over [T, K, F]
    rows = [px, py, proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
            opac] + [colors[:, i].astype(px.dtype) for i in range(3)]
    if not light:
        rows += [proj.depth, proj.normal_cam[:, 0], proj.normal_cam[:, 1],
                 proj.normal_cam[:, 2], extra_attrs]
    if n_aux:
        rows += [aux_colors[:, i].astype(px.dtype) for i in range(n_aux)]
    feats = jnp.stack(rows, axis=0).astype(jnp.float32)  # [6+C+A, N]
    F = feats.shape[0]
    f_pad = -(-F // 8) * 8

    # invalid slots come back zeroed in EVERY row (opacity 0 => alpha 0 =>
    # no contribution, no grads; zero px/py/conic keep exp(power)=1 finite)
    ftiles = _tile_gather(feats, ids, valid, cfg.scatter_mode)  # [F, T, K]
    if f_pad > F:
        ftiles = jnp.pad(ftiles, ((0, f_pad - F), (0, 0), (0, 0)))

    # per-tile valid counts (valid is a depth-sorted prefix) drive the
    # kernel's early-exit chunk loop; background tiles become ~free
    cnt = jnp.sum(valid, axis=-1, dtype=jnp.int32)       # [T]
    static = CompositeStatic(cfg.tile, cfg.tiles_x, n_chan, n_aux, interpret)
    out = composite_tiles_fused(static, ftiles, cnt)     # [T, C+2+A, P]

    acc = out[:, :n_chan]
    alpha_out = out[:, n_chan:n_chan + 1]
    t_final = out[:, n_chan + 1:n_chan + 2]

    H, W = cfg.image_height, cfg.image_width
    image = (_tiles_to_image_cm(cfg, acc[:, 0:3], 3)
             + _tiles_to_image_cm(cfg, t_final, 1) * bg[:, None, None])
    if light:
        depth = jnp.zeros((1, H, W), image.dtype)
        normal = jnp.zeros((3, H, W), image.dtype)
        extra = jnp.zeros((1, H, W), image.dtype)
    else:
        depth = _tiles_to_image_cm(cfg, acc[:, 3:4], 1)
        normal = _tiles_to_image_cm(cfg, acc[:, 4:7], 3)
        extra = _tiles_to_image_cm(cfg, acc[:, 7:8], 1)
    alpha_img = _tiles_to_image_cm(cfg, alpha_out, 1)

    radii = jnp.where(proj.visible, proj.radius, 0.0).astype(jnp.int32)
    res = RasterizeOutput(image, depth, normal, alpha_img, radii, extra)
    if n_aux:
        aux_img = _tiles_to_image_cm(cfg, out[:, n_chan + 2:], n_aux)
        return res, aux_img
    return res


def selection_stats(cfg: RasterizeConfig, means3d, scales, rotations,
                    viewmatrix, projmatrix, campos, tanfovx, tanfovy,
                    active=None) -> dict:
    """Per-tile intersection-count diagnostics (no top-k).

    Quantifies K-truncation: a tile whose true hit count exceeds
    ``max_per_tile`` composites only its front-K splats. Trainers log this
    every densify block so saturation is visible (VERDICT weak-3/4).
    Returns scalars: mean/max hits per tile, fraction of saturated tiles.
    """
    proj = project_gaussians(cfg, means3d, scales, rotations, viewmatrix,
                             projmatrix, campos, tanfovx, tanfovy, active)
    tile = cfg.tile
    r = proj.radius
    xmin, xmax = proj.px - r, proj.px + r
    ymin, ymax = proj.py - r, proj.py + r
    vis = proj.visible

    tile_ids = jnp.arange(cfg.num_tiles, dtype=jnp.int32)
    chunk = min(cfg.select_chunk, cfg.num_tiles)
    pad = (-cfg.num_tiles) % chunk
    tile_ids = jnp.pad(tile_ids, (0, pad), constant_values=-1).reshape(-1, chunk)

    def count(tids):
        ty = (tids // cfg.tiles_x).astype(proj.px.dtype)
        tx = (tids % cfg.tiles_x).astype(proj.px.dtype)
        x0, x1 = tx * tile, (tx + 1) * tile
        y0, y1 = ty * tile, (ty + 1) * tile
        hit = ((xmax[None, :] >= x0[:, None]) & (xmin[None, :] <= x1[:, None]) &
               (ymax[None, :] >= y0[:, None]) & (ymin[None, :] <= y1[:, None]) &
               vis[None, :] & (tids >= 0)[:, None])
        return jnp.sum(hit, axis=-1)

    hits = jax.lax.map(count, tile_ids).reshape(-1)[:cfg.num_tiles]

    # two-stage-selection diagnostic: rows whose visible y-overlap count
    # exceeds row_select_m can (worst case) rob a tile of a front-K splat
    rows = jnp.arange(cfg.tiles_y, dtype=proj.px.dtype)
    y0, y1 = rows * tile, (rows + 1) * tile
    rhit = ((ymax[None, :] >= y0[:, None]) & (ymin[None, :] <= y1[:, None])
            & vis[None, :])
    row_hits = jnp.sum(rhit, axis=-1)
    return {
        "mean_hits": jnp.mean(hits.astype(jnp.float32)),
        "max_hits": jnp.max(hits),
        "saturated_frac": jnp.mean((hits > cfg.max_per_tile).astype(jnp.float32)),
        "max_row_hits": jnp.max(row_hits),
        "row_overflow_frac": jnp.mean(
            (row_hits > cfg.row_select_m).astype(jnp.float32)),
    }


def sh_colors(means3d, campos, shs, sh_degree: int):
    """SH -> clamped RGB at per-splat view directions (in-kernel SH of the
    CUDA rasterizer; clamp convention utils/sh_utils mirror)."""
    dirs = means3d - campos[None, :]
    # sqrt(.+eps^2): NaN-free gradient if a splat lands exactly on campos
    dirs = dirs / jnp.sqrt(jnp.sum(dirs * dirs, -1, keepdims=True) + 1e-16)
    return jnp.maximum(eval_sh(sh_degree, jnp.swapaxes(shs, -1, -2), dirs) + 0.5, 0.0)
