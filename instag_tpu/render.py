"""Render paths: static, face-motion, and mouth-motion (conditioned on face).

Functional equivalents of the reference's three renderers
(gaussian_renderer/__init__.py:37-133 ``render``, :151-298 ``render_motion``,
:302-435 ``render_motion_mouth_con``), driving the Pallas/JAX rasterizer.
All three compile into a single jitted graph together with the motion nets.

Notable conventions preserved:
  * deltas compose as UMF + PMF: ``d += p_d``; ``xyz += p_xyz`` (align);
    ``d_xyz *= p_scale`` (align) (:195-226).
  * scales activate as softplus(raw + d_scale); rotations normalize(raw + d_rot);
    opacity ignores d_opa (commented out in the reference, :229-235).
  * attention maps render with detached geometry and
    colors = [ambient_aud, ambient_eye, 0] (:253-283).
  * mouth path: face UMF runs with zeroed expression; move feature =
    [kth-largest, kth-smallest, range] of face d_xyz.y × 1e2, stop-gradient
    (:352-377); mouth uses raw rotations/scales (:402-404).

The traced ``active_sh_degree`` is handled by masking SH coefficients above
the active degree to zero and always evaluating at the static max degree —
identical output, no recompilation per warmup step.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from .models.gaussians import GaussianState
from .ops.rasterize import (RasterizeConfig, RasterizeOutput,
                            composite_prepared, prepare, rasterize, sh_colors)
from .utils.general import safe_normalize


@struct.dataclass
class Camera:
    """Per-frame camera + conditioning signals (reference scene/cameras.py:17-64
    plus the talking_dict fields consumed by the renderers)."""
    view_transform: jnp.ndarray    # [4,4] transposed world->view
    full_proj_transform: jnp.ndarray  # [4,4] transposed world->ndc
    camera_center: jnp.ndarray     # [3]
    tanfovx: jnp.ndarray           # scalar
    tanfovy: jnp.ndarray           # scalar


def _sh_degree_mask(active_degree, max_degree: int):
    """[K] 0/1 mask keeping coefficients of degree <= active."""
    k = (max_degree + 1) ** 2
    idx = jnp.arange(k)
    deg = jnp.floor(jnp.sqrt(idx.astype(jnp.float32))).astype(jnp.int32)
    return (deg <= active_degree).astype(jnp.float32)


def _masked_features(state: GaussianState):
    feats = state.get_features()
    mask = _sh_degree_mask(state.active_sh_degree, state.max_sh_degree)
    return feats * mask[None, :, None]


def render(cfg: RasterizeConfig, cam: Camera, state: GaussianState,
           bg: jnp.ndarray, override_color: jnp.ndarray | None = None,
           means2d_offset: jnp.ndarray | None = None) -> RasterizeOutput:
    """Static render (no deformation) — reference ``render`` (:37-133)."""
    kwargs = {}
    if override_color is not None:
        kwargs["colors_precomp"] = override_color
    else:
        kwargs["shs"] = _masked_features(state)
        kwargs["sh_degree"] = state.max_sh_degree
    return rasterize(
        cfg, state.params.xyz, state.get_opacity(), state.get_scaling(),
        state.get_rotation(), cam.view_transform, cam.full_proj_transform,
        cam.camera_center, cam.tanfovx, cam.tanfovy, bg,
        means2d_offset=means2d_offset, active=state.alive, **kwargs)


class MotionRender(NamedTuple):
    out: RasterizeOutput
    motion: dict[str, Any]
    p_motion: dict[str, Any] | None
    attn: jnp.ndarray | None       # [3, H, W] UMF attention map
    p_attn: jnp.ndarray | None     # [3, H, W] PMF attention map
    # (ids [T,K], valid [T,K]) actually composited — pass as the next
    # frame's `selection` to reuse tile membership (synthesis temporal
    # coherence; see ops.rasterize.prepare)
    selection: tuple = ()
    # the full Prepared (projection + selection) — the staleness-guarded
    # serving mode (synthesize --select_auto) reads px/py/visible from it
    # to decide selection refreshes and rebuilds fresh tile lists from
    # prep.proj; unused outputs are DCE'd from training graphs
    prep: Any = None


def render_motion(cfg: RasterizeConfig, cam: Camera, state: GaussianState,
                  umf: Callable[..., dict], aud: jnp.ndarray,
                  exp: jnp.ndarray, bg: jnp.ndarray,
                  pmf: Callable[..., dict] | None = None,
                  personalized: bool = False, align: bool = False,
                  detach_motion: bool = False, return_attn: bool = False,
                  means2d_offset: jnp.ndarray | None = None,
                  selection: tuple | None = None) -> MotionRender:
    """Face-branch motion render — reference ``render_motion`` (:151-298).

    ``umf(x, aud, exp)`` and ``pmf(x, aud, exp)`` are closures over their
    network params (e.g. ``partial(net.apply, params)``).

    ``align`` may be a Python bool (structural) or a traced 0/1 scalar — the
    latter lets one compiled step cover the reference's align-after-iter-1000
    warmup toggle (train_face.py:345-350) without recompilation.

    ``selection``: a previous frame's ``MotionRender.selection`` to reuse
    (skips the per-tile top-K sweep; synthesis-only temporal coherence).
    """
    xyz0 = state.params.xyz
    xyz = xyz0

    align_structural = not (isinstance(align, bool) and not align)
    align_s = (1.0 if align else 0.0) if isinstance(align, bool) else align

    p_preds = None
    if personalized or align_structural:
        p_preds = pmf(xyz0, aud, exp)
    if align_structural:
        xyz = xyz + p_preds["p_xyz"] * align_s

    preds = umf(xyz, aud, exp)
    d_xyz, d_scale, d_rot = preds["d_xyz"], preds["d_scale"], preds["d_rot"]
    if personalized:
        d_xyz = d_xyz + p_preds["d_xyz"]
        d_scale = d_scale + p_preds["d_scale"]
        d_rot = d_rot + p_preds["d_rot"]
    if align_structural:
        d_xyz = d_xyz * (1.0 + (p_preds["p_scale"] - 1.0) * align_s)
    if detach_motion:
        d_xyz = jax.lax.stop_gradient(d_xyz)
        d_scale = jax.lax.stop_gradient(d_scale)
        d_rot = jax.lax.stop_gradient(d_rot)

    means3d = xyz0 + d_xyz
    opacity = state.get_opacity()
    scales = jax.nn.softplus(state.params.scaling + d_scale)
    rot_raw = state.params.rotation + d_rot
    # safe_normalize: a NaN-free gradient at ||q|| -> 0 — raw + d_rot CAN
    # cross zero during training and the maximum(norm, eps) idiom emits
    # NaN cotangents there (see utils.general.safe_normalize)
    rotations = safe_normalize(rot_raw)

    # one shared projection + tile selection feeds the main composite and
    # the (detached) attention-map composites — the reference re-rasterizes
    # from scratch for each (gaussian_renderer/__init__.py:258-283)
    prep = prepare(cfg, means3d, scales, rotations, cam.view_transform,
                   cam.full_proj_transform, cam.camera_center, cam.tanfovx,
                   cam.tanfovy, means2d_offset=means2d_offset,
                   active=state.alive, selection=selection)
    reused = selection is not None
    colors = sh_colors(means3d, cam.camera_center, _masked_features(state),
                       state.max_sh_degree)

    attn = p_attn = None
    if return_attn:
        # the attention maps share the main pass's compositing weights
        # (identical geometry; the reference re-rasterizes with detached
        # geometry — same math) and ride the same composite as extra
        # stop-gradient-weighted channels
        aux = [preds["ambient_aud"], preds["ambient_eye"]]
        if personalized:
            aux += [p_preds["ambient_aud"], p_preds["ambient_eye"]]
        out, aux_img = composite_prepared(
            cfg, prep, opacity, colors, bg,
            aux_colors=jnp.concatenate(aux, axis=-1),
            mask_invisible=reused)
        zero = jnp.zeros_like(aux_img[0])
        attn = jnp.stack([aux_img[0], aux_img[1], zero])
        if personalized:
            p_attn = jnp.stack([aux_img[2], aux_img[3], zero])
    else:
        out = composite_prepared(cfg, prep, opacity, colors, bg,
                                 mask_invisible=reused)

    return MotionRender(out, preds, p_preds, attn, p_attn,
                        (prep.ids, prep.valid), prep)


def render_motion_mouth(cfg: RasterizeConfig, cam: Camera,
                        state: GaussianState, mouth_umf: Callable[..., dict],
                        face_state: GaussianState,
                        face_umf: Callable[..., dict],
                        aud: jnp.ndarray, bg: jnp.ndarray,
                        pmf: Callable[..., dict] | None = None,
                        personalized: bool = False, align: bool = False,
                        k=10, k_max: int = 50,
                        face_motion_cache: dict | None = None,
                        means2d_offset: jnp.ndarray | None = None,
                        selection: tuple | None = None) -> MotionRender:
    """Mouth-branch render conditioned on the face UMF's motion range —
    reference ``render_motion_mouth_con`` (:302-435).

    ``k`` may be traced (the trainer draws it uniformly from [10, 50] each
    step, train_mouth.py:175): top-k always runs at the static ``k_max`` and
    the k-th element is selected dynamically. ``align`` may be a bool or a
    traced 0/1 scalar (see render_motion).

    ``face_motion_cache``: pass the face branch's already-computed motion
    prediction at inference to skip re-running the face UMF (:362-364).
    """
    xyz0 = state.params.xyz
    xyz = xyz0

    align_structural = not (isinstance(align, bool) and not align)
    align_s = (1.0 if align else 0.0) if isinstance(align, bool) else align

    p_preds = None
    if personalized or align_structural:
        p_preds = pmf(xyz0, aud)
    if align_structural:
        xyz = xyz + p_preds["p_xyz"] * align_s

    if face_motion_cache is not None:
        face_preds = face_motion_cache
    else:
        zero_exp = jnp.zeros((6,), xyz.dtype)
        face_preds = face_umf(face_state.params.xyz, aud, zero_exp)

    # move feature: k-th largest / k-th smallest y-motion and their range,
    # masked to the face cloud's alive slots (:366-374). k is clamped to the
    # alive count: with a heavily-pruned face cloud the k-th element would
    # otherwise read a -inf mask sentinel and poison the whole loss with NaN
    # (torch.topk(k > n) would have errored in the reference — the padded
    # state makes this reachable, so clamp instead).
    dy = face_preds["d_xyz"][:, 1]
    k_max = min(k_max, dy.shape[0])
    n_alive = jnp.sum(face_state.alive)
    dy_max = jnp.where(face_state.alive, dy, -jnp.inf)
    dy_min = jnp.where(face_state.alive, dy, jnp.inf)
    top_max, _ = jax.lax.top_k(dy_max, k_max)
    top_min, _ = jax.lax.top_k(-dy_min, k_max)
    kidx = jnp.clip(jnp.minimum(jnp.asarray(k), n_alive) - 1, 0, k_max - 1)
    m_hi, m_lo = top_max[kidx], -top_min[kidx]
    m_hi = jnp.where(jnp.isfinite(m_hi), m_hi, 0.0)
    m_lo = jnp.where(jnp.isfinite(m_lo), m_lo, 0.0)
    move = jnp.stack([m_hi, m_lo, m_hi - m_lo])[None, :] * 1e2
    move = jax.lax.stop_gradient(move)

    preds = mouth_umf(xyz, aud, move)
    d_xyz = preds["d_xyz"]
    if personalized:
        d_xyz = d_xyz + p_preds["d_xyz"]

    means3d = xyz0 + d_xyz
    opacity = state.get_opacity()
    scales = state.get_scaling()
    rotations = state.get_rotation()

    if selection is None and means2d_offset is not None:
        # training path unchanged: one rasterize() call
        out = rasterize(
            cfg, means3d, opacity, scales, rotations, cam.view_transform,
            cam.full_proj_transform, cam.camera_center, cam.tanfovx,
            cam.tanfovy, bg, shs=_masked_features(state),
            sh_degree=state.max_sh_degree, means2d_offset=means2d_offset,
            active=state.alive)
        return MotionRender(out, preds, p_preds, None, None)

    prep = prepare(cfg, means3d, scales, rotations, cam.view_transform,
                   cam.full_proj_transform, cam.camera_center, cam.tanfovx,
                   cam.tanfovy, means2d_offset=means2d_offset,
                   active=state.alive, selection=selection)
    colors = sh_colors(means3d, cam.camera_center, _masked_features(state),
                       state.max_sh_degree)
    out = composite_prepared(cfg, prep, opacity, colors, bg,
                             mask_invisible=selection is not None)
    return MotionRender(out, preds, p_preds, None, None,
                        (prep.ids, prep.valid), prep)


def composite_fuse(face_img, face_alpha, mouth_img, mouth_alpha, bg_color,
                   torso_bg, mouth_dilate_alpha=None):
    """Two-branch fusion: mouth over torso background, face over that
    (reference train_fuse_con.py:125-144, synthesize_fuse.py:70-74).

    All images [3,H,W]; alphas [1,H,W]; bg_color [3] is the constant raster
    background to subtract; torso_bg [3,H,W] is the per-frame composite
    background.
    """
    ma = mouth_dilate_alpha if mouth_dilate_alpha is not None else mouth_alpha
    mouth_full = (mouth_img - bg_color[:, None, None] * (1.0 - ma)
                  + torso_bg * (1.0 - ma))
    image = (face_img - bg_color[:, None, None] * (1.0 - face_alpha)
             + mouth_full * (1.0 - face_alpha))
    return image


def dilate_alpha(alpha: jnp.ndarray, k: int = 13) -> jnp.ndarray:
    """Max-pool dilation of the mouth alpha (synthesize_fuse.py:29-32,66-68)."""
    pad = k // 2
    return jax.lax.reduce_window(
        alpha, -jnp.inf, jax.lax.max, (1, k, k), (1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad)])
