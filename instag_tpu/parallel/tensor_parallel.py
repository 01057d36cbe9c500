"""Splat- and tile-sharded (tensor-parallel) rendering over a device mesh.

SURVEY.md §5.8(c): "optionally Gaussian-sharded rendering (splats
partitioned across devices, per-tile partial compositing merged ... over
ICI)". The reference is strictly single-GPU (SURVEY.md §2.5); this is new
TPU-native capability for clouds/images too large for one chip's
latency/HBM budget.

Design — ONE ``jax.shard_map``, every collective explicit:

  1. **Projection sharded over splats**: each device projects its N/D-splat
     shard (EWA covariance, SH→RGB, screen radius) — pure local [N/D]
     element-wise math, no communication.
  2. **all_gather of the per-splat screen rows** (``[~16, N]`` f32 ≈ 2 MB at
     N=32k): microseconds over ICI, and it makes every later stage exact —
     no depth-range partitioning heuristics, no partial-composite merge
     math. Alpha compositing is order-dependent, so merging independently
     composited splat subsets is NOT generally correct; gathering the
     (small) projected rows and splitting by *tiles* instead keeps the
     single-chip math bit-for-bit.
  3. **Selection + compositing sharded over tile rows**: device d owns the
     horizontal band of ``tiles_y/D`` tile rows and runs the SAME
     single-chip ``_tile_select`` + ``_composite_tiles`` code on its band
     (a band is just a shorter image: the band config differs from the
     full config only in ``image_height``, and the splat y coordinates are
     shifted by the band origin — tile work is embarrassingly parallel).
     The heavy stages — the [tiles, N] selection sweeps, the [F, T, K]
     feature gather, the fused Pallas composite and its backward (incl.
     the scatter-add transpose) — all scale 1/D.
  4. **Outputs stay sharded**: images along H (each device holds its band),
     per-splat radii along the splat axis. Downstream per-pixel losses can
     consume the sharded image directly; ``jax.device_get`` or a
     ``NamedSharding(mesh, P())`` constraint assembles it when needed.

Backward: jax AD transposes the all_gather to a reduce-scatter
(psum_scatter) of the per-splat gradient rows, so each device ends up
holding exactly its shard's parameter gradients — gradients shard like the
parameters, with one [~16, N] reduce-scatter as the only backward
communication.

Validated against the single-chip rasterizer (fwd images + grads) on the
virtual 8-device CPU mesh in tests/test_tensor_parallel.py; the driver's
``dryrun_multichip`` runs a fwd+bwd step through this path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.rasterize import (Projected, RasterizeConfig, RasterizeOutput,
                             _composite_tiles, _tile_select,
                             project_gaussians, sh_colors)


def band_config(cfg: RasterizeConfig, n_shards: int) -> RasterizeConfig:
    """The per-device band config: same image EXCEPT height = one band of
    ``tiles_y / n_shards`` tile rows (bands are cropped to the true image
    height after assembly)."""
    if cfg.tiles_y % n_shards:
        raise ValueError(
            f"tiles_y={cfg.tiles_y} must divide by the mesh axis size "
            f"{n_shards} (pad image_height to a multiple of "
            f"{cfg.tile * n_shards})")
    return dataclasses.replace(
        cfg, image_height=(cfg.tiles_y // n_shards) * cfg.tile,
        image_width=cfg.tiles_x * cfg.tile)


def rasterize_tensor_parallel(cfg: RasterizeConfig,
                              mesh: Mesh,
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
                              axis: str = "tp") -> RasterizeOutput:
    """``ops.rasterize.rasterize`` sharded over ``mesh[axis]``.

    Per-splat inputs ([N, ...]) must have N divisible by the axis size;
    they may arrive with any sharding (the shard_map in_spec reshards).
    Returns the standard 6-output RasterizeOutput whose images are sharded
    in horizontal bands (P(None, axis, None)) and radii along splats
    (P(axis)); semantics match the single-chip path to float rounding.
    """
    D = mesh.shape[axis]
    cfgb = band_config(cfg, D)
    band_h = cfgb.image_height
    N = means3d.shape[0]
    if N % D:
        raise ValueError(f"N={N} must divide by mesh axis size {D}")

    opac = opacities.reshape(-1)
    if extra_attrs is None:
        extra_attrs = jnp.ones((N,), means3d.dtype)
    else:
        extra_attrs = extra_attrs.reshape(-1)
    if means2d_offset is None:
        means2d_offset = jnp.zeros((N, 2), means3d.dtype)
    if active is None:
        active = jnp.ones((N,), bool)
    per_splat_color = shs if colors_precomp is None else colors_precomp

    def local(xyz, op, sc, rot, col, extra, off, act, view, full, cpos):
        # ---- stage 1: projection on the local splat shard ----
        proj = project_gaussians(cfg, xyz, sc, rot, view, full, cpos,
                                 tanfovx, tanfovy, act)
        px = proj.px + off[:, 0]
        py = proj.py + off[:, 1]
        if colors_precomp is None:
            colors = sh_colors(xyz, cpos, col, sh_degree)
        else:
            colors = col
        radii_loc = jnp.where(proj.visible, proj.radius, 0.0).astype(jnp.int32)

        # ---- stage 2: all_gather the per-splat screen rows ([F, N]) ----
        rows = jnp.stack([
            px, py, proj.depth,
            proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
            proj.radius, proj.visible.astype(px.dtype),
            proj.normal_cam[:, 0], proj.normal_cam[:, 1],
            proj.normal_cam[:, 2],
            colors[:, 0], colors[:, 1], colors[:, 2],
            op, extra,
        ], axis=0)
        g = jax.lax.all_gather(rows, axis, axis=1, tiled=True)   # [F, N]

        # ---- stage 3: this device's horizontal tile band ----
        band0 = (jax.lax.axis_index(axis) * band_h).astype(g.dtype)
        projb = Projected(
            px=g[0], py=g[1] - band0, depth=g[2],
            conic=jnp.stack([g[3], g[4], g[5]], axis=-1),
            radius=g[6], visible=g[7] > 0.5,
            normal_cam=jnp.stack([g[8], g[9], g[10]], axis=-1))
        ids, valid = _tile_select(cfgb, projb)
        out = _composite_tiles(cfgb, projb.px, projb.py, projb,
                               g[14], jnp.stack([g[11], g[12], g[13]], -1),
                               g[15], ids, valid, bg)
        return (out.image, out.depth, out.normal, out.alpha, radii_loc,
                out.extra)

    sharded = P(axis)
    img = P(None, axis, None)
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded, sharded, sharded,
                  sharded, sharded, P(), P(), P()),
        out_specs=(img, img, img, img, sharded, img))
    image, depth, normal, alpha, radii, extra = fn(
        means3d, opac, scales, rotations, per_splat_color, extra_attrs,
        means2d_offset, active, viewmatrix, projmatrix, campos)

    H, W = cfg.image_height, cfg.image_width
    return RasterizeOutput(image[:, :H, :W], depth[:, :H, :W],
                           normal[:, :H, :W], alpha[:, :H, :W], radii,
                           extra[:, :H, :W])
