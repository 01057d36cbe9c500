"""Differentiable triangle-mesh renderer (JAX), for the photometric tracker.

Replaces the reference's pytorch3d ``Render_3DMM`` (face_tracking/
render_3dmm.py:32-202): per-vertex SH-lit colors, perspective projection,
hard z-buffer visibility with gradients through barycentric interpolation —
the same gradient surface pytorch3d's naive-blend mesh renderer exposes.

TPU-shaped like the Gaussian splatter: per-16x16-tile candidate selection
(front-K triangles by nearest vertex depth) then a fixed-[P, K] barycentric
evaluation, masked z-argmin select (stop-gradient on the *selection*, not
the interpolation), one pass, static shapes throughout.

Camera convention: COLMAP-style — x right, y down, z forward;
``px = f·x/z + cx``; vertices must already be in camera space.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MeshRenderConfig:
    image_height: int
    image_width: int
    tile: int = 16
    max_per_tile: int = 64      # candidate triangles per tile
    tile_chunk: int = 64        # tiles per scan step
    z_near: float = 1e-3

    @property
    def tiles_y(self):
        return -(-self.image_height // self.tile)

    @property
    def tiles_x(self):
        return -(-self.image_width // self.tile)


def render_mesh(cfg: MeshRenderConfig, verts_cam: jnp.ndarray,
                tris: jnp.ndarray, vert_colors: jnp.ndarray,
                focal, cx, cy) -> jnp.ndarray:
    """Rasterize one mesh.

    Args:
      verts_cam: [V, 3] camera-space vertices (z > 0 in front).
      tris: [F, 3] int32 triangle vertex ids.
      vert_colors: [V, 3] per-vertex colors (already lit).
      focal, cx, cy: intrinsics (scalars).

    Returns [H, W, 4] RGBA (alpha 1 where a triangle covers the pixel).
    Differentiable w.r.t. verts_cam and vert_colors.
    """
    H, W, tile = cfg.image_height, cfg.image_width, cfg.tile
    K = cfg.max_per_tile

    z = verts_cam[:, 2]
    safe_z = jnp.maximum(z, cfg.z_near)
    px = focal * verts_cam[:, 0] / safe_z + cx
    py = focal * verts_cam[:, 1] / safe_z + cy

    t0, t1, t2 = tris[:, 0], tris[:, 1], tris[:, 2]
    x0, y0, z0 = px[t0], py[t0], z[t0]
    x1, y1, z1 = px[t1], py[t1], z[t1]
    x2, y2, z2 = px[t2], py[t2], z[t2]

    valid = (z0 > cfg.z_near) & (z1 > cfg.z_near) & (z2 > cfg.z_near)
    xmin = jnp.minimum(jnp.minimum(x0, x1), x2)
    xmax = jnp.maximum(jnp.maximum(x0, x1), x2)
    ymin = jnp.minimum(jnp.minimum(y0, y1), y2)
    ymax = jnp.maximum(jnp.maximum(y0, y1), y2)
    zmin = jnp.minimum(jnp.minimum(z0, z1), z2)
    neg_depth = jnp.where(valid, -zmin, -jnp.inf)

    T = cfg.tiles_y * cfg.tiles_x
    tile_ids = jnp.arange(T, dtype=jnp.int32)
    chunk = min(cfg.tile_chunk, T)
    pad = (-T) % chunk
    tile_ids = jnp.pad(tile_ids, (0, pad)).reshape(-1, chunk)

    kk = min(K, tris.shape[0])

    def select(tids):
        ty = (tids // cfg.tiles_x).astype(px.dtype)
        tx = (tids % cfg.tiles_x).astype(px.dtype)
        xa, xb = tx * tile, (tx + 1) * tile
        ya, yb = ty * tile, (ty + 1) * tile
        hit = ((xmax[None, :] >= xa[:, None]) & (xmin[None, :] <= xb[:, None]) &
               (ymax[None, :] >= ya[:, None]) & (ymin[None, :] <= yb[:, None]))
        keys = jnp.where(hit, neg_depth[None, :], -jnp.inf)
        vals, idx = jax.lax.top_k(keys, kk)       # nearest triangles first
        if kk < K:
            idx = jnp.pad(idx, ((0, 0), (0, K - kk)))
            vals = jnp.pad(vals, ((0, 0), (0, K - kk)),
                           constant_values=-jnp.inf)
        return idx.astype(jnp.int32), vals > -jnp.inf

    ids, sel_valid = jax.lax.map(select, tile_ids)
    ids = ids.reshape(-1, K)[:T]
    sel_valid = sel_valid.reshape(-1, K)[:T]

    oy, ox = jnp.meshgrid(jnp.arange(tile), jnp.arange(tile), indexing="ij")
    pix_off = jnp.stack([ox.reshape(-1), oy.reshape(-1)], -1).astype(px.dtype)
    P = tile * tile

    c0 = vert_colors[t0]
    c1 = vert_colors[t1]
    c2 = vert_colors[t2]

    def shade(args):
        tids, gids, gvalid = args                       # [c], [c,K], [c,K]
        gx0, gy0 = x0[gids], y0[gids]                   # [c, K]
        gx1, gy1 = x1[gids], y1[gids]
        gx2, gy2 = x2[gids], y2[gids]
        gz = jnp.stack([z0[gids], z1[gids], z2[gids]], -1)   # [c, K, 3]
        gc = jnp.stack([c0[gids], c1[gids], c2[gids]], -2)   # [c, K, 3, 3]

        ty = (tids // cfg.tiles_x).astype(px.dtype)
        tx = (tids % cfg.tiles_x).astype(px.dtype)
        pxs = tx[:, None] * tile + pix_off[None, :, 0] + 0.5  # [c, P]
        pys = ty[:, None] * tile + pix_off[None, :, 1] + 0.5

        # barycentrics via edge functions, [c, P, K]
        dpx = pxs[:, :, None] - gx2[:, None, :]
        dpy = pys[:, :, None] - gy2[:, None, :]
        d01 = (gy1 - gy2)[:, None, :]
        d02 = (gx2 - gx1)[:, None, :]
        d11 = (gy2 - gy0)[:, None, :]
        d12 = (gx0 - gx2)[:, None, :]
        denom = ((gy1 - gy2) * (gx0 - gx2)
                 + (gx2 - gx1) * (gy0 - gy2))[:, None, :]
        denom_safe = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        w0 = (d01 * dpx + d02 * dpy) / denom_safe
        w1 = (d11 * dpx + d12 * dpy) / denom_safe
        w2 = 1.0 - w0 - w1
        bc = jnp.stack([w0, w1, w2], -1)               # [c, P, K, 3]

        inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)
                  & (jnp.abs(denom) > 1e-9)
                  & gvalid[:, None, :])
        zp = jnp.einsum("cpkv,ckv->cpk", bc, gz)       # interpolated depth
        zkey = jnp.where(inside, zp, jnp.inf)
        best = jnp.argmin(zkey, axis=-1)               # [c, P] (hard select)
        best = jax.lax.stop_gradient(best)
        covered = jnp.take_along_axis(inside, best[..., None], -1)[..., 0]

        c_n, p_n = best.shape
        bidx = jnp.broadcast_to(best[:, :, None, None], (c_n, p_n, 1, 3))
        bsel = jnp.take_along_axis(bc, bidx, axis=2)[:, :, 0, :]   # [c,P,3]
        cidx = jnp.broadcast_to(best[:, :, None, None], (c_n, p_n, 3, 3))
        csel = jnp.take_along_axis(gc, cidx, axis=1)               # [c,P,3,3]
        rgb = jnp.einsum("cpv,cpvd->cpd", bsel, csel)  # [c, P, 3]
        rgb = jnp.where(covered[..., None], rgb, 0.0)
        return jnp.concatenate([rgb, covered[..., None].astype(rgb.dtype)],
                               -1)                      # [c, P, 4]

    out = jax.lax.map(shade, (
        jnp.pad(jnp.arange(T, dtype=jnp.int32), (0, pad)).reshape(-1, chunk),
        jnp.pad(ids, ((0, pad), (0, 0))).reshape(-1, chunk, K),
        jnp.pad(sel_valid, ((0, pad), (0, 0))).reshape(-1, chunk, K)))
    out = out.reshape(-1, P, 4)[:T]
    img = out.reshape(cfg.tiles_y, cfg.tiles_x, tile, tile, 4)
    img = img.transpose(0, 2, 1, 3, 4).reshape(cfg.tiles_y * tile,
                                               cfg.tiles_x * tile, 4)
    return img[:H, :W]
