"""Depth-map -> normal-map visualization util (reference
utils/normal_utils.py:9-36; consumed by the TensorBoard depth-normal panel,
train_face.py:843-861)."""

from __future__ import annotations

import jax.numpy as jnp


def depths_to_points(view_transform, tanfovx, tanfovy, depth):
    """Backproject a depth map to world-space points.

    view_transform: [4,4] transposed world->view (Camera.view_transform);
    depth: [1, H, W]. Returns [H, W, 3].
    """
    h, w = depth.shape[-2:]
    fx = w / (2.0 * tanfovx)
    fy = h / (2.0 * tanfovy)
    c2w = jnp.linalg.inv(view_transform.T)
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=depth.dtype),
                          jnp.arange(w, dtype=depth.dtype), indexing="ij")
    # K^-1 [x, y, 1]
    dirs_cam = jnp.stack([(gx - w / 2.0) / fx, (gy - h / 2.0) / fy,
                          jnp.ones_like(gx)], -1)            # [H, W, 3]
    rays_d = dirs_cam @ c2w[:3, :3].T
    rays_o = c2w[:3, 3]
    return depth[0][..., None] * rays_d + rays_o


def depth_to_normal(view_transform, tanfovx, tanfovy, depth):
    """Finite-difference normals from a depth map (reference :26-36).

    Returns [H, W, 3]; border pixels are zero.
    """
    points = depths_to_points(view_transform, tanfovx, tanfovy, depth)
    dx = points[2:, 1:-1] - points[:-2, 1:-1]
    dy = points[1:-1, 2:] - points[1:-1, :-2]
    n = jnp.cross(dx, dy)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    out = jnp.zeros_like(points)
    return out.at[1:-1, 1:-1].set(n)
