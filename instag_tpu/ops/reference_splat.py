"""Brute-force O(N·pixels) splatting oracle for testing the tiled rasterizer.

Composites *every* Gaussian at *every* pixel in strict global depth order —
no tiling, no per-tile K truncation — so it is the exact sequential semantics
of the CUDA rasterizer (forward), at unusable-for-training cost. Tests compare
``ops.rasterize`` against this on tiny scenes (SURVEY.md §4 test plan).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .rasterize import RasterizeConfig, project_gaussians
from ..utils.sh import eval_sh


def splat_reference(cfg: RasterizeConfig, means3d, opacities, scales,
                    rotations, viewmatrix, projmatrix, campos, tanfovx,
                    tanfovy, bg, shs=None, sh_degree=0, colors_precomp=None,
                    active=None, bbox_sigma: float | None = None):
    """``bbox_sigma``: restrict each splat's update to its +-bbox_sigma
    standard-deviation pixel box. With the CUDA alpha floor (alpha < 1/255
    skipped) any value >= 3.4 is EXACT for opacity <= 1
    (exp(-0.5*3.4^2) = 3.1e-3 < 1/255 = 3.92e-3) — it only skips pixels
    the full sweep would skip via the threshold anyway. None (default)
    keeps the historical full-frame sweep; scripts/parity_fullframe.py
    uses 4.0 to make the 512^2/30k oracle tractable."""
    H, W = cfg.image_height, cfg.image_width
    proj = project_gaussians(cfg, means3d, scales, rotations, viewmatrix,
                             projmatrix, campos, tanfovx, tanfovy, active)
    if colors_precomp is None:
        dirs = means3d - campos[None, :]
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        colors = jnp.maximum(eval_sh(sh_degree, jnp.swapaxes(shs, -1, -2), dirs) + 0.5, 0.0)
    else:
        colors = colors_precomp

    order = np.argsort(np.asarray(proj.depth))
    px, py = np.asarray(proj.px), np.asarray(proj.py)
    conic = np.asarray(proj.conic)
    opac = np.asarray(opacities).reshape(-1)
    cols = np.asarray(colors)
    depths = np.asarray(proj.depth)
    norms = np.asarray(proj.normal_cam)
    vis = np.asarray(proj.visible)

    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    T = np.ones((H, W), np.float64)
    img = np.zeros((3, H, W), np.float64)
    dep = np.zeros((H, W), np.float64)
    nrm = np.zeros((3, H, W), np.float64)
    alp = np.zeros((H, W), np.float64)
    done = np.zeros((H, W), bool)

    radii = np.asarray(proj.radius)  # = ceil(3*sqrt(lambda_max)) px

    for i in order:
        if not vis[i]:
            continue
        if bbox_sigma is None:
            sl = (slice(None), slice(None))
        else:
            # |dx|,|dy| <= bbox_sigma*sqrt(lambda_max) bounds the
            # bbox_sigma Mahalanobis ellipse; radius/3 = sqrt(lambda_max)
            r = radii[i] / 3.0 * bbox_sigma
            y0 = max(int(np.floor(py[i] - r)), 0)
            y1 = min(int(np.ceil(py[i] + r)) + 1, H)
            x0 = max(int(np.floor(px[i] - r)), 0)
            x1 = min(int(np.ceil(px[i] + r)) + 1, W)
            if y0 >= y1 or x0 >= x1:
                continue
            sl = (slice(y0, y1), slice(x0, x1))
        dx = xs[sl] - px[i]
        dy = ys[sl] - py[i]
        A, B, C = conic[i]
        power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
        alpha = np.minimum(0.99, opac[i] * np.exp(power))
        ok = (power <= 0.0) & (alpha >= 1.0 / 255.0) & ~done[sl]
        test_T = T[sl] * (1 - alpha)
        stop = ok & (test_T < 1e-4)
        ok = ok & (test_T >= 1e-4)
        w = np.where(ok, alpha * T[sl], 0.0)
        img[(slice(None),) + sl] += cols[i][:, None, None] * w
        dep[sl] += depths[i] * w
        nrm[(slice(None),) + sl] += norms[i][:, None, None] * w
        alp[sl] += w
        T[sl] = np.where(ok, test_T, T[sl])
        done[sl] |= stop

    img += np.asarray(bg)[:, None, None] * T
    return img, dep[None], nrm, alp[None]
