"""Tensor-parallel (splat/tile-sharded) rendering vs the single-chip path.

SURVEY.md §5.8(c) capability: shard splats for projection, all_gather the
projected rows, shard tiles for selection/composite. Must match the
single-chip rasterizer on images, radii, and gradients (same math, same
selection; only the band-origin subtraction introduces float rounding).
Runs on the virtual 8-device CPU mesh (conftest).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from instag_tpu.bench_utils import synthetic_camera, synthetic_state
from instag_tpu.ops.rasterize import RasterizeConfig, rasterize
from instag_tpu.parallel.tensor_parallel import (band_config,
                                                 rasterize_tensor_parallel)


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("tp",))


def _scene(size_h=64, size_w=64, n=500, cap=1024):
    state = synthetic_state(n, cap, seed=3, scale=0.01)
    cam = synthetic_camera(max(size_h, size_w))
    bg = jnp.array([0.1, 0.2, 0.3], jnp.float32)
    args = dict(
        means3d=state.params.xyz, opacities=state.get_opacity(),
        scales=state.get_scaling(), rotations=state.params.rotation,
        viewmatrix=cam.view_transform, projmatrix=cam.full_proj_transform,
        campos=cam.camera_center, tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        bg=bg, shs=state.get_features(), sh_degree=1, active=state.alive)
    return args


@pytest.mark.parametrize("n_dev,H,W", [(4, 64, 64), (2, 96, 72)])
def test_tp_matches_single_chip_forward(n_dev, H, W):
    cfg = RasterizeConfig(H, W, max_per_tile=64, approx_topk=False,
                          backend="xla")
    args = _scene(H, W)
    ref = rasterize(cfg, **args)
    out = rasterize_tensor_parallel(cfg, _mesh(n_dev), **args)

    np.testing.assert_allclose(np.asarray(out.image), np.asarray(ref.image),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=3e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.normal), np.asarray(ref.normal),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.radii), np.asarray(ref.radii))
    assert out.image.shape == (3, H, W)


def test_tp_gradients_match_single_chip():
    H = W = 64
    n_dev = 4
    cfg = RasterizeConfig(H, W, max_per_tile=64, approx_topk=False,
                          backend="xla")
    args = _scene(H, W)
    mesh = _mesh(n_dev)
    N = args["means3d"].shape[0]
    off0 = jnp.zeros((N, 2), jnp.float32)

    def loss_single(xyz, opac, off):
        a = dict(args, means3d=xyz, opacities=opac, means2d_offset=off)
        out = rasterize(cfg, **a)
        return jnp.sum(out.image ** 2) + jnp.sum(out.alpha)

    def loss_tp(xyz, opac, off):
        a = dict(args, means3d=xyz, opacities=opac, means2d_offset=off)
        out = rasterize_tensor_parallel(cfg, mesh, **a)
        return jnp.sum(out.image ** 2) + jnp.sum(out.alpha)

    g_ref = jax.grad(loss_single, argnums=(0, 1, 2))(
        args["means3d"], args["opacities"], off0)
    g_tp = jax.jit(jax.grad(loss_tp, argnums=(0, 1, 2)))(
        args["means3d"], args["opacities"], off0)

    for gr, gt, name in zip(g_ref, g_tp, ("xyz", "opac", "means2d_offset")):
        scale = np.abs(np.asarray(gr)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(gt) / scale,
                                   np.asarray(gr) / scale,
                                   atol=2e-4, err_msg=name)
    # the densification-stats hook must be fed (nonzero screen grads)
    assert float(jnp.abs(g_tp[2]).sum()) > 0


def test_band_config_validates_divisibility():
    cfg = RasterizeConfig(80, 80)  # tiles_y = 5
    with pytest.raises(ValueError):
        band_config(cfg, 2)
    b = band_config(RasterizeConfig(64, 72), 4)
    assert b.image_height == 16 and b.image_width == 80
