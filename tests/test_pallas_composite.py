"""Pallas fused composite vs the XLA-composed oracle path.

Runs the TPU kernel in interpreter mode on the CPU test mesh; same scenes as
test_rasterize. Checks the full 6-output contract, gradients (incl. the
means2D densification hook and aux stop-grad-weight channels), and the
cumsum building block.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from instag_tpu.ops.rasterize import (RasterizeConfig, composite_prepared,
                                      prepare, rasterize, sh_colors)
from tests.test_rasterize import make_camera, make_scene


def _cfgs(H, W, **kw):
    base = dict(max_per_tile=64, tile_chunk=8, approx_topk=False)
    base.update(kw)
    return (RasterizeConfig(H, W, backend="xla", **base),
            RasterizeConfig(H, W, backend="pallas_interpret", **base))


def test_cumsum_lanes_matches_jnp():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from instag_tpu.ops.pallas_composite import _cumsum_lanes

    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 64)).astype(np.float32))

    def kern(x_ref, o_ref):
        o_ref[:] = _cumsum_lanes(x_ref[:], 64)

    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=True)(x)
    np.testing.assert_allclose(np.asarray(out), np.cumsum(np.asarray(x), -1),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sh_deg", [0, 2])
def test_forward_matches_xla(sh_deg):
    H = W = 64
    cfg_x, cfg_p = _cfgs(H, W)
    view, full, campos, tanfov = make_camera(H, W)
    means, opac, scales, rots, shs = make_scene(n=150, sh_deg=sh_deg, seed=5)
    bg = jnp.array([0.15, 0.25, 0.35], jnp.float32)

    run = lambda cfg: jax.jit(lambda *a: rasterize(cfg, *a, shs=shs,
                                                   sh_degree=sh_deg))(
        means, opac, scales, rots, view, full, campos, tanfov, tanfov, bg)
    ox, op = run(cfg_x), run(cfg_p)
    for name in ("image", "depth", "normal", "alpha", "extra"):
        np.testing.assert_allclose(
            np.asarray(getattr(op, name)), np.asarray(getattr(ox, name)),
            atol=2e-5, err_msg=name)
    np.testing.assert_array_equal(np.asarray(op.radii), np.asarray(ox.radii))


def test_nondivisible_image():
    H, W = 50, 70
    cfg_x, cfg_p = _cfgs(H, W, max_per_tile=32)
    view, full, campos, tanfov = make_camera(H, W)
    means, opac, scales, rots, shs = make_scene(n=60)
    bg = jnp.array([1.0, 0.0, 0.0])
    run = lambda cfg: jax.jit(lambda *a: rasterize(cfg, *a, shs=shs,
                                                   sh_degree=1))(
        means, opac, scales, rots, view, full, campos, tanfov, tanfov, bg)
    ox, op = run(cfg_x), run(cfg_p)
    assert op.image.shape == (3, H, W)
    np.testing.assert_allclose(np.asarray(op.image), np.asarray(ox.image),
                               atol=2e-5)


def test_gradients_match_xla():
    """Analytic backward kernel vs XLA autodiff on every differentiable input."""
    H = W = 48
    cfg_x, cfg_p = _cfgs(H, W, max_per_tile=48, tile_chunk=4)
    view, full, campos, tanfov = make_camera(H, W)
    means, opac, scales, rots, shs = make_scene(n=40, seed=11)
    bg = jnp.array([0.4, 0.5, 0.6])
    offset = jnp.zeros((40, 2))
    tgt_img = jnp.asarray(np.random.default_rng(2).uniform(size=(3, H, W)).astype(np.float32))

    def loss(cfg, m, o, s, r, sh, off):
        out = rasterize(cfg, m, o, s, r, view, full, campos, tanfov, tanfov,
                        bg, shs=sh, sh_degree=1, means2d_offset=off)
        return (jnp.mean((out.image - tgt_img) ** 2)
                + 0.3 * jnp.mean(out.alpha)
                + 0.1 * jnp.mean(out.depth)
                + 0.05 * jnp.mean(out.normal ** 2))

    args = (means, opac, scales, rots, shs, offset)
    gx = jax.jit(jax.grad(lambda *a: loss(cfg_x, *a), argnums=range(6)))(*args)
    gp = jax.jit(jax.grad(lambda *a: loss(cfg_p, *a), argnums=range(6)))(*args)
    names = ["means", "opacity", "scales", "rotations", "shs", "means2d"]
    for n, a, b in zip(names, gx, gp):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all(), n
        scale = max(1e-6, np.abs(a).max())
        np.testing.assert_allclose(b, a, atol=5e-4 * scale, rtol=2e-3,
                                   err_msg=n)
    assert np.abs(np.asarray(gp[5])).sum() > 0  # densification hook alive


def test_aux_channels_and_shared_prepare():
    """composite_prepared with aux (attention) channels: values + stop-grad
    weight semantics must match the XLA path."""
    H = W = 32
    cfg_x, cfg_p = _cfgs(H, W, max_per_tile=32, tile_chunk=4)
    view, full, campos, tanfov = make_camera(H, W)
    means, opac, scales, rots, shs = make_scene(n=30, seed=9)
    bg = jnp.array([0.2, 0.2, 0.2])
    rng = np.random.default_rng(3)
    aux = jnp.asarray(rng.uniform(size=(30, 2)).astype(np.float32))

    def run(cfg, opac_in, aux_in):
        prep = prepare(cfg, means, scales, rots, view, full, campos,
                       tanfov, tanfov)
        colors = sh_colors(means, campos, shs, 1)
        return composite_prepared(cfg, prep, opac_in, colors, bg,
                                  aux_colors=aux_in)

    (ox, ax_img) = jax.jit(lambda o, a: run(cfg_x, o, a))(opac, aux)
    (op, ap_img) = jax.jit(lambda o, a: run(cfg_p, o, a))(opac, aux)
    np.testing.assert_allclose(np.asarray(ap_img), np.asarray(ax_img), atol=2e-5)
    np.testing.assert_allclose(np.asarray(op.image), np.asarray(ox.image), atol=2e-5)

    def aux_loss(cfg, opac_in, aux_in):
        _, aimg = run(cfg, opac_in, aux_in)
        return jnp.mean(aimg ** 2)

    gox, gax = jax.jit(jax.grad(lambda o, a: aux_loss(cfg_x, o, a),
                                argnums=(0, 1)))(opac, aux)
    gop, gap = jax.jit(jax.grad(lambda o, a: aux_loss(cfg_p, o, a),
                                argnums=(0, 1)))(opac, aux)
    # stop-grad weights: no gradient to opacity through aux channels
    assert float(jnp.abs(gop).sum()) == 0.0
    assert float(jnp.abs(gox).sum()) == 0.0
    np.testing.assert_allclose(np.asarray(gap), np.asarray(gax),
                               atol=1e-6, rtol=2e-3)


def test_multichunk_and_empty_tiles():
    """K=256 exercises the 128-lane chunked early-exit path; the splat
    cluster is confined to one image corner so most tiles carry cnt=0 and
    must come out exactly equal to the XLA path (bg color, zero grads)."""
    H = W = 80
    cfg_x, cfg_p = _cfgs(H, W, max_per_tile=256)
    view, full, campos, tanfov = make_camera(H, W)
    rng = np.random.default_rng(21)
    n = 300
    # cluster in a corner (world upper-left quadrant) + heavy opacity so
    # transmittance saturates mid-list inside occupied tiles
    means = jnp.asarray(
        np.stack([rng.uniform(-0.45, -0.15, n), rng.uniform(-0.45, -0.15, n),
                  rng.uniform(-0.1, 0.1, n)], -1).astype(np.float32))
    scales = jnp.asarray((0.02 + 0.02 * rng.uniform(size=(n, 3))).astype(np.float32))
    rots = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.7, 0.99, (n, 1)).astype(np.float32))
    shs = jnp.asarray((0.3 * rng.normal(size=(n, 4, 3))).astype(np.float32))
    bg = jnp.array([0.1, 0.6, 0.3], jnp.float32)
    tgt = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))

    def loss(cfg, m, o, s, r, sh):
        out = rasterize(cfg, m, o, s, r, view, full, campos, tanfov, tanfov,
                        bg, shs=sh, sh_degree=1)
        return (jnp.mean((out.image - tgt) ** 2) + 0.2 * jnp.mean(out.alpha)
                + 0.05 * jnp.mean(out.depth)), out

    args = (means, opac, scales, rots, shs)
    (lx, ox), gx = jax.jit(jax.value_and_grad(
        lambda *a: loss(cfg_x, *a), argnums=range(5), has_aux=True))(*args)
    (lp, op), gp = jax.jit(jax.value_and_grad(
        lambda *a: loss(cfg_p, *a), argnums=range(5), has_aux=True))(*args)
    np.testing.assert_allclose(float(lp), float(lx), rtol=1e-5)
    for name in ("image", "depth", "alpha"):
        np.testing.assert_allclose(np.asarray(getattr(op, name)),
                                   np.asarray(getattr(ox, name)),
                                   atol=3e-5, err_msg=name)
    # empty region must be exactly background
    np.testing.assert_allclose(
        np.asarray(op.image[:, -16:, -16:]),
        np.broadcast_to(np.asarray(bg)[:, None, None], (3, 16, 16)),
        atol=1e-6)
    for n_, a, b in zip(["means", "opac", "scales", "rots", "shs"], gx, gp):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all(), n_
        scale = max(1e-6, np.abs(a).max())
        np.testing.assert_allclose(b, a, atol=1e-3 * scale, rtol=5e-3,
                                   err_msg=n_)
