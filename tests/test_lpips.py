import numpy as np
import jax
import jax.numpy as jnp

from instag_tpu.models.lpips import LPIPS, load_lpips_params


def test_lpips_basic_properties():
    model, params = load_lpips_params()
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32))

    apply = jax.jit(model.apply)
    d_self = apply(params, a, a)
    d_ab = apply(params, a, b)
    assert d_self.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_self), 0.0, atol=1e-6)
    assert (np.asarray(d_ab) > 0).all()
    # symmetric
    d_ba = apply(params, b, a)
    np.testing.assert_allclose(np.asarray(d_ab), np.asarray(d_ba), rtol=1e-4)
    # small perturbations score closer than big ones
    d_near = apply(params, a, a + 0.05)
    assert (np.asarray(d_near) < np.asarray(d_ab)).all()


def test_lpips_differentiable():
    model, params = load_lpips_params()
    a = jnp.ones((1, 3, 32, 32)) * 0.2
    b = jnp.zeros((1, 3, 32, 32))

    g = jax.jit(jax.grad(lambda x: model.apply(params, x, b).sum()))(a)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
