import numpy as np
import jax
import jax.numpy as jnp

from instag_tpu.models.motion import (
    AudioFeature, MotionNetwork, MouthMotionNetwork,
    PersonalizedMotionNetwork, audio_in_dim)


def test_audio_in_dims():
    assert audio_in_dim("deepspeech") == 29
    assert audio_in_dim("esperanto") == 44
    assert audio_in_dim("hubert") == 1024
    assert audio_in_dim("ave") == 32


def test_audio_feature_shapes():
    m = AudioFeature("deepspeech", 32)
    a = jnp.zeros((8, 29, 16))
    params = m.init(jax.random.key(0), a)
    out = m.apply(params, a)
    assert out.shape == (1, 32)


def test_audio_feature_ave():
    m = AudioFeature("ave", 32)
    a = jnp.zeros((8, 1, 512))
    params = m.init(jax.random.key(0), a)
    out = m.apply(params, a)
    assert out.shape == (1, 32)


def test_face_motion_network():
    net = MotionNetwork("deepspeech")
    x = jnp.asarray(np.random.default_rng(0).uniform(-0.1, 0.1, (50, 3)).astype(np.float32))
    a = jnp.asarray(np.random.default_rng(1).normal(size=(8, 29, 16)).astype(np.float32))
    e = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (6,)).astype(np.float32))
    params = net.init(jax.random.key(0), x, a, e)
    out = jax.jit(net.apply)(params, x, a, e)
    assert out["d_xyz"].shape == (50, 3)
    assert out["d_rot"].shape == (50, 4)
    assert out["d_opa"].shape == (50, 1)
    assert out["d_scale"].shape == (50, 3)
    assert out["ambient_aud"].shape == (50, 1)
    assert out["ambient_eye"].shape == (50, 1)
    # the 1e-2 position-scale convention (scene/motion_net.py:307)
    assert float(jnp.abs(out["d_xyz"]).max()) < 1.0


def test_mouth_motion_network():
    net = MouthMotionNetwork("deepspeech")
    x = jnp.asarray(np.random.default_rng(0).uniform(-0.1, 0.1, (30, 3)).astype(np.float32))
    a = jnp.zeros((8, 29, 16))
    move = jnp.asarray(np.array([[0.5, -0.5, 1.0]], np.float32))
    params = net.init(jax.random.key(0), x, a, move)
    out = jax.jit(net.apply)(params, x, a, move)
    assert out["d_xyz"].shape == (30, 3)
    assert out["d_rot"].shape == (30, 4)
    # x/z are damped 5x relative to y before the sigmoid scaler; with random
    # init we can at least check outputs are finite and small
    assert np.isfinite(np.asarray(out["d_xyz"])).all()


def test_personalized_motion_network_face_vs_mouth():
    x = jnp.asarray(np.random.default_rng(0).uniform(-0.1, 0.1, (20, 3)).astype(np.float32))
    a = jnp.zeros((8, 29, 16))
    e = jnp.zeros((6,))

    face = PersonalizedMotionNetwork(kind="face")
    pf = face.init(jax.random.key(0), x, a, e)
    of = face.apply(pf, x, a, e)
    assert of["d_opa"].shape == (20, 1)
    assert of["d_scale"].shape == (20, 3)
    assert of["ambient_eye"].shape == (20, 1)
    # p_scale in [0.75, 1.25] (tanh/5*0.25+1, scene/motion_net.py:718)
    ps = np.asarray(of["p_scale"])
    assert (ps > 0.75).all() and (ps < 1.25).all()

    mouth = PersonalizedMotionNetwork(kind="mouth")
    pm = mouth.init(jax.random.key(0), x, a)
    om = mouth.apply(pm, x, a)
    assert om["d_opa"] is None and om["d_scale"] is None
    assert om["ambient_eye"] is None
    assert om["d_xyz"].shape == (20, 3)


def test_motion_network_gradients_flow():
    net = MotionNetwork("deepspeech")
    x = jnp.asarray(np.random.default_rng(0).uniform(-0.1, 0.1, (10, 3)).astype(np.float32))
    a = jnp.asarray(np.random.default_rng(1).normal(size=(8, 29, 16)).astype(np.float32))
    e = jnp.ones((6,)) * 0.3
    params = net.init(jax.random.key(0), x, a, e)

    @jax.jit
    def loss(p, pts):
        out = net.apply(p, pts, a, e)
        return jnp.sum(out["d_xyz"] ** 2) + jnp.sum(out["d_rot"] ** 2)

    g_params, g_x = jax.grad(loss, argnums=(0, 1))(params, x)
    leaves = jax.tree.leaves(g_params)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)
    assert np.isfinite(np.asarray(g_x)).all()
