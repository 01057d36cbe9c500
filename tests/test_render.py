import numpy as np
import jax
import jax.numpy as jnp

from instag_tpu.render import (Camera, _sh_degree_mask, composite_fuse,
                               dilate_alpha, render_motion_mouth)
from instag_tpu.ops.rasterize import RasterizeConfig


def test_sh_degree_mask():
    m0 = np.asarray(_sh_degree_mask(0, 2))
    m1 = np.asarray(_sh_degree_mask(1, 2))
    m2 = np.asarray(_sh_degree_mask(2, 2))
    np.testing.assert_array_equal(m0, [1] + [0] * 8)
    np.testing.assert_array_equal(m1, [1] * 4 + [0] * 5)
    np.testing.assert_array_equal(m2, [1] * 9)


def test_dilate_alpha_maxpool():
    a = jnp.zeros((1, 21, 21)).at[0, 10, 10].set(0.8)
    d = np.asarray(dilate_alpha(a, 13))
    assert d[0, 10, 10] == np.float32(0.8)
    assert d[0, 10 + 6, 10] == np.float32(0.8)   # within 13//2 reach
    assert d[0, 10 + 7, 10] == 0.0               # outside


def test_composite_fuse_formula():
    """image = face - green(1-αf) + [mouth - green(1-αm) + torso(1-αm)](1-αf)
    (reference train_fuse_con.py:125-144)."""
    rng = np.random.default_rng(0)
    H = W = 8
    f = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))
    m = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))
    af = jnp.asarray(rng.uniform(size=(1, H, W)).astype(np.float32))
    am = jnp.asarray(rng.uniform(size=(1, H, W)).astype(np.float32))
    bg = jnp.array([0.0, 1.0, 0.0])
    torso = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))

    got = np.asarray(composite_fuse(f, af, m, am, bg, torso))
    mouth_full = m - bg[:, None, None] * (1 - am) + torso * (1 - am)
    want = f - bg[:, None, None] * (1 - af) + mouth_full * (1 - af)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5)


def test_mouth_move_feature_semantics():
    """move = [kth-largest, kth-smallest, range] of the face d_xyz.y x 100,
    masked to alive face slots (gaussian_renderer/__init__.py:366-374)."""
    from instag_tpu.models.gaussians import create_from_points
    n_face = 32
    rng = np.random.default_rng(1)
    dy = rng.normal(size=n_face).astype(np.float32)

    pts = jnp.asarray(rng.uniform(-0.05, 0.05, (8, 3)).astype(np.float32))
    cols = jnp.ones((8, 3)) * 0.5
    mouth_state = create_from_points(pts, cols, 16, 1, 1.0)
    face_state = create_from_points(
        jnp.asarray(rng.uniform(-0.05, 0.05, (n_face, 3)).astype(np.float32)),
        jnp.ones((n_face, 3)) * 0.5, n_face, 1, 1.0)

    captured = {}

    def mouth_umf(x, a, move):
        captured["move"] = move
        return {"d_xyz": jnp.zeros_like(x), "d_rot": jnp.zeros((x.shape[0], 4))}

    face_cache = {"d_xyz": jnp.stack(
        [jnp.zeros(n_face), jnp.asarray(dy), jnp.zeros(n_face)], -1)}

    cfg = RasterizeConfig(16, 16, max_per_tile=16, tile_chunk=1)
    cam = Camera(jnp.eye(4), jnp.eye(4), jnp.zeros(3) - jnp.array([0, 0, 2.0]),
                 jnp.float32(0.35), jnp.float32(0.35))
    k = 5
    render_motion_mouth(cfg, cam, mouth_state, mouth_umf, face_state,
                        None, jnp.zeros((8, 29, 16)), jnp.zeros(3),
                        personalized=False, align=False, k=k,
                        face_motion_cache=face_cache)
    move = np.asarray(captured["move"])[0]
    srt = np.sort(dy)[::-1]
    want_hi = srt[k - 1] * 100
    want_lo = np.sort(dy)[k - 1] * 100
    np.testing.assert_allclose(move[0], want_hi, rtol=1e-4)
    np.testing.assert_allclose(move[1], want_lo, rtol=1e-4)
    np.testing.assert_allclose(move[2], want_hi - want_lo, rtol=1e-4)
