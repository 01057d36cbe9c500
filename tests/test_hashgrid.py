import numpy as np
import jax
import jax.numpy as jnp

import pytest

from instag_tpu.ops.hashgrid import (
    HashGridConfig, hashgrid_encode_jit as hashgrid_encode, init_hashgrid,
    split_xyz, triplane_configs)

pytestmark = pytest.mark.smoke  # fast contract tier: pytest -m smoke < 5 min

PRIMES = (1, 2654435761, 805459861)


def test_offsets_table_matches_reference_rule():
    """gridencoder/grid.py:118-131: per-level size = min(2^T, (res+1)^D) /8-rounded."""
    cfg = triplane_configs(base_resolution=16, desired_resolution=256 * 0.15)
    offsets, total = cfg.level_offsets()
    # independently recompute
    pls = np.exp2(np.log2((256 * 0.15) / 16) / (12 - 1))
    off = 0
    for i in range(12):
        res = int(np.ceil(16 * pls ** i))
        params = min(2 ** 17, (res + 1) ** 2)
        params = int(np.ceil(params / 8) * 8)
        assert offsets[i + 1] - offsets[i] == params
        off += params
    assert total == off
    assert cfg.output_dim == 12


def test_dense_level_is_bilinear_interpolation():
    """On a level whose dense table fits, the encoding must equal manual
    bilinear interpolation with pos = x01 * scale + 0.5 (gridencoder.cu:141-180)."""
    cfg = HashGridConfig(input_dim=2, num_levels=1, level_dim=2,
                         per_level_scale=2.0, base_resolution=8,
                         log2_hashmap_size=10)
    emb = init_hashgrid(jax.random.key(0), cfg) * 1e4  # scale up for numerics
    offsets, _ = cfg.level_offsets()
    hsize = int(offsets[1])

    rng = np.random.default_rng(0)
    x01 = rng.uniform(0.02, 0.98, size=(32, 2)).astype(np.float32)
    x = x01 * 2.0 - 1.0  # bound=1 maps back to x01
    out = np.asarray(hashgrid_encode(cfg, emb, jnp.asarray(x), bound=1.0))

    scale = 8.0 - 1.0
    res_side = 8 + 1  # resolution+1 (align_corners False)
    table = np.asarray(emb)
    for i in range(32):
        pos = x01[i] * scale + 0.5
        pg = np.floor(pos).astype(np.int64)
        f = pos - pg
        want = np.zeros(2)
        for corner in range(4):
            w = 1.0
            coord = []
            for d in range(2):
                if (corner >> d) & 1:
                    w *= f[d]
                    coord.append(pg[d] + 1)
                else:
                    w *= 1 - f[d]
                    coord.append(pg[d])
            idx = (coord[0] + coord[1] * res_side) % hsize
            want += w * table[idx]
        np.testing.assert_allclose(out[i], want, rtol=1e-4, atol=1e-6)


def test_hash_level_uses_primes():
    """A level too big for its table must use the torch-ngp xor-prime hash."""
    cfg = HashGridConfig(input_dim=2, num_levels=1, level_dim=1,
                         per_level_scale=2.0, base_resolution=1024,
                         log2_hashmap_size=8)
    emb = init_hashgrid(jax.random.key(1), cfg) * 1e4
    offsets, _ = cfg.level_offsets()
    hsize = int(offsets[1])
    assert hsize == 256  # hashed level

    x01 = np.array([[0.5, 0.25]], np.float32)
    out = np.asarray(hashgrid_encode(cfg, emb, jnp.asarray(x01 * 2 - 1), bound=1.0))

    scale = 1024.0 - 1.0
    pos = x01[0] * scale + 0.5
    pg = np.floor(pos).astype(np.uint32)
    f = pos - pg
    table = np.asarray(emb)
    want = 0.0
    for corner in range(4):
        w, coord = 1.0, []
        for d in range(2):
            if (corner >> d) & 1:
                w *= f[d]
                coord.append(pg[d] + 1)
            else:
                w *= 1 - f[d]
                coord.append(pg[d])
        h = 0
        for d in range(2):
            h ^= (int(coord[d]) * PRIMES[d]) & 0xFFFFFFFF
        want += w * table[int(h % hsize), 0]
    np.testing.assert_allclose(out[0, 0], want, rtol=1e-4, atol=1e-6)


def test_out_of_bounds_is_zero():
    cfg = triplane_configs(16, 256 * 0.15)
    emb = init_hashgrid(jax.random.key(2), cfg)
    x = jnp.array([[0.2, 0.2], [1.5, 0.0], [-1.5, 0.0]], jnp.float32)
    out = np.asarray(hashgrid_encode(cfg, emb, x, bound=1.0))
    assert np.abs(out[0]).sum() > 0
    np.testing.assert_array_equal(out[1], 0)
    np.testing.assert_array_equal(out[2], 0)


def test_gradients_flow_to_embeddings_and_inputs():
    cfg = triplane_configs(16, 256 * 0.15)
    emb = init_hashgrid(jax.random.key(3), cfg)
    x = jnp.asarray(np.random.default_rng(5).uniform(-0.1, 0.1, (16, 2)).astype(np.float32))

    @jax.jit
    def loss(e, pts):
        from instag_tpu.ops.hashgrid import hashgrid_encode as enc
        return jnp.sum(enc(cfg, e, pts, bound=0.15) ** 2)

    g_emb, g_x = jax.jit(jax.grad(loss, argnums=(0, 1)))(emb, x)
    assert float(jnp.abs(g_emb).sum()) > 0
    assert float(jnp.abs(g_x).sum()) > 0
    # finite-difference check on input grads (interpolation is piecewise linear)
    eps = 1e-4
    f0 = float(loss(emb, x))
    x_pert = x.at[0, 0].add(eps)
    fd = (float(loss(emb, x_pert)) - f0) / eps
    np.testing.assert_allclose(fd, float(g_x[0, 0]), rtol=5e-2, atol=1e-5)


def test_split_xyz():
    x = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    xy, yz, xz = split_xyz(x)
    np.testing.assert_array_equal(np.asarray(xy), np.asarray(x[:, :2]))
    np.testing.assert_array_equal(np.asarray(yz), np.asarray(x[:, 1:]))
    np.testing.assert_array_equal(np.asarray(xz)[:, 0], np.asarray(x[:, 0]))
    np.testing.assert_array_equal(np.asarray(xz)[:, 1], np.asarray(x[:, 2]))


def test_knn_matches_bruteforce():
    from instag_tpu.ops.knn import mean_knn_dist2
    rng = np.random.default_rng(6)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    got = np.asarray(mean_knn_dist2(jnp.asarray(pts), k=3, block=128))
    d2 = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.sort(d2, axis=1)[:, :3].mean(-1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)
