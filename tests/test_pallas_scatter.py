"""Pallas tile->splat scatter-add vs the numpy oracle, and the static
scatter_mode plumbing of ops.rasterize._tile_gather.

The kernel is the VMEM-resident transpose of the [F, N] -> [F, T, K]
tile gather (reference: the CUDA BACKWARD tile pass of
diff-gaussian-rasterization/cuda_rasterizer/backward.cu, which likewise
accumulates per-splat grads while walking each tile's depth-sorted list).
Runs in interpreter mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from instag_tpu.ops.pallas_scatter import scatter_add_tiles
from instag_tpu.ops.rasterize import _tile_gather


def _oracle(g, ids, cnt, n):
    F, T, K = g.shape
    acc = np.zeros((F, n), np.float32)
    for t in range(T):
        for j in range(int(cnt[t])):
            acc[:, ids[t, j]] += g[:, t, j]
    return acc


@pytest.mark.parametrize("T,K,n,F", [(8, 16, 256, 4), (13, 32, 512, 16)])
def test_scatter_matches_oracle(T, K, n, F):
    rng = np.random.default_rng(0)
    g = rng.normal(size=(F, T, K)).astype(np.float32)
    # duplicate-heavy ids (collisions within and across tiles)
    ids = rng.integers(0, max(n // 8, 4), size=(T, K)).astype(np.int32)
    cnt = rng.integers(0, K + 1, size=(T,)).astype(np.int32)

    out = scatter_add_tiles(jnp.asarray(g), jnp.asarray(ids),
                            jnp.asarray(cnt), n, interpret=True)
    np.testing.assert_allclose(np.asarray(out), _oracle(g, ids, cnt, n),
                               rtol=1e-6, atol=1e-6)


def test_scatter_empty_and_full_tiles():
    F, T, K, n = 3, 8, 8, 64
    rng = np.random.default_rng(1)
    g = rng.normal(size=(F, T, K)).astype(np.float32)
    ids = rng.integers(0, n, size=(T, K)).astype(np.int32)
    cnt = np.array([0, K, 0, 1, K, 0, K - 1, 2], np.int32)
    out = scatter_add_tiles(jnp.asarray(g), jnp.asarray(ids),
                            jnp.asarray(cnt), n, interpret=True)
    np.testing.assert_allclose(np.asarray(out), _oracle(g, ids, cnt, n),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("mode", ["full", "pallas", "auto"])
def test_tile_gather_modes_match_cond(mode):
    """All static scatter_mode variants produce the same VJP as the shipping
    cond path (which is itself finite-difference tested via the rasterizer
    suite)."""
    if mode == "pallas" and jax.default_backend() != "tpu":
        mode = "pallas_interpret"
    rng = np.random.default_rng(2)
    F, N, T, K = 5, 128, 6, 16
    feats = jnp.asarray(rng.normal(size=(F, N)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, N, size=(T, K)).astype(np.int32))
    # prefix validity, as produced by the depth-sorted top-k selection
    cnt = rng.integers(0, K + 1, size=(T, 1))
    valid = jnp.asarray(np.arange(K)[None, :] < cnt)
    g = jnp.asarray(rng.normal(size=(F, T, K)).astype(np.float32))

    def vjp_of(m):
        out, vjp = jax.vjp(lambda f: _tile_gather(f, ids, valid, m), feats)
        return out, vjp(g)[0]

    out_c, grad_c = vjp_of("cond")
    out_m, grad_m = vjp_of(mode)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_c),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad_m), np.asarray(grad_c),
                               rtol=1e-5, atol=1e-5)


def test_scatter_vmap_interpret():
    """The kernel batches under vmap (Pallas adds a leading grid dim) — the
    precondition for serving the --data_parallel path on TPU."""
    rng = np.random.default_rng(4)
    B, F, T, K, n = 3, 4, 8, 128, 256
    g = jnp.asarray(rng.normal(size=(B, F, T, K)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, n, size=(B, T, K)).astype(np.int32))
    cnt = jnp.asarray(rng.integers(0, K + 1, size=(B, T)).astype(np.int32))

    out = jax.vmap(
        lambda gg, ii, cc: scatter_add_tiles(gg, ii, cc, n, True))(g, ids, cnt)
    ref = np.zeros((B, F, n), np.float32)
    for b in range(B):
        for t in range(T):
            for j in range(int(cnt[b, t])):
                ref[b, :, ids[b, t, j]] += np.asarray(g)[b, :, t, j]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)
