"""kNN initial-scale estimation, replacing the reference's simple-knn CUDA op.

``mean_knn_dist2(points)`` returns, per point, the mean squared distance to
its 3 nearest neighbours (excluding itself) — the quantity ``distCUDA2``
produces and the only use of simple-knn in the reference
(scene/gaussian_model.py:246: initial log-scales = log(sqrt(dist2))).

Runs once at init on <= ~10k points, so a blocked brute-force O(N^2) pass is
fine on TPU (the pairwise distance matrix is one big MXU matmul).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mean_knn_dist2(points: jnp.ndarray, k: int = 3,
                   block: int = 4096) -> jnp.ndarray:
    """[N, 3] -> [N] mean of squared distances to the k nearest neighbours."""
    n = points.shape[0]
    sq = jnp.sum(points ** 2, axis=-1)  # [N]

    pad = (-n) % block
    pts_pad = jnp.pad(points, ((0, pad), (0, 0)))
    sq_pad = jnp.pad(sq, (0, pad), constant_values=jnp.inf)
    nb = (n + pad) // block

    def body(carry, i):
        rows = jax.lax.dynamic_slice_in_dim(pts_pad, i * block, block)
        rows_sq = jax.lax.dynamic_slice_in_dim(sq_pad, i * block, block)
        # d2[a, b] = |ra|^2 + |pb|^2 - 2 ra.pb ; the cross term is an MXU matmul
        d2 = rows_sq[:, None] + sq[None, :] - 2.0 * (rows @ points.T)
        d2 = jnp.maximum(d2, 0.0)
        # mask self-distances
        row_ids = i * block + jnp.arange(block)
        self_mask = row_ids[:, None] == jnp.arange(n)[None, :]
        d2 = jnp.where(self_mask, jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return carry, jnp.mean(-neg_top, axis=-1)

    _, out = jax.lax.scan(body, None, jnp.arange(nb))
    return out.reshape(-1)[:n]
