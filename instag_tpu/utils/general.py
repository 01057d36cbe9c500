"""General math utilities: LR schedules, quaternion algebra, activations.

Parity targets cited per-function from reference utils/general_utils.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=1000000):
    """Log-linear LR interpolation with an optional warmup dip
    (reference utils/general_utils.py:36-68). Works on traced or python ints.
    Returns 0 when lr_init == 0 (disabled group) or step is out of range."""
    step = jnp.asarray(step, dtype=jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * np.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(np.log(max(lr_init, 1e-32)) * (1 - t) + np.log(max(lr_final, 1e-32)) * t)
    lr = delay_rate * log_lerp
    valid = (step >= 0) & (step <= max_steps) & (lr_init > 0)
    return jnp.where(valid, lr, 0.0)


def safe_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize with a NaN-free gradient at x = 0.

    The ``x / maximum(norm(x), eps)`` idiom is NOT safe: at x = 0 the
    ``maximum`` picks the constant branch (zero cotangent into the sqrt),
    but sqrt's own vjp is g * 0.5/sqrt(0) = g * inf, and 0 * inf = NaN.
    Every zero-padded dead slot then emits NaN gradients each step, and an
    alive quaternion whose raw value crosses ~0 poisons the whole model
    (observed live: pre-training NaN collapse via the d_rot head).
    ``sqrt(sum(x^2) + eps^2)`` has gradient x/sqrt(...) -> 0 at x = 0.
    """
    return x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps * eps)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return safe_normalize(q, eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> 3x3 rotation matrix
    (reference utils/general_utils.py:85 build_rotation; expects normalized q).
    Batched: [..., 4] -> [..., 3, 3]."""
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1)
    row1 = jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1)
    row2 = jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R(q) @ diag(s)  (reference utils/general_utils.py:108).
    s: [..., 3], q: [..., 4] normalized."""
    R = quat_to_rotmat(q)
    return R * s[..., None, :]


def covariance_from_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Full 3x3 covariance Sigma = L L^T with L = R S
    (reference scene/gaussian_model.py:33-41)."""
    L = build_scaling_rotation(s, q)
    return L @ jnp.swapaxes(L, -1, -2)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """3x3 symmetric -> upper-triangular 6-vector (xx, xy, xz, yy, yz, zz)."""
    return jnp.stack([
        cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
        cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2],
    ], axis=-1)
