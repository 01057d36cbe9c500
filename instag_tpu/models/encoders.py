"""Flax wrappers around the hash-grid op: tri-plane spatial encoders.

The motion fields encode canonical xyz by splitting into xy/yz/xz planes and
running each through its own 2-D multiresolution hash grid
(reference scene/motion_net.py:212-218, 242-258).
"""

from __future__ import annotations

import dataclasses as _dc

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.hashgrid import (HashGridConfig, hashgrid_encode, split_xyz,
                            triplane_configs)


class HashGridEncoder(nn.Module):
    """One multiresolution hash grid as a flax module."""
    cfg: HashGridConfig

    @nn.compact
    def __call__(self, x, bound: float = 1.0):
        emb = self.param(
            "embeddings",
            lambda key: jax.random.uniform(
                key, (self.cfg.total_params(), self.cfg.level_dim),
                jnp.float32, minval=-1e-4, maxval=1e-4))
        return hashgrid_encode(self.cfg, emb, x, bound)

    @property
    def output_dim(self):
        return self.cfg.output_dim


class TriplaneEncoder(nn.Module):
    """xy/yz/xz tri-plane hash encoding of [N, 3] points in [-bound, bound].

    base/desired resolution follow the face (16/256·bound) or mouth
    (64/384·bound) configs (scene/motion_net.py:214-218, 387-389).
    """
    base_resolution: int = 16
    desired_resolution: float = 256 * 0.15
    num_levels: int = 12
    level_dim: int = 1
    log2_hashmap_size: int = 17
    # one-hot matmul lookup: big win when the encode is differentiated
    # (training — it removes the scatter-add backward), a loss for pure
    # forward inference (gather is cheaper). Trainers keep the default;
    # synthesis builds nets with onehot=False.
    onehot: bool = True

    def setup(self):
        cfg = triplane_configs(self.base_resolution, self.desired_resolution,
                               self.num_levels, self.level_dim,
                               self.log2_hashmap_size)
        if not self.onehot:
            cfg = _dc.replace(cfg, onehot_threshold=0)
        self.encoder_xy = HashGridEncoder(cfg)
        self.encoder_yz = HashGridEncoder(cfg)
        self.encoder_xz = HashGridEncoder(cfg)

    def __call__(self, xyz, bound: float):
        xy, yz, xz = split_xyz(xyz)
        return jnp.concatenate([
            self.encoder_xy(xy, bound),
            self.encoder_yz(yz, bound),
            self.encoder_xz(xz, bound),
        ], axis=-1)

    @property
    def output_dim(self):
        return 3 * self.num_levels * self.level_dim
