"""GridRenderer — the reference's vestigial NeRF head, kept for checkpoint
layout parity (scene/neural_renderer.py:49-223).

In the reference this hash-grid + SH-direction NeRF is instantiated per
GaussianModel and its params are registered in the optimizer, but it is
*never in the forward/loss path* (comments at :316,321 — a dead limb that
still affects checkpoint layout). We mirror that: the module exists, can be
initialized/saved/restored inside bundles, and is never called by trainers.

Config parity: hash grid 16 levels x 2 dims, 2^19 table, desired res
512·bound; SH direction encoding degree 4; sigma MLP and color MLP.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.hashgrid import HashGridConfig
from ..utils.sh import sh_basis
from .encoders import HashGridEncoder
from .nets import MLP


class GridRenderer(nn.Module):
    bound: float = 1.0
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64

    def setup(self):
        self.encoder = HashGridEncoder(HashGridConfig(
            input_dim=3, num_levels=16, level_dim=2, base_resolution=16,
            log2_hashmap_size=19,
            desired_resolution=512 * self.bound))
        self.sigma_net = MLP(1 + self.geo_feat_dim, self.hidden_dim,
                             self.num_layers)
        self.color_net = MLP(3, self.hidden_dim_color, self.num_layers_color)

    def density(self, x):
        h = self.encoder(x, self.bound)
        h = self.sigma_net(h)
        sigma = jnp.exp(h[..., 0])
        return sigma, h[..., 1:]

    def __call__(self, x, d):
        """x: [N,3] positions; d: [N,3] unit view dirs -> (sigma, rgb)."""
        sigma, geo = self.density(x)
        enc_d = sh_basis(3, d)  # degree-4 SH basis has 16 dims
        h = jnp.concatenate([enc_d, geo], axis=-1)
        rgb = nn.sigmoid(self.color_net(h))
        return sigma, rgb
