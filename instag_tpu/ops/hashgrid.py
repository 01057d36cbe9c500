"""Multiresolution hash-grid encoding (Instant-NGP / torch-ngp lineage), JAX.

Bit-exact semantic parity with the reference CUDA extension
(gridencoder/src/gridencoder.cu:88-246 `kernel_grid`, gridencoder/grid.py:96-161):

  * per level ``l``: scale = H * s**l - 1, resolution = ceil(scale) + 1
  * coordinates in [0, 1] map to ``pos = x * scale + 0.5`` (align_corners=False)
  * D-linear interpolation over the 2**D cell corners
  * corner index: dense (row-major with stride ``resolution+1``) when the dense
    table fits into the level's slot, else spatial hash
    ``xor_d(coord_d * prime_d) % hashmap_size`` with the torch-ngp primes
  * per-level table sizes rounded up to a multiple of 8 and packed into one
    flat parameter array via an offsets table (gridencoder/grid.py:118-131)
  * out-of-bounds inputs produce zeros (gridencoder.cu:112-135)

Rather than a CUDA scatter/gather pair, this is expressed as pure-JAX gathers;
XLA autodiff yields the scatter-add embedding backward and the analytic input
gradient (the reference's dy_dx path) for free, and the whole encode fuses
into the surrounding motion-MLP computation under jit. All per-level shapes,
resolutions, and hash/dense decisions are static, so nothing blocks TPU tiling.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# torch-ngp coherent hashing primes (gridencoder.cu:54)
_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    per_level_scale: float = 2.0
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    desired_resolution: float | None = None
    gridtype: str = "hash"  # "hash" | "tiled"
    align_corners: bool = False
    interpolation: str = "linear"  # "linear" | "smoothstep"
    # Levels whose table fits under this threshold use the one-hot matmul
    # formulation instead of gather: E[n,t] = Σ_corners w·(t==idx) contracted
    # with the table on the MXU. TPU lowers small-table gathers (and the
    # scatter-add backward) poorly — the matmul form is ~7-10x faster for
    # the motion-field tri-planes and bit-identical (same indices/weights).
    onehot_threshold: int = 8192

    def __post_init__(self):
        if self.desired_resolution is not None:
            s = np.exp2(np.log2(self.desired_resolution / self.base_resolution)
                        / (self.num_levels - 1))
            object.__setattr__(self, "per_level_scale", float(s))
            object.__setattr__(self, "desired_resolution", None)

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    def level_offsets(self) -> tuple[np.ndarray, int]:
        """Offsets table (len L+1) into the flat embedding array.

        Mirrors gridencoder/grid.py:118-131: per-level param count is
        min(2**log2_hashmap_size, (res + 1)**D) rounded up to /8.
        """
        offsets = [0]
        offset = 0
        max_params = 2 ** self.log2_hashmap_size
        for i in range(self.num_levels):
            resolution = int(np.ceil(self.base_resolution * self.per_level_scale ** i))
            side = resolution if self.align_corners else resolution + 1
            params = min(max_params, side ** self.input_dim)
            params = int(np.ceil(params / 8) * 8)
            offset += params
            offsets.append(offset)
        return np.asarray(offsets, dtype=np.int64), offset

    def total_params(self) -> int:
        return self.level_offsets()[1]


def init_hashgrid(key: jax.Array, cfg: HashGridConfig,
                  dtype=jnp.float32) -> jnp.ndarray:
    """Uniform(-1e-4, 1e-4) init (gridencoder/grid.py:138-140)."""
    n = cfg.total_params()
    return jax.random.uniform(key, (n, cfg.level_dim), dtype,
                              minval=-1e-4, maxval=1e-4)


def _level_static(cfg: HashGridConfig, level: int):
    """Static per-level constants: (scale, resolution, hashmap_size, use_hash)."""
    offsets, _ = cfg.level_offsets()
    scale = float(np.exp2(level * np.log2(cfg.per_level_scale)) * cfg.base_resolution - 1.0)
    resolution = int(np.ceil(scale)) + 1
    hashmap_size = int(offsets[level + 1] - offsets[level])
    # gridencoder.cu:67-84: dense indexing while stride <= hashmap_size;
    # fall back to the spatial hash iff the running stride overflows.
    stride = 1
    side = resolution if cfg.align_corners else resolution + 1
    for _ in range(cfg.input_dim):
        if stride > hashmap_size:
            break
        stride *= side
    use_hash = cfg.gridtype == "hash" and stride > hashmap_size
    return scale, resolution, hashmap_size, use_hash, int(offsets[level])


def hashgrid_encode(cfg: HashGridConfig, embeddings: jnp.ndarray,
                    x: jnp.ndarray, bound: float = 1.0) -> jnp.ndarray:
    """Encode points.

    Args:
      cfg: static config.
      embeddings: [total_params, level_dim] flat table.
      x: [N, input_dim] in [-bound, bound] (gridencoder/grid.py:145-149).

    Returns:
      [N, num_levels * level_dim].
    """
    D = cfg.input_dim
    x01 = (x + bound) / (2.0 * bound)
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1, keepdims=True)

    outs = []
    for level in range(cfg.num_levels):
        scale, resolution, hsize, use_hash, off = _level_static(cfg, level)
        table = jax.lax.dynamic_slice_in_dim(embeddings, off, hsize, axis=0)

        shift = 0.0 if cfg.align_corners else 0.5
        pos = x01 * scale + shift                      # [N, D]
        pos_grid = jnp.floor(pos)
        frac = pos - pos_grid
        if cfg.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)
        pos_grid = pos_grid.astype(jnp.uint32)

        side = resolution if cfg.align_corners else resolution + 1
        # Dense 2-D levels (every live tri-plane level): axis-factorized
        # bilinear — two [N, side] per-axis weight rows contracted with the
        # [side, side, C] table on the MXU. O(N·side) work instead of the
        # O(N·side^2) one-hot, no gather/scatter anywhere; indices and
        # weights identical to the corner loop below.
        if not use_hash and D == 2 and side * side <= hsize + 8:
            x0 = pos_grid[:, 0].astype(jnp.int32)
            y0 = pos_grid[:, 1].astype(jnp.int32)
            iota = jnp.arange(side, dtype=jnp.int32)[None, :]
            fx, fy = frac[:, 0:1], frac[:, 1:2]
            Rx = ((iota == x0[:, None]) * (1.0 - fx)
                  + (iota == x0[:, None] + 1) * fx)          # [N, side]
            Ry = ((iota == y0[:, None]) * (1.0 - fy)
                  + (iota == y0[:, None] + 1) * fy)
            T2 = table[:side * side].reshape(side, side * cfg.level_dim)
            M = (Ry @ T2).reshape(x.shape[0], side, cfg.level_dim)
            outs.append(jnp.einsum("ns,nsc->nc", Rx, M))
            continue
        use_onehot = hsize <= cfg.onehot_threshold
        if use_onehot:
            iota = jnp.arange(hsize, dtype=jnp.int32)[None, :]
            E = jnp.zeros((x.shape[0], hsize), x.dtype)
        else:
            acc = jnp.zeros((x.shape[0], cfg.level_dim), embeddings.dtype)
        for corner in range(1 << D):
            w = jnp.ones((x.shape[0],), x.dtype)
            coord = []
            for d in range(D):
                if (corner >> d) & 1:
                    w = w * frac[:, d]
                    coord.append(pos_grid[:, d] + jnp.uint32(1))
                else:
                    w = w * (1.0 - frac[:, d])
                    coord.append(pos_grid[:, d])
            if use_hash:
                idx = jnp.zeros_like(coord[0])
                for d in range(D):
                    idx = idx ^ (coord[d] * jnp.uint32(_PRIMES[d] & 0xFFFFFFFF))
            else:
                idx = coord[0]
                stride = side
                for d in range(1, D):
                    idx = idx + coord[d] * jnp.uint32(stride)
                    stride *= side
            idx = (idx % jnp.uint32(hsize)).astype(jnp.int32)
            if use_onehot:
                E = E + w[:, None] * (iota == idx[:, None])
            else:
                acc = acc + w[:, None] * table[idx]
        outs.append(E @ table if use_onehot else acc)

    out = jnp.concatenate(outs, axis=-1)  # [N, L*C]
    return jnp.where(oob, 0.0, out)


@partial(jax.jit, static_argnums=0)
def hashgrid_encode_jit(cfg: HashGridConfig, embeddings, x, bound=1.0):
    return hashgrid_encode(cfg, embeddings, x, bound)


def triplane_configs(base_resolution: int, desired_resolution: float,
                     num_levels: int = 12, level_dim: int = 1,
                     log2_hashmap_size: int = 17) -> HashGridConfig:
    """The motion-field tri-plane config (scene/motion_net.py:212-218):
    three 2-D hash grids over xy/yz/xz splits."""
    import os
    thresh = int(os.environ.get("INSTAG_ONEHOT_THRESHOLD", "8192"))
    return HashGridConfig(
        input_dim=2, num_levels=num_levels, level_dim=level_dim,
        base_resolution=base_resolution, log2_hashmap_size=log2_hashmap_size,
        desired_resolution=desired_resolution, onehot_threshold=thresh)


def split_xyz(x: jnp.ndarray):
    """[N,3] -> xy, yz, xz 2-D slices (scene/motion_net.py:242-246)."""
    return x[:, :2], x[:, 1:], jnp.concatenate([x[:, :1], x[:, 2:]], axis=-1)
