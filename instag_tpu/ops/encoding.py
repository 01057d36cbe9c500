"""Encoder factory — parity with reference encoding.py:44-77.

Maps the encoding name to (encode_fn, output_dim). Grid encoders return a
(config, init_fn) pair since their tables are learnable parameters; for the
flax-module form use models.encoders.HashGridEncoder / TriplaneEncoder.
"""

from __future__ import annotations

from functools import partial

from .freq import freq_encode, freq_output_dim
from .hashgrid import HashGridConfig
from ..utils.sh import sh_basis


def get_encoder(encoding: str, input_dim: int = 3, multires: int = 6,
                degree: int = 4, num_levels: int = 16, level_dim: int = 2,
                base_resolution: int = 16, log2_hashmap_size: int = 19,
                desired_resolution: float = 2048,
                align_corners: bool = False):
    """Returns (spec, output_dim). ``spec`` is a callable for the
    parameter-free encoders and a HashGridConfig for the grid encoders."""
    if encoding == "None":
        return (lambda x, **kw: x), input_dim
    if encoding == "frequency":
        return (partial(freq_encode, degree=multires),
                freq_output_dim(input_dim, multires))
    if encoding == "sphere_harmonics":
        assert degree <= 5, "SH basis implemented to degree 4 (deg param <=5)"
        return (lambda x, **kw: sh_basis(degree - 1, x)), degree ** 2
    if encoding in ("hashgrid", "tiledgrid"):
        cfg = HashGridConfig(
            input_dim=input_dim, num_levels=num_levels, level_dim=level_dim,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            desired_resolution=desired_resolution,
            gridtype="hash" if encoding == "hashgrid" else "tiled",
            align_corners=align_corners)
        return cfg, cfg.output_dim
    raise NotImplementedError(
        "Unknown encoding, choose from "
        "[None, frequency, sphere_harmonics, hashgrid, tiledgrid]")
