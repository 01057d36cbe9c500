"""Frequency (positional) encoding — parity with the reference's
freqencoder/FreqEncoder (encoding.py:5-56): output = [x, sin(2^0 x),
cos(2^0 x), ..., sin(2^(D-1) x), cos(2^(D-1) x)] per input dim."""

from __future__ import annotations

import jax.numpy as jnp


def freq_encode(x: jnp.ndarray, degree: int = 6,
                include_input: bool = True) -> jnp.ndarray:
    """[..., D] -> [..., D * (include + 2*degree)]."""
    outs = [x] if include_input else []
    for i in range(degree):
        outs.append(jnp.sin((2.0 ** i) * x))
        outs.append(jnp.cos((2.0 ** i) * x))
    return jnp.concatenate(outs, axis=-1)


def freq_output_dim(input_dim: int, degree: int = 6,
                    include_input: bool = True) -> int:
    return input_dim * ((1 if include_input else 0) + 2 * degree)
