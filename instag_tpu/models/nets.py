"""Small neural blocks: MLP, audio feature extractors, audio attention.

Architecture parity with the reference (scene/motion_net.py:8-173):
identical layer dims, strides, activations, and the 16-step window slice.
Implemented in flax.linen; all of these are microsecond-scale MLPs/convs on
TPU and fuse into the surrounding jit.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    """Bias-free ReLU MLP (reference scene/motion_net.py:152-173)."""
    dim_out: int
    dim_hidden: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for layer in range(self.num_layers):
            out = self.dim_out if layer == self.num_layers - 1 else self.dim_hidden
            x = nn.Dense(out, use_bias=False, name=f"net_{layer}")(x)
            if layer != self.num_layers - 1:
                x = nn.relu(x)
        return x


class AudioNet(nn.Module):
    """Temporal conv encoder: [B, dim_in, 16] -> [B, dim_aud]
    (reference scene/motion_net.py:67-99). Four stride-2 Conv1d (k=3) +
    LeakyReLU(0.02), then a 64->64->dim_aud head."""
    dim_in: int = 29
    dim_aud: int = 32
    win_size: int = 16

    @nn.compact
    def __call__(self, x):
        # x: [B, C, T] (reference layout); slice the central window
        half_w = self.win_size // 2
        x = x[:, :, 8 - half_w: 8 + half_w]
        x = jnp.swapaxes(x, 1, 2)  # -> [B, T, C] (flax conv layout)
        width = 32 if self.dim_in < 128 else 128
        for i, ch in enumerate([width, width, 64, 64]):
            x = nn.Conv(ch, kernel_size=(3,), strides=(2,), padding=((1, 1),),
                        name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, 0.02)
        x = x[:, 0, :]  # T collapsed 16->8->4->2->1
        x = nn.Dense(64, name="fc_0")(x)
        x = nn.leaky_relu(x, 0.02)
        x = nn.Dense(self.dim_aud, name="fc_1")(x)
        return x


class AudioAttNet(nn.Module):
    """Temporal attention over an 8-frame window: [1, seq, dim] -> [1, dim]
    (reference scene/motion_net.py:29-63). Conv stack squeezes channels
    dim->16->8->4->2->1, then softmax over the sequence."""
    dim_aud: int = 32
    seq_len: int = 8

    @nn.compact
    def __call__(self, x):
        # x: [1, seq, dim]
        y = x  # flax convs operate on [B, T, C] directly
        for i, ch in enumerate([16, 8, 4, 2, 1]):
            y = nn.Conv(ch, kernel_size=(3,), strides=(1,), padding=((1, 1),),
                        name=f"att_conv_{i}")(y)
            y = nn.leaky_relu(y, 0.02)
        y = y.reshape(1, self.seq_len)
        y = nn.Dense(self.seq_len, name="att_fc")(y)
        y = nn.softmax(y, axis=1).reshape(1, self.seq_len, 1)
        return jnp.sum(y * x, axis=1)  # [1, dim]


class AudioNetAVE(nn.Module):
    """AVE feature head: 512 -> 256 -> 128 -> dim_aud MLP with
    LeakyReLU(0.02) (reference scene/motion_net.py:132-149).
    Input [B, 1, 512] -> [B, dim_aud]."""
    dim_aud: int = 32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(256, name="fc_0")(x)
        x = nn.leaky_relu(x, 0.02)
        x = nn.Dense(128, name="fc_1")(x)
        x = nn.leaky_relu(x, 0.02)
        x = nn.Dense(self.dim_aud, name="fc_2")(x)
        return x.reshape(x.shape[0], self.dim_aud)


class ConvBNRelu(nn.Module):
    """Conv2d + BatchNorm + (Leaky)ReLU with optional residual
    (reference scene/motion_net.py:8-25). Inference-mode batch stats."""
    cout: int
    kernel: tuple[int, int]
    stride: tuple[int, int]
    padding: int
    residual: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.Conv(self.cout, kernel_size=self.kernel, strides=self.stride,
                      padding=((self.padding, self.padding),
                               (self.padding, self.padding)), name="conv")(x)
        out = nn.BatchNorm(use_running_average=not train, name="bn")(out)
        if self.residual:
            out = out + x
        return nn.relu(out)


class AudioEncoder(nn.Module):
    """Wav2Lip-style mel encoder: [B, 80, 16, 1] -> [B, 512]
    (reference scene/motion_net.py:102-129). Used only to compute AVE
    features from wav at dataset-load time."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        specs = [
            (32, (3, 3), (1, 1), 1, False),
            (32, (3, 3), (1, 1), 1, True),
            (32, (3, 3), (1, 1), 1, True),
            (64, (3, 3), (3, 1), 1, False),
            (64, (3, 3), (1, 1), 1, True),
            (64, (3, 3), (1, 1), 1, True),
            (128, (3, 3), (3, 3), 1, False),
            (128, (3, 3), (1, 1), 1, True),
            (128, (3, 3), (1, 1), 1, True),
            (256, (3, 3), (3, 2), 1, False),
            (256, (3, 3), (1, 1), 1, True),
            (512, (3, 3), (1, 1), 0, False),
            (512, (1, 1), (1, 1), 0, False),
        ]
        for i, (c, k, s, p, res) in enumerate(specs):
            x = ConvBNRelu(c, k, s, p, res, name=f"block_{i}")(x, train)
        return x.reshape(x.shape[0], -1)
