"""Motion fields: Universal (face/mouth) and Personalized, in flax.

Architecture parity (dims, activations, and the load-bearing output scalings)
with reference scene/motion_net.py:

  * MotionNetwork (face UMF, :176-343): tri-plane hash enc (base 16, desired
    256·bound, bound=0.15) + audio code gated per-Gaussian by a channel
    attention MLP + AU expression code gated by an eye attention MLP →
    sigma_net MLP(…, 11, 64, 3) → d_xyz·1e-2, d_rot, d_opa, d_scale.
  * MouthMotionNetwork (:348-492): denser tri-plane (base 64, desired
    384·bound); inputs add a 3-dim `move` feature; sigma MLP(…, 7, 32, 3)
    (d_xyz, d_rot only), d_xyz x/z divided by 5, scaled by
    sigmoid(scaler_net)·2.
  * PersonalizedMotionNetwork (:562-772): per-identity residual field; face
    variant has expression gating and 11-dim output, mouth variant 7-dim,
    hidden 32/16; extra align_net → p_xyz = ·1e-2, p_scale = tanh(/5)·0.25+1.

Audio-extractor input dims: esperanto 44 / deepspeech 29 / hubert 1024 /
ave 32 (:184-193).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .encoders import TriplaneEncoder
from .nets import MLP, AudioAttNet, AudioNet, AudioNetAVE

AUDIO_IN_DIM = {"esperanto": 44, "deepspeech": 29, "hubert": 1024, "ave": 32}


def _safe_norm(x, eps=1e-12):
    """L2 norm with a finite gradient at zero (post-ReLU vectors can be
    exactly zero; plain norm has a NaN gradient there)."""
    return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def audio_in_dim(extractor: str) -> int:
    for key, dim in AUDIO_IN_DIM.items():
        if key in extractor:
            return dim
    raise NotImplementedError(f"unknown audio extractor: {extractor}")


class AudioFeature(nn.Module):
    """audio_net -> audio_att_net pipeline shared by all motion fields
    (reference encode_audio, scene/motion_net.py:262-272)."""
    audio_extractor: str = "deepspeech"
    audio_dim: int = 32

    def setup(self):
        in_dim = audio_in_dim(self.audio_extractor)
        if self.audio_extractor == "ave":
            self.audio_net = AudioNetAVE(self.audio_dim)
        else:
            self.audio_net = AudioNet(in_dim, self.audio_dim)
        self.audio_att_net = AudioAttNet(self.audio_dim)

    def __call__(self, a):
        # a: [8, dim, 16] (deepspeech-like window) or [8, 1, 512] (ave)
        enc = self.audio_net(a)                 # [8, audio_dim]
        return self.audio_att_net(enc[None])    # [1, audio_dim]


class MotionNetwork(nn.Module):
    """Face-branch Universal Motion Field."""
    audio_extractor: str = "deepspeech"
    audio_dim: int = 32
    bound: float = 0.15
    onehot: bool = True  # one-hot table lookup (training); False for inference

    def setup(self):
        self.audio = AudioFeature(self.audio_extractor, self.audio_dim)
        self.encoder = TriplaneEncoder(base_resolution=16,
                                       desired_resolution=256 * self.bound,
                                       onehot=self.onehot)
        in_dim = self.encoder.output_dim  # 36
        self.eye_dim = 6
        self.exp_encode_net = MLP(self.eye_dim - 1, 16, 2)
        self.eye_att_net = MLP(self.eye_dim, 16, 2)
        self.sigma_net = MLP(11, 64, 3)
        self.aud_ch_att_net = MLP(self.audio_dim, 32, 2)
        self._in_dim = in_dim

    def __call__(self, x, a, e):
        """x: [N,3] canonical positions; a: audio window; e: [6] AU vector.

        Returns dict(d_xyz, d_rot, d_opa, d_scale, ambient_aud, ambient_eye)
        (reference scene/motion_net.py:274-322)."""
        enc_x = self.encoder(x, self.bound)                   # [N, 36]
        enc_a = self.audio(a)                                 # [1, A]
        aud_ch_att = self.aud_ch_att_net(enc_x)               # [N, A]
        enc_w = enc_a * aud_ch_att                            # broadcast over N

        eye_att = nn.relu(self.eye_att_net(enc_x))            # [N, 6]
        enc_e = self.exp_encode_net(e[:-1])                   # [5]
        enc_e = jnp.concatenate([enc_e, e[-1:]], axis=-1)     # [6]
        enc_e = enc_e[None, :] * eye_att                      # [N, 6]

        h = jnp.concatenate([enc_x, enc_w, enc_e], axis=-1)
        h = self.sigma_net(h)
        return {
            "d_xyz": h[..., :3] * 1e-2,
            "d_rot": h[..., 3:7],
            "d_opa": h[..., 7:8],
            "d_scale": h[..., 8:11],
            "ambient_aud": _safe_norm(aud_ch_att),
            "ambient_eye": _safe_norm(eye_att),
        }


class MouthMotionNetwork(nn.Module):
    """Mouth-branch Universal Motion Field."""
    audio_extractor: str = "deepspeech"
    audio_dim: int = 32
    bound: float = 0.15
    onehot: bool = True

    def setup(self):
        self.audio = AudioFeature(self.audio_extractor, self.audio_dim)
        self.encoder = TriplaneEncoder(base_resolution=64,
                                       desired_resolution=384 * self.bound,
                                       onehot=self.onehot)
        self.sigma_net = MLP(7, 32, 3)
        self.scaler_net = MLP(1, 16, 3)
        self.aud_ch_att_net = MLP(self.audio_dim, 32, 2)

    def __call__(self, x, a, move):
        """x: [N,3]; a: audio window; move: [1,3] face-motion range feature
        (computed by the renderer, gaussian_renderer/__init__.py:366-374).

        Returns dict(d_xyz, d_rot) with d_xyz x/z damped 5x and modulated by
        the sigmoid scaler (scene/motion_net.py:438-472)."""
        enc_x = self.encoder(x, self.bound)
        enc_a = self.audio(a)
        enc_w = jnp.broadcast_to(enc_a, (enc_x.shape[0], enc_a.shape[-1]))
        mv = jnp.broadcast_to(move, (enc_x.shape[0], move.shape[-1]))

        h = self.sigma_net(jnp.concatenate([enc_x, enc_w, mv], axis=-1))
        tau = self.scaler_net(jnp.concatenate([enc_x, mv], axis=-1))

        d_xyz = h[..., :3] * 1e-2
        d_xyz = d_xyz * jnp.array([0.2, 1.0, 0.2], d_xyz.dtype)  # x,z ÷ 5
        d_rot = h[..., 3:]
        return {
            "d_xyz": d_xyz * nn.sigmoid(tau) * 2.0,
            "d_rot": d_rot,
        }


class PersonalizedMotionNetwork(nn.Module):
    """Per-identity residual motion field (PMF), living alongside each
    Gaussian cloud."""
    kind: str = "face"  # "face" | "mouth"
    audio_extractor: str = "deepspeech"
    audio_dim: int = 32
    bound: float = 0.15
    onehot: bool = True

    def setup(self):
        self.exp_eye = self.kind == "face"
        self.audio = AudioFeature(self.audio_extractor, self.audio_dim)
        self.encoder = TriplaneEncoder(base_resolution=16,
                                       desired_resolution=256 * self.bound,
                                       onehot=self.onehot)
        hidden = 32 if self.kind == "face" else 16
        out_dim = 11 if self.kind == "face" else 7
        self.eye_dim = 6
        if self.exp_eye:
            self.exp_encode_net = MLP(self.eye_dim - 1, 16, 2)
            self.eye_att_net = MLP(self.eye_dim, 16, 2)
        self.sigma_net = MLP(out_dim, hidden, 3)
        self.align_net = MLP(6, hidden, 2)
        self.aud_ch_att_net = MLP(self.audio_dim, 32, 2)

    def __call__(self, x, a, e=None):
        enc_x = self.encoder(x, self.bound)
        enc_a = self.audio(a)
        aud_ch_att = self.aud_ch_att_net(enc_x)
        enc_w = enc_a * aud_ch_att
        h = jnp.concatenate([enc_x, enc_w], axis=-1)

        ambient_eye = None
        if self.exp_eye:
            eye_att = nn.relu(self.eye_att_net(enc_x))
            enc_e = self.exp_encode_net(e[:-1])
            enc_e = jnp.concatenate([enc_e, e[-1:]], axis=-1)
            enc_e = enc_e[None, :] * eye_att
            h = jnp.concatenate([h, enc_e], axis=-1)
            ambient_eye = _safe_norm(eye_att)

        h = self.sigma_net(h)
        d_xyz = h[..., :3] * 1e-2
        d_rot = h[..., 3:7]
        d_opa = h[..., 7:8] if self.kind == "face" else None
        d_scale = h[..., 8:11] if self.kind == "face" else None

        p = self.align_net(enc_x)
        return {
            "d_xyz": d_xyz,
            "d_rot": d_rot,
            "d_opa": d_opa,
            "d_scale": d_scale,
            "ambient_aud": _safe_norm(aud_ch_att),
            "ambient_eye": ambient_eye,
            "p_xyz": p[..., :3] * 1e-2,
            "p_scale": jnp.tanh(p[..., 3:] / 5.0) * 0.25 + 1.0,
        }
