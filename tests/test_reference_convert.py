"""Reference-checkpoint converter: cross-framework numeric fixtures.

Torch modules with the reference's architecture (standard Conv1d/Linear
stacks per SURVEY §2.1, written here from the documented spec) are given
random weights, converted through io.reference_convert, and their forwards
must match the flax modules — pinning both architecture parity and the
weight-layout mapping. A synthetic capture() tuple round-trips into a
GaussianState bundle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from instag_tpu.io.reference_convert import (audio_feature, convert_capture,
                                             mlp)
from instag_tpu.models.nets import MLP, AudioAttNet, AudioNet


class TorchAudioNet(tnn.Module):
    """scene/motion_net.py:68-99 spec: 4x Conv1d(k3,s2,p1)+LeakyReLU(.02),
    then 64->64->dim_aud with LeakyReLU between."""

    def __init__(self, dim_in=29, dim_aud=32):
        super().__init__()
        w = 32 if dim_in < 128 else 128
        self.encoder_conv = tnn.Sequential(
            tnn.Conv1d(dim_in, w, 3, 2, 1), tnn.LeakyReLU(0.02, True),
            tnn.Conv1d(w, w, 3, 2, 1), tnn.LeakyReLU(0.02, True),
            tnn.Conv1d(w, 64, 3, 2, 1), tnn.LeakyReLU(0.02, True),
            tnn.Conv1d(64, 64, 3, 2, 1), tnn.LeakyReLU(0.02, True))
        self.encoder_fc1 = tnn.Sequential(
            tnn.Linear(64, 64), tnn.LeakyReLU(0.02, True),
            tnn.Linear(64, dim_aud))

    def forward(self, x):
        return self.encoder_fc1(self.encoder_conv(x).squeeze(-1))


class TorchAudioAttNet(tnn.Module):
    """scene/motion_net.py:30-63 spec."""

    def __init__(self, dim_aud=32, seq_len=8):
        super().__init__()
        self.seq_len = seq_len
        chans = [dim_aud, 16, 8, 4, 2, 1]
        layers = []
        for i in range(5):
            layers += [tnn.Conv1d(chans[i], chans[i + 1], 3, 1, 1),
                       tnn.LeakyReLU(0.02, True)]
        self.attentionConvNet = tnn.Sequential(*layers)
        self.attentionNet = tnn.Sequential(
            tnn.Linear(seq_len, seq_len), tnn.Softmax(dim=1))

    def forward(self, x):
        y = self.attentionConvNet(x.permute(0, 2, 1))
        y = self.attentionNet(y.view(1, self.seq_len)).view(1, self.seq_len, 1)
        return torch.sum(y * x, dim=1)


class TorchMLP(tnn.Module):
    """scene/motion_net.py:152-173 spec: bias-free linear + ReLU."""

    def __init__(self, dim_in, dim_out, dim_hidden, num_layers):
        super().__init__()
        self.net = tnn.ModuleList([
            tnn.Linear(dim_in if l == 0 else dim_hidden,
                       dim_out if l == num_layers - 1 else dim_hidden,
                       bias=False) for l in range(num_layers)])

    def forward(self, x):
        for l, lin in enumerate(self.net):
            x = lin(x)
            if l != len(self.net) - 1:
                x = torch.relu(x)
        return x


class TorchAudioPipeline(tnn.Module):
    def __init__(self):
        super().__init__()
        self.audio_net = TorchAudioNet()
        self.audio_att_net = TorchAudioAttNet()

    def forward(self, a):
        enc = self.audio_net(a)
        return self.audio_att_net(enc[None])


def test_audio_pipeline_matches_torch():
    torch.manual_seed(0)
    tmod = TorchAudioPipeline().eval()
    sd = tmod.state_dict()
    params = {"params": audio_feature(sd, "", "deepspeech")}

    a = torch.randn(8, 29, 16)
    want = tmod(a).detach().numpy()

    class FlaxPipeline(__import__("flax").linen.Module):
        def setup(self):
            self.audio_net = AudioNet(29, 32)
            self.audio_att_net = AudioAttNet(32)

        def __call__(self, a):
            enc = self.audio_net(a)
            return self.audio_att_net(enc[None])

    got = np.asarray(FlaxPipeline().apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(a.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_mlp_matches_torch():
    torch.manual_seed(1)
    tmod = TorchMLP(36, 11, 64, 3).eval()
    params = {"params": mlp(tmod.state_dict(), "", 3)}
    x = torch.randn(40, 36)
    want = tmod(x).detach().numpy()
    got = np.asarray(MLP(11, 64, 3).apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_capture_tuple_roundtrip():
    """A synthetic reference capture() tuple (layout:
    scene/gaussian_model.py:115-132) converts to a loadable state dict with
    values, padding, and Adam moments preserved."""
    from instag_tpu.io.checkpoints import state_from_dict

    n, cap = 50, 64
    rng = np.random.default_rng(0)
    t = lambda *s: torch.tensor(rng.normal(size=s).astype(np.float32))
    xyz = t(n, 3)
    opt_sd = {
        "state": {0: {"exp_avg": t(n, 3), "exp_avg_sq": t(n, 3) ** 2,
                      "step": torch.tensor([7.0])}},
        "param_groups": [{"name": "xyz", "params": [0]},
                         {"name": "neural_motion_grid", "params": [1]}],
    }
    capture = (1, xyz, t(n, 1, 3), t(n, 3, 3), t(n, 1), t(n, 3), t(n, 4),
               t(n, 1), t(n), t(n), t(n), opt_sd, 1.5, None, None)
    conv = convert_capture(capture, cap, "deepspeech", "face")

    state = state_from_dict(conv["state"])
    assert state.capacity == cap
    assert int(state.num_alive()) == n
    assert state.max_sh_degree == 1
    assert float(state.spatial_lr_scale) == 1.5
    np.testing.assert_allclose(np.asarray(state.params.xyz[:n]), xyz.numpy())
    assert (np.asarray(state.params.xyz[n:]) == 0).all()
    np.testing.assert_allclose(conv["gopt"]["mu"]["xyz"][:n],
                               opt_sd["state"][0]["exp_avg"].numpy())
    assert conv["gopt"]["step"] == 7
    assert conv["pmf_params"] is None
