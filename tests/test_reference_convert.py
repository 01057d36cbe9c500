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

pytestmark = pytest.mark.smoke  # fast contract tier: pytest -m smoke < 5 min


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


# ---------------------------------------------------------------------------
# Full-frame parity proxy (VERDICT r2 item 5): a torch-CPU reimplementation
# of the reference's ENTIRE render_motion compose (PMF align -> UMF ->
# personalized merge -> p_scale -> activations -> python SH -> brute-force
# splat oracle), driven through converter-mapped weights, must agree with
# our render_motion to well under 0.1 dB. This bounds the outstanding
# reference-parity claim to the CUDA rasterizer kernel alone — every other
# stage (network graphs, weight layout mapping, compose constants, SH,
# activations, compositing order) is machine-checked here.
# Ref: gaussian_renderer/__init__.py:151-298, scene/motion_net.py:176-772.
# The tri-plane hash encoder is shared via its jax implementation (its own
# bit-level parity vs the CUDA gridencoder is pinned by test_hashgrid.py).
# ---------------------------------------------------------------------------


class _TorchTriplane(tnn.Module):
    """Reference encode_x (scene/motion_net.py:242-258): xy/yz/xz split,
    per-plane hash grid. Embeddings are torch Parameters under the
    reference's names; lookup goes through ops.hashgrid (see note above)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        for ax in ("xy", "yz", "xz"):
            mod = tnn.Module()
            mod.embeddings = tnn.Parameter(
                torch.rand(cfg.total_params(), cfg.level_dim) * 2e-4 - 1e-4)
            setattr(self, f"encoder_{ax}", mod)

    def forward(self, x, bound):
        from instag_tpu.ops.hashgrid import hashgrid_encode
        xy = x[:, :-1]
        yz = x[:, 1:]
        xz = torch.cat([x[:, :1], x[:, -1:]], dim=-1)
        outs = []
        for ax, pts in (("xy", xy), ("yz", yz), ("xz", xz)):
            emb = getattr(self, f"encoder_{ax}").embeddings
            f = hashgrid_encode(self.cfg, jnp.asarray(emb.detach().numpy()),
                                jnp.asarray(pts.numpy()), bound)
            outs.append(torch.tensor(np.asarray(f)))
        return torch.cat(outs, dim=-1)


class _TorchUMF(tnn.Module):
    """Reference MotionNetwork forward (scene/motion_net.py:274-322)."""

    def __init__(self, hcfg):
        super().__init__()
        self.audio_net = TorchAudioNet()
        self.audio_att_net = TorchAudioAttNet()
        self.tri = _TorchTriplane(hcfg)
        self.exp_encode_net = TorchMLP(5, 5, 16, 2)
        self.eye_att_net = TorchMLP(36, 6, 16, 2)
        self.sigma_net = TorchMLP(36 + 32 + 6, 11, 64, 3)
        self.aud_ch_att_net = TorchMLP(36, 32, 32, 2)

    def ref_state_dict(self):
        sd = {}
        for name, p in self.named_parameters():
            sd[name.replace("tri.", "")] = p
        return sd

    def forward(self, x, a, e):
        enc_x = self.tri(x, 0.15)
        enc_a = self.audio_att_net(self.audio_net(a)[None])
        enc_a = enc_a.repeat(enc_x.shape[0], 1)
        aud_ch_att = self.aud_ch_att_net(enc_x)
        enc_w = enc_a * aud_ch_att
        eye_att = torch.relu(self.eye_att_net(enc_x))
        enc_e = self.exp_encode_net(e[:-1])
        enc_e = torch.cat([enc_e, e[-1:]], dim=-1)
        enc_e = enc_e * eye_att
        h = self.sigma_net(torch.cat([enc_x, enc_w, enc_e], dim=-1))
        return {"d_xyz": h[..., :3] * 1e-2, "d_rot": h[..., 3:7],
                "d_opa": h[..., 7:8], "d_scale": h[..., 8:11]}


class _TorchPMF(tnn.Module):
    """Reference PersonalizedMotionNetwork forward (face kind,
    scene/motion_net.py:562-735)."""

    def __init__(self, hcfg):
        super().__init__()
        self.audio_net = TorchAudioNet()
        self.audio_att_net = TorchAudioAttNet()
        self.tri = _TorchTriplane(hcfg)
        self.exp_encode_net = TorchMLP(5, 5, 16, 2)
        self.eye_att_net = TorchMLP(36, 6, 16, 2)
        self.sigma_net = TorchMLP(36 + 32 + 6, 11, 32, 3)
        self.align_net = TorchMLP(36, 6, 32, 2)
        self.aud_ch_att_net = TorchMLP(36, 32, 32, 2)

    ref_state_dict = _TorchUMF.ref_state_dict

    def forward(self, x, a, e):
        enc_x = self.tri(x, 0.15)
        enc_a = self.audio_att_net(self.audio_net(a)[None])
        enc_a = enc_a.repeat(enc_x.shape[0], 1)
        aud_ch_att = self.aud_ch_att_net(enc_x)
        enc_w = enc_a * aud_ch_att
        h = torch.cat([enc_x, enc_w], dim=-1)
        eye_att = torch.relu(self.eye_att_net(enc_x))
        enc_e = self.exp_encode_net(e[:-1])
        enc_e = torch.cat([enc_e, e[-1:]], dim=-1)
        h = torch.cat([h, enc_e * eye_att], dim=-1)
        h = self.sigma_net(h)
        p = self.align_net(enc_x)
        return {"d_xyz": h[..., :3] * 1e-2, "d_rot": h[..., 3:7],
                "d_opa": h[..., 7:8], "d_scale": h[..., 8:11],
                "p_xyz": p[..., :3] * 1e-2,
                "p_scale": torch.tanh(p[..., 3:] / 5) * 0.25 + 1}


def _torch_eval_sh1(shs, dirs):
    """Python SH (reference utils/sh_utils.py eval_sh, degree 1).
    shs: [n, 4, 3] coefficients; dirs: [n, 3] unit view dirs."""
    C0, C1 = 0.28209479177387814, 0.4886025119029199
    x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
    return (C0 * shs[:, 0] - C1 * y * shs[:, 1] + C1 * z * shs[:, 2]
            - C1 * x * shs[:, 3])


def test_full_frame_render_parity():
    """Torch reference-math frame == our render_motion frame, <0.02 mean
    abs error and >45 dB agreement (i.e. any PSNR metric computed on either
    differs by far less than 0.1 dB)."""
    from instag_tpu.models import gaussians as G
    from instag_tpu.models.motion import (MotionNetwork,
                                          PersonalizedMotionNetwork)
    from instag_tpu.io.reference_convert import (convert_motion_net,
                                                 convert_pmf)
    from instag_tpu.ops.hashgrid import triplane_configs
    from instag_tpu.ops.rasterize import RasterizeConfig
    from instag_tpu.ops.reference_splat import splat_reference
    from instag_tpu.render import Camera, render_motion
    from instag_tpu.utils.graphics import projection_matrix, world_to_view

    torch.manual_seed(7)
    rng = np.random.default_rng(7)
    n, cap = 100, 128
    H = W = 64

    hcfg = triplane_configs(16, 256 * 0.15)
    tumf = _TorchUMF(hcfg).eval()
    tpmf = _TorchPMF(hcfg).eval()
    # converter-mapped weights drive BOTH sides
    umf_params = jax.tree.map(jnp.asarray,
                              convert_motion_net(tumf.ref_state_dict(),
                                                 "deepspeech"))
    pmf_params = jax.tree.map(jnp.asarray,
                              convert_pmf(tpmf.ref_state_dict(),
                                          "deepspeech", "face"))

    # raw gaussian attributes (pre-activation, like the reference model)
    xyz = rng.uniform(-0.1, 0.1, (n, 3)).astype(np.float32)
    scaling_raw = rng.normal(-4.5, 0.3, (n, 3)).astype(np.float32)
    rot_raw = rng.normal(size=(n, 4)).astype(np.float32)
    opa_raw = rng.normal(0.5, 1.0, (n, 1)).astype(np.float32)
    f_dc = (0.4 * rng.normal(size=(n, 1, 3))).astype(np.float32)
    f_rest = (0.1 * rng.normal(size=(n, 3, 3))).astype(np.float32)
    aud = rng.normal(size=(8, 29, 16)).astype(np.float32)
    exp = rng.uniform(0, 1, 6).astype(np.float32)

    # ---- torch reference math (gaussian_renderer/__init__.py:151-298,
    # personalized=True, align=True) ----
    with torch.no_grad():
        tx = torch.tensor(xyz)
        p = tpmf(tx, torch.tensor(aud), torch.tensor(exp))
        x_al = tx + p["p_xyz"]
        m = tumf(x_al, torch.tensor(aud), torch.tensor(exp))
        d_xyz = (m["d_xyz"] + p["d_xyz"]) * p["p_scale"]
        d_scale = m["d_scale"] + p["d_scale"]
        d_rot = m["d_rot"] + p["d_rot"]
        means3d = tx + d_xyz
        scales = torch.nn.functional.softplus(
            torch.tensor(scaling_raw) + d_scale)
        rq = torch.tensor(rot_raw) + d_rot
        rots = rq / rq.norm(dim=-1, keepdim=True).clamp_min(1e-12)
        opac = torch.sigmoid(torch.tensor(opa_raw))

    R = np.eye(3)
    t = np.array([0.0, 0.0, 2.0])
    w2c = world_to_view(R, t)
    proj = projection_matrix(0.01, 100.0, 0.7, 0.7)
    view_T = jnp.asarray(w2c.T)
    full_T = jnp.asarray((proj @ w2c).T)
    campos = np.linalg.inv(w2c)[:3, 3].astype(np.float32)
    tanfov = float(np.tan(0.7 / 2))
    bg = jnp.array([0.0, 1.0, 0.0], jnp.float32)

    shs = np.concatenate([f_dc, f_rest], axis=1)         # [n, 4, 3]
    with torch.no_grad():
        dirs = means3d - torch.tensor(campos)[None]
        dirs = dirs / dirs.norm(dim=-1, keepdim=True)
        colors = _torch_eval_sh1(torch.tensor(shs), dirs) + 0.5
        colors = colors.clamp_min(0.0)

    cfg = RasterizeConfig(H, W, max_per_tile=128, tile_chunk=8,
                          approx_topk=False)
    img_ref, _, _, alp_ref = splat_reference(
        cfg, jnp.asarray(means3d.numpy()), jnp.asarray(opac.numpy()),
        jnp.asarray(scales.numpy()), jnp.asarray(rots.numpy()),
        view_T, full_T, jnp.asarray(campos), tanfov, tanfov, bg,
        colors_precomp=jnp.asarray(colors.numpy()))

    # ---- our full path on the same converted weights ----
    state = G.create_from_points(jnp.asarray(xyz), jnp.ones((n, 3)) * 0.5,
                                 cap, 1, 1.0)
    params = state.params.replace(
        xyz=jnp.pad(jnp.asarray(xyz), ((0, cap - n), (0, 0))),
        features_dc=jnp.pad(jnp.asarray(f_dc), ((0, cap - n), (0, 0), (0, 0))),
        features_rest=jnp.pad(jnp.asarray(f_rest),
                              ((0, cap - n), (0, 0), (0, 0))),
        scaling=jnp.pad(jnp.asarray(scaling_raw), ((0, cap - n), (0, 0))),
        rotation=jnp.pad(jnp.asarray(rot_raw), ((0, cap - n), (0, 0))),
        opacity=jnp.pad(jnp.asarray(opa_raw), ((0, cap - n), (0, 0))))
    state = state.replace(params=params,
                          active_sh_degree=jnp.int32(1))

    umf_net = MotionNetwork("deepspeech", onehot=False)
    pmf_net = PersonalizedMotionNetwork("face", "deepspeech", onehot=False)
    cam = Camera(view_T, full_T, jnp.asarray(campos),
                 jnp.float32(tanfov), jnp.float32(tanfov))
    mr = render_motion(
        cfg, cam, state,
        umf=lambda x, a, e: umf_net.apply(umf_params, x, a, e),
        aud=jnp.asarray(aud), exp=jnp.asarray(exp), bg=bg,
        pmf=lambda x, a, e: pmf_net.apply(pmf_params, x, a, e),
        personalized=True, align=True)

    ours = np.asarray(mr.out.image)
    ref = np.asarray(img_ref)
    mae = np.abs(ours - ref).mean()
    mse = ((ours - ref) ** 2).mean()
    agreement_db = -10 * np.log10(max(mse, 1e-12))
    print(f"full-frame parity: mae={mae:.5f} agreement={agreement_db:.1f} dB")
    assert agreement_db > 45.0, (mae, agreement_db)
    np.testing.assert_allclose(np.asarray(mr.out.alpha), np.asarray(alp_ref),
                               atol=5e-3)


class _TorchWav2LipConv(tnn.Module):
    """wav2lip Conv2d wrapper (reference scene/motion_net.py:8-25)."""

    def __init__(self, cin, cout, k, s, p, residual=False):
        super().__init__()
        self.conv_block = tnn.Sequential(
            tnn.Conv2d(cin, cout, k, s, p), tnn.BatchNorm2d(cout))
        self.residual = residual

    def forward(self, x):
        out = self.conv_block(x)
        if self.residual:
            out = out + x
        return torch.relu(out)


def test_ave_encoder_converter_matches_torch():
    """convert_ave_encoder: SyncTalk AudioEncoder (13 Conv+BN blocks,
    scene/motion_net.py:100-127) with random weights -> our flax
    AudioEncoder through the converted npz must match the torch forward."""
    import tempfile

    from instag_tpu.io.reference_convert import convert_ave_encoder
    from instag_tpu.models.nets import AudioEncoder

    specs = [(1, 32, 1, (1, 1), False), (32, 32, 1, (1, 1), True),
             (32, 32, 1, (1, 1), True), (32, 64, 1, (3, 1), False),
             (64, 64, 1, (1, 1), True), (64, 64, 1, (1, 1), True),
             (64, 128, 1, (3, 3), False), (128, 128, 1, (1, 1), True),
             (128, 128, 1, (1, 1), True), (128, 256, 1, (3, 2), False),
             (256, 256, 1, (1, 1), True), (256, 512, 0, (1, 1), False),
             (512, 512, 0, (1, 1), False)]
    torch.manual_seed(5)
    blocks = []
    for i, (ci, co, p, s, res) in enumerate(specs):
        k = 1 if i == 12 else 3
        b = _TorchWav2LipConv(ci, co, k, s, p, res)
        # randomize BN stats so the conversion is actually exercised
        b.conv_block[1].running_mean.normal_(0, 0.1)
        b.conv_block[1].running_var.uniform_(0.5, 1.5)
        blocks.append(b)
    tenc = tnn.Sequential(*blocks).eval()
    sd = {f"audio_encoder.{k}": v for k, v in tenc.state_dict().items()}

    mel = torch.randn(2, 1, 80, 16)
    with torch.no_grad():
        want = tenc(mel).squeeze(-1).squeeze(-1).numpy()

    with tempfile.TemporaryDirectory() as d:
        path = convert_ave_encoder(sd, f"{d}/ave.npz")
        data = np.load(path)
        import flax
        enc = AudioEncoder()
        x = jnp.asarray(mel.numpy()).transpose(0, 2, 3, 1)  # NCHW -> NHWC
        variables = enc.init(jax.random.key(0), x)
        flat = flax.traverse_util.flatten_dict(
            flax.core.unfreeze(variables), sep="/")
        hit = 0
        for k in list(flat.keys()):
            if k in data:
                flat[k] = jnp.asarray(data[k])
                hit += 1
        assert hit == len(data.files), (hit, len(data.files))
        variables = flax.traverse_util.unflatten_dict(flat, sep="/")
        got = np.asarray(enc.apply(variables, x))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
