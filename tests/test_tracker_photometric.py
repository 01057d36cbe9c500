"""Photometric 3DMM tracker: mesh renderer, staged fit, full round trip
(reference face_tracking/face_tracker.py:159-350, render_3dmm.py:32-202).

Ground truth comes from the same morphable model + renderer (synthetic BFM
stand-in — the real basis cannot ship), so the fit is checked end-to-end:
non-zero exp/light recovered, landmark error at or below the PnP stage.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from instag_tpu.data_utils.face_model import (geometry, landmarks3d,
                                              sh_shading, synthetic_model,
                                              texture, vertex_normals)
from instag_tpu.data_utils.mesh_render import MeshRenderConfig, render_mesh
from instag_tpu.data_utils.photometric import (euler2rot_jax, project,
                                               transform_points)

H = W = 64
FOCAL = 150.0
CX = CY = 32.0


def _gt_sequence(model, n_frames=8, seed=0):
    rng = np.random.default_rng(seed)
    gt = dict(
        id=0.6 * rng.normal(size=(model.n_id,)).astype(np.float32),
        exp=0.5 * rng.normal(size=(n_frames, model.n_exp)).astype(np.float32),
        tex=0.5 * rng.normal(size=(model.n_tex,)).astype(np.float32),
        euler=np.stack([
            0.08 * np.sin(np.linspace(0, 3, n_frames)),
            0.12 * np.cos(np.linspace(0, 2, n_frames)),
            0.04 * np.sin(np.linspace(1, 4, n_frames))], -1).astype(np.float32),
        trans=np.stack([
            0.01 * np.sin(np.linspace(0, 2, n_frames)),
            0.01 * np.cos(np.linspace(0, 2, n_frames)),
            0.85 + 0.02 * np.sin(np.linspace(0, 1, n_frames))], -1
        ).astype(np.float32))
    light = np.zeros((27,), np.float32)
    light[0:3] = [1.6, 1.5, 1.4]        # ambient
    light[3:6] = 0.35                    # one directional band
    gt["light"] = np.tile(light[None], (n_frames, 1))
    return gt


def _render_frames(model, gt):
    cfg = MeshRenderConfig(H, W)
    tris = jnp.asarray(model.tris)

    def one(exp, euler, trans, light):
        geo = geometry(model, jnp.asarray(gt["id"]), exp)
        vc = transform_points(geo, euler, trans)
        nrm = vertex_normals(vc, tris)
        shade = jnp.maximum(sh_shading(nrm, light), 0.0)
        cols = jnp.clip(texture(model, jnp.asarray(gt["tex"])) * shade, 0, 1)
        return render_mesh(cfg, vc, tris, cols, FOCAL, CX, CY)

    frames = jax.lax.map(
        lambda a: one(*a),
        (jnp.asarray(gt["exp"]), jnp.asarray(gt["euler"]),
         jnp.asarray(gt["trans"]), jnp.asarray(gt["light"])))
    l3 = landmarks3d(model, jnp.asarray(gt["id"])[None].repeat(
        gt["exp"].shape[0], 0), jnp.asarray(gt["exp"]))
    lms = project(transform_points(l3, jnp.asarray(gt["euler"]),
                                   jnp.asarray(gt["trans"])), FOCAL, CX, CY)
    return np.asarray(frames), np.asarray(lms)


def test_mesh_renderer_coverage_and_grads():
    model = synthetic_model()
    gt = _gt_sequence(model, n_frames=1)
    frames, lms = _render_frames(model, gt)
    rgba = frames[0]
    assert rgba.shape == (H, W, 4)
    # the head covers a central blob, background stays empty
    assert rgba[..., 3].mean() > 0.05
    assert rgba[..., 3].max() == 1.0
    assert rgba[H - 1, 0, 3] == 0.0
    assert (rgba[..., :3] >= 0).all() and (rgba[..., :3] <= 1.0 + 1e-6).all()

    cfg = MeshRenderConfig(H, W)
    tris = jnp.asarray(model.tris)

    def loss(dxyz, dcol):
        geo = geometry(model, jnp.asarray(gt["id"]),
                       jnp.asarray(gt["exp"][0])) + dxyz
        vc = transform_points(geo, jnp.asarray(gt["euler"][0]),
                              jnp.asarray(gt["trans"][0]))
        cols = jnp.clip(texture(model, jnp.asarray(gt["tex"])) + dcol, 0, 1)
        rgba = render_mesh(cfg, vc, tris, cols, FOCAL, CX, CY)
        return jnp.mean(rgba[..., :3] ** 2)

    V = model.mean_shape.shape[0]
    gx, gc = jax.jit(jax.grad(loss, argnums=(0, 1)))(
        jnp.zeros((V, 3)), jnp.zeros((V, 3)))
    assert np.isfinite(np.asarray(gx)).all()
    assert float(jnp.abs(gc).sum()) > 0
    assert float(jnp.abs(gx).sum()) > 0  # position grads via barycentrics


@pytest.mark.e2e
def test_photometric_fit_recovers_sequence(tmp_path):
    from instag_tpu.data_utils.photometric import fit_photometric
    model = synthetic_model()
    gt = _gt_sequence(model, n_frames=8)
    frames, lms = _render_frames(model, gt)

    # deliberately rough init: zero rotation, head roughly centered
    T = lms.shape[0]
    fit = fit_photometric(
        model, lms, frames[..., :3], FOCAL, CX, CY,
        euler_init=np.zeros((T, 3), np.float32),
        trans_init=np.tile(np.array([0, 0, 0.9], np.float32), (T, 1)),
        iters=(200, 250, 40, 30))

    assert fit["lan_err_px"] < 1.0, f"landmark err {fit['lan_err_px']:.2f}px"
    assert np.abs(fit["exp"]).max() > 1e-3        # non-zero expressions
    assert np.abs(fit["light"]).max() > 1e-3      # non-zero lighting
    # photometric error vs GT frames is small on covered pixels
    re = _render_frames(model, dict(
        id=fit["id"], exp=fit["exp"], tex=fit["tex"], euler=fit["euler"],
        trans=fit["trans"], light=fit["light"]))[0]
    mask = (re[..., 3] > 0) & (frames[..., 3] > 0)
    err = np.abs(re[..., :3] - frames[..., :3])[mask].mean()
    assert err < 0.08, f"photometric err {err:.3f}"


@pytest.mark.e2e
def test_track_poses_photometric_roundtrip(tmp_path):
    """Full tracker with a morphable model: writes non-zero id/exp/light and
    the saved pose round-trips through the OpenGL flip to a landmark error
    at least as good as the PnP-only stage (VERDICT r1 item 3 done-bar)."""
    import cv2
    from instag_tpu.data_utils.tracker import rot2euler, track_poses

    model = synthetic_model()
    gt = _gt_sequence(model, n_frames=8)
    frames, lms = _render_frames(model, gt)

    base = str(tmp_path)
    ori = os.path.join(base, "ori_imgs")
    os.makedirs(ori)
    for i in range(lms.shape[0]):
        img = (np.clip(frames[i, ..., :3], 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(ori, f"{i}.jpg"), img[:, :, ::-1])
        np.savetxt(os.path.join(ori, f"{i}.lms"), lms[i], "%f")

    def saved_lan_err(path):
        d = np.load(path)
        F = np.diag([1.0, -1.0, -1.0])
        Rs = F @ np.asarray(euler2rot_jax(jnp.asarray(d["euler"])))
        ts = (d["trans"] / 10.0) @ F.T
        idp = jnp.asarray(d["id"][:model.n_id])
        expp = jnp.asarray(d["exp"][:, :model.n_exp])
        l3 = landmarks3d(model, idp[None].repeat(lms.shape[0], 0), expp)
        cam = jnp.einsum("tij,tnj->tni", jnp.asarray(Rs), l3) \
            + jnp.asarray(ts)[:, None, :]
        proj = project(cam, float(d["focal"][0]), CX, CY)
        return float(jnp.mean(jnp.linalg.norm(proj - lms, axis=-1))), d

    # PnP-only baseline
    track_poses(base, ori, focal_candidates=[FOCAL], smooth=1)
    err_pnp, d_pnp = saved_lan_err(os.path.join(base, "track_params.npz"))
    assert np.abs(d_pnp["exp"]).max() == 0.0

    # photometric
    track_poses(base, ori, focal_candidates=[FOCAL], smooth=1, model=model,
                photometric_iters=(200, 250, 40, 30), downscale=1)
    err_p, d = saved_lan_err(os.path.join(base, "track_params.npz"))
    assert d["exp"].shape == (8, 79) and d["light"].shape == (8, 27)
    assert d["id"].shape == (100,)
    assert np.abs(d["exp"]).max() > 1e-3
    assert np.abs(d["light"]).max() > 1e-3
    assert err_p <= err_pnp + 1e-3, (err_p, err_pnp)
    assert err_p < 2.0, f"photometric landmark err {err_p:.2f}px"


def test_convert_bfm_info_real_layout(tmp_path):
    """The converter must consume the REAL reference model-dir layout
    (3DMM_info.npy [K,3V] bases + sig_* + keys_info/topology_info files,
    convert_BFM.py:18-44) and fold facemodel.py:15-40's /1e5, mu_exp,
    mean-centering and sig scaling so geometry() == the reference math."""
    import numpy as np
    from instag_tpu.data_utils.face_model import (convert_bfm_info, geometry,
                                                  load_model, texture)

    rng = np.random.default_rng(3)
    V, K_ID, K_EXP, K_TEX = 50, 6, 5, 4
    info = dict(
        mu_shape=rng.normal(0, 1e4, 3 * V),
        b_shape=rng.normal(0, 1.0, (K_ID + 2, 3 * V)),   # extra modes cut
        sig_shape=rng.uniform(0.5, 2.0, K_ID + 2),
        mu_exp=rng.normal(0, 1e3, 3 * V),
        b_exp=rng.normal(0, 1.0, (K_EXP + 1, 3 * V)),
        sig_exp=rng.uniform(0.5, 2.0, K_EXP + 1),
        mu_tex=rng.uniform(0, 255, 3 * V),
        b_tex=rng.normal(0, 1.0, (K_TEX, 3 * V)),
        sig_tex=rng.uniform(0.5, 2.0, K_TEX),
    )
    keys = dict(keyinds=rng.integers(0, V, 68),
                rigid_ids=rng.integers(0, V, 20),
                left_contour=rng.integers(0, V, (8, 4)),
                right_contour=rng.integers(0, V, (8, 4)))
    topo = dict(tris=rng.integers(0, V, (70, 3)), vert_tris=np.zeros(1))
    d = tmp_path / "3DMM"
    d.mkdir()
    np.save(d / "3DMM_info.npy", info)
    np.save(d / "keys_info.npy", keys)
    np.save(d / "topology_info.npy", topo)

    out = convert_bfm_info(str(d), str(tmp_path / "bfm.npz"),
                           n_id=K_ID, n_exp=K_EXP, n_tex=K_TEX)
    model = load_model(out)
    assert model.id_basis.shape == (V, 3, K_ID)
    assert model.exp_basis.shape == (V, 3, K_EXP)
    assert model.tris.shape == (70, 3)
    assert model.landmark_idx.shape == (68,)

    # reference math (facemodel.py:15-40 + forward geometry):
    #   geo = (id*sig_id) @ (b_shape[:K]/1e5) + (exp*sig_exp) @ (b_exp/1e5)
    #         + centered(mu_shape + mu_exp)/1e5
    idp = rng.normal(0, 1.0, K_ID)
    expp = rng.normal(0, 1.0, K_EXP)
    mu = (info["mu_shape"] + info["mu_exp"]).reshape(V, 3)
    mu = mu - mu.mean(0, keepdims=True)
    ref = (mu / 1e5
           + ((idp * info["sig_shape"][:K_ID])
              @ info["b_shape"][:K_ID] / 1e5).reshape(V, 3)
           + ((expp * info["sig_exp"][:K_EXP])
              @ info["b_exp"][:K_EXP] / 1e5).reshape(V, 3))
    ours = np.asarray(geometry(model, idp.astype(np.float32),
                               expp.astype(np.float32)))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-7)

    # texture: (mu_tex + (tex*sig_tex) @ b_tex) / 255 clipped to [0,1]
    texp = rng.normal(0, 0.1, K_TEX)
    ref_t = np.clip((info["mu_tex"]
                     + (texp * info["sig_tex"]) @ info["b_tex"]
                     ).reshape(V, 3) / 255.0, 0, 1)
    ours_t = np.asarray(texture(model, texp.astype(np.float32)))
    np.testing.assert_allclose(ours_t, ref_t, rtol=2e-4, atol=2e-5)
