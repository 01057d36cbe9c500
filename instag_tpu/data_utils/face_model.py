"""Linear morphable face model (BFM-2009-style) for the photometric tracker.

The reference fits a BFM 2009 basis converted by
``data_utils/face_tracking/convert_BFM.py`` into ``3DMM/3DMM_info.npy``
(face_tracker.py:33-45; fields: mean shape/tex, id/exp/tex bases, 68
keypoint indices, triangle topology, sub_mesh rigid ids). This module holds
the same linear-model math in JAX/numpy:

    geometry(id, exp) = mean + B_id @ id + B_exp @ exp      [V, 3]
    texture(tex)      = mean_tex + B_tex @ tex              [V, 3] in [0, 1]

plus landmark extraction, per-vertex normals, and the SH-lighting shading
the reference's Render_3DMM applies (render_3dmm.py:32-202).

The real BFM data cannot ship here (license + zero egress), so:
  * ``load_model(path)`` reads a converted ``.npz`` with our field names
    (``convert_bfm_info`` maps the reference's 3DMM_info.npy layout onto it
    when that file is available), and
  * ``synthetic_model()`` builds a small procedural deformable head used by
    the tests and fixtures — same contract, no external data.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class MorphableModel(NamedTuple):
    mean_shape: np.ndarray     # [V, 3]
    id_basis: np.ndarray       # [V, 3, n_id]
    exp_basis: np.ndarray      # [V, 3, n_exp]
    mean_tex: np.ndarray       # [V, 3] in [0, 1]
    tex_basis: np.ndarray      # [V, 3, n_tex]
    tris: np.ndarray           # [F, 3] int32
    landmark_idx: np.ndarray   # [68] int32 vertex ids of the 68 landmarks
    rigid_idx: np.ndarray      # [R] int32 pose-stable vertex subset

    @property
    def n_id(self) -> int:
        return self.id_basis.shape[-1]

    @property
    def n_exp(self) -> int:
        return self.exp_basis.shape[-1]

    @property
    def n_tex(self) -> int:
        return self.tex_basis.shape[-1]


def geometry(model: MorphableModel, id_para, exp_para):
    """[..., n_id], [..., n_exp] -> vertices [..., V, 3]."""
    mean = jnp.asarray(model.mean_shape)
    bid = jnp.asarray(model.id_basis)
    bexp = jnp.asarray(model.exp_basis)
    return (mean + jnp.einsum("vck,...k->...vc", bid, id_para)
            + jnp.einsum("vck,...k->...vc", bexp, exp_para))


def texture(model: MorphableModel, tex_para):
    tex = (jnp.asarray(model.mean_tex)
           + jnp.einsum("vck,...k->...vc", jnp.asarray(model.tex_basis),
                        tex_para))
    return jnp.clip(tex, 0.0, 1.0)


def landmarks3d(model: MorphableModel, id_para, exp_para):
    geo = geometry(model, id_para, exp_para)
    return geo[..., jnp.asarray(model.landmark_idx), :]


def vertex_normals(verts, tris):
    """Area-weighted per-vertex normals. verts [..., V, 3], tris [F, 3]."""
    t = jnp.asarray(tris)
    p0 = verts[..., t[:, 0], :]
    p1 = verts[..., t[:, 1], :]
    p2 = verts[..., t[:, 2], :]
    fn = jnp.cross(p1 - p0, p2 - p0)          # [..., F, 3] (area-weighted)
    v = verts.shape[-2]

    def accum(face_n):
        out = jnp.zeros((v, 3), face_n.dtype)
        for k in range(3):
            out = out.at[t[:, k]].add(face_n)
        return out

    flat = fn.reshape((-1,) + fn.shape[-2:])
    vn = jax.vmap(accum)(flat).reshape(verts.shape)
    return vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-8)


def sh_shading(normals, light):
    """9-coefficient-per-channel SH irradiance (render_3dmm.py SH lighting).

    normals [..., V, 3]; light [..., 27] (9 SH coeffs x RGB).
    Returns [..., V, 3] multiplicative shading.
    """
    x, y, z = normals[..., 0], normals[..., 1], normals[..., 2]
    ones = jnp.ones_like(x)
    basis = jnp.stack([
        ones * 0.2820948,                # l=0
        0.4886025 * y, 0.4886025 * z, 0.4886025 * x,      # l=1
        1.0925484 * x * y, 1.0925484 * y * z,
        0.3153916 * (3 * z * z - 1.0),
        1.0925484 * x * z, 0.5462742 * (x * x - y * y),   # l=2
    ], axis=-1)                                            # [..., V, 9]
    gamma = light.reshape(light.shape[:-1] + (9, 3))
    return jnp.einsum("...vb,...bc->...vc", basis, gamma)


def load_model(path: str) -> MorphableModel:
    """Load a converted morphable model .npz (our field names)."""
    d = np.load(path)
    return MorphableModel(
        mean_shape=d["mean_shape"].astype(np.float32),
        id_basis=d["id_basis"].astype(np.float32),
        exp_basis=d["exp_basis"].astype(np.float32),
        mean_tex=d["mean_tex"].astype(np.float32),
        tex_basis=d["tex_basis"].astype(np.float32),
        tris=d["tris"].astype(np.int32),
        landmark_idx=d["landmark_idx"].astype(np.int32),
        rigid_idx=d["rigid_idx"].astype(np.int32))


def convert_bfm_mat(model_dir: str) -> str:
    """Build ``3DMM_info.npy`` from the raw BFM-2009 release — the
    reference's convert_BFM.py step (license-gated download; place
    ``01_MorphableModel.mat`` plus the AD-NeRF ``exp_info.npy`` /
    ``topology_info.npy`` in ``model_dir``).

    Layout per convert_BFM.py:9-44: bases reshape ``[3V, 199]`` ->
    ``[199, V, 3]``, restrict to ``topology_info['sub_inds']``, flatten back
    to ``[199, 3V']``; expression fields copied from exp_info.npy.
    """
    import os

    from scipy.io import loadmat

    bfm = loadmat(os.path.join(model_dir, "01_MorphableModel.mat"))
    topo = np.load(os.path.join(model_dir, "topology_info.npy"),
                   allow_pickle=True).item()
    sub_inds = topo["sub_inds"]

    def sub_basis(pc):
        b = pc.reshape(-1, 199).transpose(1, 0).reshape(199, -1, 3)
        return b[:, sub_inds, :].reshape(199, -1)

    def sub_mean(mu):
        return mu.reshape(-1, 3)[sub_inds, :].reshape(-1)

    exp_info = np.load(os.path.join(model_dir, "exp_info.npy"),
                       allow_pickle=True).item()
    out = os.path.join(model_dir, "3DMM_info.npy")
    np.save(out, {
        "mu_shape": sub_mean(bfm["shapeMU"]),
        "b_shape": sub_basis(bfm["shapePC"]),
        "sig_shape": bfm["shapeEV"].reshape(-1),
        "mu_exp": exp_info["mu_exp"],
        "b_exp": exp_info["base_exp"],
        "sig_exp": exp_info["sig_exp"],
        "mu_tex": sub_mean(bfm["texMU"]),
        "b_tex": sub_basis(bfm["texPC"]),
        "sig_tex": bfm["texEV"].reshape(-1),
    })
    return out


def convert_bfm_info(model_dir: str, out_path: str,
                     n_id: int = 100, n_exp: int = 79,
                     n_tex: int = 100) -> str:
    """Convert the reference's ``3DMM/`` model directory to our .npz layout.

    Reads the three files the reference tracker loads
    (face_tracking/facemodel.py:15-48, render_3dmm.py:96-101):

      * ``3DMM_info.npy`` — dict with ``mu_shape``/``mu_exp``/``mu_tex``
        flattened ``[3V]`` and bases ``b_shape``/``b_exp``/``b_tex`` stored
        ``[K, 3V]`` (convert_BFM.py:18-27) plus per-mode stddevs
        ``sig_shape``/``sig_exp``/``sig_tex``;
      * ``keys_info.npy`` — ``keyinds`` (68 landmark vertex ids) and
        ``rigid_ids`` (pose-stable subset);
      * ``topology_info.npy`` — ``tris``.

    The facemodel.py normalization is folded in so our plain
    ``mean + B @ para`` math reproduces the reference's
    ``(para * sig) @ (b / 1e5) + centered(mu/1e5)``:
    mean = mean-centered (mu_shape + mu_exp)/1e5; id/exp bases are
    transposed to ``[V, 3, K]``, scaled by ``sig/1e5``; textures (0-255 in
    the file) map to our [0, 1] convention with ``sig_tex`` folded.
    """
    import os

    info = np.load(os.path.join(model_dir, "3DMM_info.npy"),
                   allow_pickle=True).item()
    keys = np.load(os.path.join(model_dir, "keys_info.npy"),
                   allow_pickle=True).item()
    topo = np.load(os.path.join(model_dir, "topology_info.npy"),
                   allow_pickle=True).item()
    v = info["mu_shape"].size // 3

    def basis(b, sig, k, scale):
        # [K_all, 3V] -> [V, 3, k], each mode scaled by its stddev
        bt = (b[:k].astype(np.float64)
              * sig[:k].reshape(-1, 1).astype(np.float64) * scale)
        return np.transpose(bt.reshape(k, v, 3), (1, 2, 0)).astype(np.float32)

    mu = (info["mu_shape"].astype(np.float64)
          + info["mu_exp"].astype(np.float64)).reshape(v, 3)
    mu = mu - mu.mean(axis=0, keepdims=True)     # facemodel.py:23-26
    mu = (mu / 100000.0).astype(np.float32)

    np.savez(
        out_path,
        mean_shape=mu,
        id_basis=basis(info["b_shape"], info["sig_shape"], n_id, 1e-5),
        exp_basis=basis(info["b_exp"], info["sig_exp"], n_exp, 1e-5),
        mean_tex=(info["mu_tex"].reshape(v, 3) / 255.0).astype(np.float32),
        tex_basis=basis(info["b_tex"], info["sig_tex"], n_tex, 1.0 / 255.0),
        tris=np.asarray(topo["tris"], np.int32).reshape(-1, 3),
        landmark_idx=np.asarray(keys["keyinds"], np.int32).reshape(-1),
        rigid_idx=np.asarray(keys["rigid_ids"], np.int32).reshape(-1))
    return out_path


def synthetic_model(n_theta: int = 24, n_phi: int = 18, n_id: int = 8,
                    n_exp: int = 12, n_tex: int = 6,
                    seed: int = 0) -> MorphableModel:
    """Procedural deformable head: an ellipsoid sphere-mesh with smooth
    random id/exp/tex modes. Same contract as a converted BFM; used by the
    tracker tests and synthetic fixtures."""
    rng = np.random.default_rng(seed)
    th = np.linspace(0.15, np.pi - 0.15, n_phi)
    ph = np.linspace(-np.pi * 0.75, np.pi * 0.75, n_theta)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    x = 0.11 * np.sin(tt) * np.sin(pp)
    y = 0.14 * np.cos(tt)
    z = 0.11 * np.sin(tt) * np.cos(pp)
    verts = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    V = verts.shape[0]

    tris = []
    for i in range(n_phi - 1):
        for j in range(n_theta - 1):
            a = i * n_theta + j
            b = a + 1
            c = a + n_theta
            d = c + 1
            tris += [[a, b, c], [b, d, c]]
    tris = np.asarray(tris, np.int32)

    def smooth_modes(k, scale):
        # smooth low-frequency deformation fields over the surface
        modes = np.zeros((V, 3, k), np.float32)
        for m in range(k):
            f = rng.uniform(1.0, 3.0, (3,))
            phs = rng.uniform(0, 2 * np.pi, (3,))
            amp = rng.normal(size=(3, 3)) * scale
            base = np.stack([np.sin(f[0] * tt.reshape(-1) + phs[0]),
                             np.sin(f[1] * pp.reshape(-1) + phs[1]),
                             np.cos(f[2] * (tt + pp).reshape(-1) + phs[2])], -1)
            modes[:, :, m] = base @ amp
        return modes

    id_basis = smooth_modes(n_id, 0.004)
    exp_basis = smooth_modes(n_exp, 0.006)
    mean_tex = (0.45 + 0.25 * np.stack(
        [np.cos(tt.reshape(-1)), np.sin(pp.reshape(-1)),
         np.cos(pp.reshape(-1))], -1)).astype(np.float32).clip(0.05, 0.95)
    tex_basis = smooth_modes(n_tex, 0.06)

    # 68 landmark vertices: spread over the front of the head
    front = np.where(verts[:, 2] > 0.04)[0]
    landmark_idx = front[np.linspace(0, len(front) - 1, 68).astype(int)]
    rigid_idx = front[np.linspace(0, len(front) - 1, 40).astype(int)]
    return MorphableModel(verts, id_basis, exp_basis, mean_tex, tex_basis,
                          tris, landmark_idx.astype(np.int32),
                          rigid_idx.astype(np.int32))
