"""Photometric 3DMM fitting stages (reference face_tracker.py:159-350).

Given per-frame 68-point landmarks, frames, and a PnP pose initialization,
fits a :class:`~instag_tpu.data_utils.face_model.MorphableModel`'s
id / exp / texture / SH-lighting / per-frame pose by the reference's staged
schedule, re-stated with optax Adam + jitted lax.scan loops:

  A. pose-only landmark fit                       (face_tracker.py:159-178)
  B. joint id+exp+pose landmark fit, L2 regs 0.5/0.4          (:181-203)
  C. texture + SH light photometric fit on a 32-frame batch    (:210-280)
  D. per-batch fine fit of exp/pose/light with color + landmark
     losses and temporal smoothness on rigid vertices          (:290-350)

Camera model: COLMAP pixel convention (x right, y down, z forward),
``px = f·x/z + cx`` — the raw PnP frame, before the OpenGL flip the tracker
applies when writing ``track_params``.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .face_model import (MorphableModel, geometry, landmarks3d, sh_shading,
                         texture, vertex_normals)
from .mesh_render import MeshRenderConfig, render_mesh


def euler2rot_jax(euler):
    """Batched [..., 3] -> [..., 3, 3] rotation in the exact convention of
    the reference's euler2rot (mirrored at data_utils/process.py:249-264 and
    inverted by tracker.rot2euler); sign conventions verified by round-trip
    against both."""
    th, ph, ps = euler[..., 0], euler[..., 1], euler[..., 2]
    c, s = jnp.cos, jnp.sin
    one = jnp.ones_like(th)
    zero = jnp.zeros_like(th)
    rx = jnp.stack([jnp.stack([one, zero, zero], -1),
                    jnp.stack([zero, c(th), s(th)], -1),
                    jnp.stack([zero, -s(th), c(th)], -1)], -2)
    ry = jnp.stack([jnp.stack([c(ph), zero, -s(ph)], -1),
                    jnp.stack([zero, one, zero], -1),
                    jnp.stack([s(ph), zero, c(ph)], -1)], -2)
    rz = jnp.stack([jnp.stack([c(ps), -s(ps), zero], -1),
                    jnp.stack([s(ps), c(ps), zero], -1),
                    jnp.stack([zero, zero, one], -1)], -2)
    return rx @ ry @ rz


def transform_points(points, euler, trans):
    """[..., N, 3] model points -> camera space (R p + t)."""
    R = euler2rot_jax(euler)
    return jnp.einsum("...ij,...nj->...ni", R, points) + trans[..., None, :]


def project(points_cam, focal, cx, cy, z_near=1e-3):
    z = jnp.maximum(points_cam[..., 2], z_near)
    return jnp.stack([focal * points_cam[..., 0] / z + cx,
                      focal * points_cam[..., 1] / z + cy], -1)


def _lan_loss(proj, lms):
    return jnp.mean(jnp.sum((proj - lms) ** 2, -1))


def _run_adam(loss_fn, params, lr, iters, decay_every=0, decay=0.2):
    """Jitted Adam loop (lax.scan) with optional staircase LR decay."""
    sched = (optax.constant_schedule(lr) if not decay_every else
             optax.exponential_decay(lr, decay_every, decay, staircase=True))
    tx = optax.adam(sched)

    @jax.jit
    def run(p):
        opt = tx.init(p)

        def step(carry, _):
            p, opt = carry
            l, g = jax.value_and_grad(loss_fn)(p)
            u, opt = tx.update(g, opt, p)
            return (optax.apply_updates(p, u), opt), l

        (p, _), losses = jax.lax.scan(step, (p, opt), None, length=iters)
        return p, losses

    return run(params)


def fit_photometric(model: MorphableModel, lms: np.ndarray,
                    images: np.ndarray, focal: float, cx: float, cy: float,
                    euler_init: np.ndarray, trans_init: np.ndarray,
                    iters=(400, 600, 60, 40), batch_size: int = 32,
                    render_cfg: MeshRenderConfig | None = None) -> dict:
    """Run stages A-D. ``lms`` [T,68,2]; ``images`` [T,H,W,3] float in [0,1].

    Returns dict with id [n_id], exp [T,n_exp], tex [n_tex], euler [T,3],
    trans [T,3], light [T,27], and diagnostics (landmark errors px).
    """
    T, H = lms.shape[0], images.shape[1]
    W = images.shape[2]
    cfg = render_cfg or MeshRenderConfig(H, W)
    lms_j = jnp.asarray(lms, jnp.float32)
    tris = jnp.asarray(model.tris)

    n_id, n_exp, n_tex = model.n_id, model.n_exp, model.n_tex

    def lan_proj(id_p, exp_p, euler, trans):
        l3 = landmarks3d(model, id_p[None].repeat(exp_p.shape[0], 0), exp_p)
        return project(transform_points(l3, euler, trans), focal, cx, cy)

    # ---- stage A: pose only ----
    def loss_a(p):
        proj = lan_proj(jnp.zeros((n_id,)), jnp.zeros((T, n_exp)),
                        p["euler"], p["trans"])
        return _lan_loss(proj, lms_j)

    pa = {"euler": jnp.asarray(euler_init, jnp.float32),
          "trans": jnp.asarray(trans_init, jnp.float32)}
    pa, la = _run_adam(loss_a, pa, 1e-2, iters[0], decay_every=iters[0] * 2 // 3)

    # ---- stage B: id + exp + pose, L2 regs (0.5 / 0.4) ----
    def loss_b(p):
        proj = lan_proj(p["id"], p["exp"], p["euler"], p["trans"])
        return (_lan_loss(proj, lms_j)
                + 0.5 * jnp.mean(p["id"] ** 2)
                + 0.4 * jnp.mean(p["exp"] ** 2))

    pb = {**pa, "id": jnp.zeros((n_id,)), "exp": jnp.zeros((T, n_exp))}
    pb, lb = _run_adam(loss_b, pb, 5e-3, iters[1], decay_every=iters[1] // 2)

    # ---- stage C: texture + SH light on a spread 32-frame batch ----
    bs = min(batch_size, T)
    sel = np.arange(0, T, max(1, T // bs))[:bs]
    sel_imgs = jnp.asarray(images[sel], jnp.float32)
    sel_lms = lms_j[sel]

    def render_batch(id_p, exp_p, euler, trans, tex_p, light):
        def one(e_p, eu, tr, li):
            geo = geometry(model, id_p, e_p)
            vc = transform_points(geo, eu, tr)
            nrm = vertex_normals(vc, tris)
            shade = jnp.maximum(sh_shading(nrm, li), 0.0)
            cols = jnp.clip(texture(model, tex_p) * shade, 0.0, 1.0)
            return render_mesh(cfg, vc, tris, cols, focal, cx, cy)
        return jax.lax.map(lambda a: one(*a), (exp_p, euler, trans, light))

    def loss_c(p):
        proj = lan_proj(p["id"], p["exp"], p["euler"], p["trans"])
        l_lan = _lan_loss(proj[jnp.asarray(sel)], sel_lms)
        rgba = render_batch(p["id"], p["exp"][jnp.asarray(sel)],
                            p["euler"][jnp.asarray(sel)],
                            p["trans"][jnp.asarray(sel)], p["tex"],
                            p["light"])
        mask = jax.lax.stop_gradient(rgba[..., 3:])
        l_col = (jnp.sum(((rgba[..., :3] - sel_imgs) * mask) ** 2)
                 / jnp.maximum(jnp.sum(mask), 1.0))
        return (l_col + 0.05 * l_lan + 1.0 * jnp.mean(p["id"] ** 2)
                + 0.8 * jnp.mean(p["exp"][jnp.asarray(sel)] ** 2))

    pc = {**pb, "tex": jnp.zeros((n_tex,)),
          "light": jnp.tile(
              jnp.zeros((27,)).at[0].set(1.0).at[1].set(1.0).at[2].set(1.0)
              [None], (bs, 1))}
    pc, lc = _run_adam(loss_c, pc, 2e-2, iters[2], decay_every=iters[2] // 2)

    light_mean = jnp.mean(pc["light"], axis=0)
    light_all = jnp.tile(light_mean[None], (T, 1))

    # ---- stage D: per-batch fine fit (exp/pose/light; id/tex frozen) ----
    id_f = jax.lax.stop_gradient(pc["id"])
    tex_f = jax.lax.stop_gradient(pc["tex"])
    exp_all = np.array(pc["exp"])
    euler_all = np.array(pc["euler"])
    trans_all = np.array(pc["trans"])
    light_np = np.array(light_all)
    rigid = jnp.asarray(model.rigid_idx)

    imgs_j = jnp.asarray(images, jnp.float32)

    def make_loss_d(idx):
        idx_j = jnp.asarray(idx)

        def loss_d(p):
            proj = project(transform_points(
                landmarks3d(model, id_f[None].repeat(len(idx), 0), p["exp"]),
                p["euler"], p["trans"]), focal, cx, cy)
            l_lan = _lan_loss(proj, lms_j[idx_j])
            rgba = render_batch(id_f, p["exp"], p["euler"], p["trans"],
                                tex_f, p["light"])
            mask = jax.lax.stop_gradient(rgba[..., 3:])
            l_col = (jnp.sum(((rgba[..., :3] - imgs_j[idx_j]) * mask) ** 2)
                     / jnp.maximum(jnp.sum(mask), 1.0))
            # temporal smoothness of rigid vertices (the reference's
            # laplacian over the batch + 5 preceding frames, :315-340)
            geo = geometry(model, id_f[None].repeat(len(idx), 0), p["exp"])
            gr = transform_points(geo[:, rigid], p["euler"], p["trans"])
            lap = gr[:-2] - 2 * gr[1:-1] + gr[2:]
            l_lap = jnp.mean(jnp.sum(lap ** 2, -1)) if len(idx) > 2 else 0.0
            return (l_col + 0.05 * l_lan + 0.3 * jnp.mean(p["exp"] ** 2)
                    + 10.0 * l_lap)
        return loss_d

    for start in range(0, T, bs):
        idx = np.arange(start, min(start + bs, T))
        if len(idx) < bs and T >= bs:
            idx = np.arange(T - bs, T)
        pd = {"exp": jnp.asarray(exp_all[idx]),
              "euler": jnp.asarray(euler_all[idx]),
              "trans": jnp.asarray(trans_all[idx]),
              "light": jnp.asarray(light_np[idx])}
        pd, _ = _run_adam(make_loss_d(idx), pd, 2e-3, iters[3])
        exp_all[idx] = np.asarray(pd["exp"])
        euler_all[idx] = np.asarray(pd["euler"])
        trans_all[idx] = np.asarray(pd["trans"])
        light_np[idx] = np.asarray(pd["light"])

    # final landmark reprojection error (px)
    proj = lan_proj(pc["id"], jnp.asarray(exp_all), jnp.asarray(euler_all),
                    jnp.asarray(trans_all))
    err = float(jnp.mean(jnp.linalg.norm(proj - lms_j, axis=-1)))

    return dict(id=np.asarray(pc["id"]), exp=exp_all,
                tex=np.asarray(pc["tex"]), euler=euler_all, trans=trans_all,
                light=light_np, lan_err_px=err,
                stage_losses=dict(a=float(la[-1]), b=float(lb[-1]),
                                  c=float(lc[-1])))
