"""Frame-batched data-parallel motion training over a device mesh.

The reference trains strictly one frame per step on one GPU
(train_face.py:122-126). Here a *batch* of B frames trains per step: the
Gaussian state and network params are replicated, the per-frame tensors are
sharded along the ``dp`` mesh axis, the per-frame photometric+motion loss is
vmapped, and XLA all-reduces the shared-parameter gradients over ICI. With
B = n_devices this keeps per-device semantics equal to the reference while
multiplying throughput by the mesh size (SURVEY.md §5.8 scale-out plan).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import gaussians as G
from ..models.motion import MotionNetwork, PersonalizedMotionNetwork
from ..ops.rasterize import RasterizeConfig
from ..render import Camera, render_motion
from ..train.common import FrameBatch, gaussian_lrs
from ..utils.losses import l1_loss, ssim

GREEN = jnp.array([0.0, 1.0, 0.0], jnp.float32)


class FrameData(NamedTuple):
    """Per-frame tensors, batched on the leading axis [B, ...]."""
    view_transform: jnp.ndarray
    full_proj_transform: jnp.ndarray
    camera_center: jnp.ndarray
    tanfovx: jnp.ndarray
    tanfovy: jnp.ndarray
    gt: jnp.ndarray          # [B, 3, H, W] float
    head_mask: jnp.ndarray   # [B, H, W] bool
    mouth_mask: jnp.ndarray
    auds: jnp.ndarray        # [B, 8, D, 16]
    au_exp: jnp.ndarray      # [B, 6]


def frame_data_from_batch(batch: FrameBatch, idx) -> FrameData:
    """Gather a [B]-indexed FrameData from a host FrameBatch."""
    import numpy as np
    idx = np.asarray(idx)
    return FrameData(
        view_transform=batch.view_transform[idx],
        full_proj_transform=batch.full_proj_transform[idx],
        camera_center=batch.camera_center[idx],
        tanfovx=batch.tanfovx[idx],
        tanfovy=batch.tanfovy[idx],
        gt=batch.image[idx].astype(jnp.float32).transpose(0, 3, 1, 2) / 255.0,
        head_mask=batch.face_mask[idx] | batch.hair_mask[idx],
        mouth_mask=batch.mouth_mask[idx],
        auds=batch.auds[idx],
        au_exp=batch.au_exp[idx],
    )


def make_dp_face_step(cfg: RasterizeConfig, opt_cfg, umf_net: MotionNetwork,
                      pmf_net: PersonalizedMotionNetwork,
                      spatial_lr_scale: float, mesh: Mesh, umf_tx, pmf_tx):
    """Build the data-parallel face training step.

    Model state/params replicated; FrameData sharded on ``dp``.
    """
    frame_sharding = jax.tree.map(
        lambda _: NamedSharding(mesh, P("dp")), FrameData(
            *[0] * len(FrameData._fields)))
    rep = NamedSharding(mesh, P())

    def per_frame_loss(state_tpl: G.GaussianState, gparams, umf_p, pmf_p,
                       frame: FrameData):
        cam = Camera(frame.view_transform, frame.full_proj_transform,
                     frame.camera_center, frame.tanfovx, frame.tanfovy)
        state = state_tpl.replace(params=gparams)
        mr = render_motion(
            cfg, cam, state,
            umf=lambda x, a, e: umf_net.apply(umf_p, x, a, e),
            aud=frame.auds, exp=frame.au_exp, bg=GREEN,
            pmf=lambda x, a, e: pmf_net.apply(pmf_p, x, a, e),
            personalized=False, align=True)
        gt_w = jnp.where(frame.head_mask[None], frame.gt,
                         GREEN[:, None, None])
        gt_w = jnp.where(frame.mouth_mask[None], GREEN[:, None, None], gt_w)
        loss = l1_loss(mr.out.image, gt_w)
        loss += opt_cfg.lambda_dssim * (1.0 - ssim(mr.out.image, gt_w))
        m = mr.motion
        loss += 1e-5 * (jnp.abs(m["d_xyz"]).mean() + jnp.abs(m["d_rot"]).mean()
                        + jnp.abs(m["d_opa"]).mean()
                        + jnp.abs(m["d_scale"]).mean())
        hm = frame.head_mask[None].astype(jnp.float32)
        loss += 1e-3 * (((1 - mr.out.alpha) * hm).mean()
                        + (mr.out.alpha * (1 - hm)).mean())
        return loss

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5))
    def step(state: G.GaussianState, gopt, umf_params, umf_opt_state,
             pmf_params, pmf_opt_state, frames: FrameData, it):
        frames = jax.lax.with_sharding_constraint(frames, frame_sharding)

        def batched_loss(gparams, umf_p, pmf_p):
            losses = jax.vmap(
                lambda f: per_frame_loss(state, gparams, umf_p, pmf_p, f)
            )(frames)
            return jnp.mean(losses)

        loss, (g_gauss, g_umf, g_pmf) = jax.value_and_grad(
            batched_loss, argnums=(0, 1, 2))(state.params, umf_params,
                                             pmf_params)

        lrs = gaussian_lrs(opt_cfg, it, spatial_lr_scale)
        new_p, gopt = G.adam_update(state.params, g_gauss, gopt, lrs,
                                    state.alive)
        state = state.replace(params=new_p)
        upd, umf_opt_state = umf_tx.update(g_umf, umf_opt_state, umf_params)
        umf_params = jax.tree.map(lambda p, u: p + u, umf_params, upd)
        updp, pmf_opt_state = pmf_tx.update(g_pmf, pmf_opt_state, pmf_params)
        pmf_params = jax.tree.map(lambda p, u: p + u, pmf_params, updp)
        return state, gopt, umf_params, umf_opt_state, pmf_params, \
            pmf_opt_state, loss

    return step
