"""Identity-parallel multi-identity pre-training over a device mesh.

SURVEY.md §5.8(b): the reference pre-trains by drawing ONE identity per
iteration on one GPU (pretrain_face.py:156). Here every device trains a
different identity *simultaneously*: per-identity Gaussian states, PMFs,
their optimizer states, and frame batches are stacked on a leading identity
axis and sharded over the ``id`` mesh axis; the shared UMF is replicated and
its gradients are all-reduced (mean over identities) by XLA over ICI. The
cross-identity contrastive term uses the PMF parameter stack directly —
each device all-gathers the (small) PMF params it needs through XLA's
sharding propagation.

Semantics: one step trains all n identities at once with UMF gradients
averaged — equivalent to n reference iterations with a synchronized UMF
update (large-batch flavor of the reference's serial shuffle).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import gaussians as G
from ..render import render_motion
from ..train.common import FrameBatch, gaussian_lrs
from ..utils.losses import l1_loss, ssim

GREEN = jnp.array([0.0, 1.0, 0.0], jnp.float32)


def stack_identities(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def make_idp_pretrain_step(cfg, opt_cfg, umf_net, pmf_net,
                           spatial_lr_scale: float, num_ids: int, mesh: Mesh,
                           umf_tx, pmf_tx, axis: str = "id"):
    """Build the identity-parallel pre-training step.

    Args (to the returned step):
      states_stack/gopt_stack: per-identity GaussianState/AdamState stacked
        on axis 0 (shard over ``id``).
      umf_params/umf_opt_state: replicated.
      pmf_stack/pmf_opt_stack: stacked per-identity PMFs (shard over ``id``).
      batch_stack: FrameBatch stacked on identity axis (shard over ``id``).
      frame_idx: [n] per-identity frame index; it: scalar iteration.
    """
    id_sharding = NamedSharding(mesh, P(axis))

    def per_identity_loss(state_tpl, gparams, umf_p, pmf_p, pmf_all,
                          batch: FrameBatch, i, my_id):
        cam = batch.camera(i)
        gt = batch.gt_image(i)
        head_m = batch.face_mask[i] | batch.hair_mask[i]
        mouth_m = batch.mouth_mask[i]

        st = state_tpl.replace(params=gparams)
        mr = render_motion(
            cfg, cam, st,
            umf=lambda x, a, e: umf_net.apply(umf_p, x, a, e),
            aud=batch.auds[i], exp=batch.au_exp[i], bg=GREEN,
            pmf=lambda x, a, e: pmf_net.apply(pmf_p, x, a, e),
            personalized=True, align=False)
        gt_w = jnp.where(head_m[None], gt, GREEN[:, None, None])
        gt_w = jnp.where(mouth_m[None], GREEN[:, None, None], gt_w)
        loss = l1_loss(mr.out.image, gt_w)
        loss += opt_cfg.lambda_dssim * (1.0 - ssim(mr.out.image, gt_w))

        m, pm = mr.motion, mr.p_motion
        loss += 1e-5 * (jnp.abs(m["d_xyz"]).mean() + jnp.abs(m["d_rot"]).mean()
                        + jnp.abs(m["d_opa"]).mean()
                        + jnp.abs(m["d_scale"]).mean())
        hm = head_m[None].astype(jnp.float32)
        loss += 1e-3 * (((1 - mr.out.alpha) * hm).mean()
                        + (mr.out.alpha * (1 - hm)).mean())

        # contrastive hinge vs every other identity's PMF (stop-grad)
        if num_ids > 1:
            xyz = jax.lax.stop_gradient(gparams.xyz)

            def other_dxyz(p_other):
                return pmf_net.apply(p_other, xyz, batch.auds[i],
                                     batch.au_exp[i])["d_xyz"]

            all_dxyz = jax.vmap(other_dxyz)(
                jax.lax.stop_gradient(pmf_all))        # [n, N, 3]
            dots = jnp.maximum(
                jnp.sum(all_dxyz * pm["d_xyz"][None], -1), 0.0)
            not_self = (jnp.arange(num_ids) != my_id)[:, None]
            loss += jnp.sum(jnp.mean(jnp.where(not_self, dots, 0.0), -1))
        return loss

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5))
    def step(states_stack, gopt_stack, umf_params, umf_opt_state, pmf_stack,
             pmf_opt_stack, batch_stack: FrameBatch, frame_idx, it):
        states_stack = jax.lax.with_sharding_constraint(
            states_stack, jax.tree.map(lambda _: id_sharding, states_stack))

        ids = jnp.arange(num_ids)

        def batched_loss(gparams_stack, umf_p, pmf_all):
            def one(state, gparams, pmf_p, batch, i, my_id):
                return per_identity_loss(state, gparams, umf_p, pmf_p,
                                         pmf_all, batch, i, my_id)
            losses = jax.vmap(one)(
                states_stack, gparams_stack,
                jax.tree.map(lambda x: x, pmf_all), batch_stack, frame_idx,
                ids)
            return jnp.mean(losses)

        gparams_stack = jax.tree.map(lambda x: x, states_stack.params)
        loss, (g_gauss, g_umf, g_pmf) = jax.value_and_grad(
            batched_loss, argnums=(0, 1, 2))(gparams_stack, umf_params,
                                             pmf_stack)

        # per-identity Gaussian Adam (vmapped over the stacked states)
        lrs = gaussian_lrs(opt_cfg, it, spatial_lr_scale)

        def upd(params, grads, gopt, alive):
            return G.adam_update(params, grads, gopt, lrs, alive)

        new_params, gopt_stack = jax.vmap(upd)(
            states_stack.params, g_gauss, gopt_stack, states_stack.alive)
        states_stack = states_stack.replace(params=new_params)

        # replicated UMF update on the identity-mean gradient
        u, umf_opt_state = umf_tx.update(g_umf, umf_opt_state, umf_params)
        umf_params = jax.tree.map(lambda p, d: p + d, umf_params, u)

        # per-identity PMF updates (vmapped optax)
        def pupd(g, o, p):
            d, o2 = pmf_tx.update(g, o, p)
            return jax.tree.map(lambda a, b: a + b, p, d), o2

        pmf_stack, pmf_opt_stack = jax.vmap(pupd)(g_pmf, pmf_opt_stack,
                                                  pmf_stack)
        return (states_stack, gopt_stack, umf_params, umf_opt_state,
                pmf_stack, pmf_opt_stack, loss)

    return step
