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

Loss parity: the per-identity loss is the FULL serial pre-training loss
(train/pretrain.py make_pretrain_face_step — L1+DSSIM on the masked green
composite, motion + PMF regs 1e-5, alpha mask 1e-3, cross-identity
contrastive hinge, eye-attention suppression in the lips rect 5e-3 for both
UMF and PMF maps, hair-attention 1e-4; reference pretrain_face.py:290-362),
verified equal to the serial step in tests/test_parallel.py. Densification
stats (means2D offset grads) and max-radii tracking are maintained per
identity, and ``make_idp_densify`` applies clone/split/prune vmapped over
the identity axis at block boundaries under the same sharding.

Semantics: one step trains all n identities at once with UMF gradients
averaged — equivalent to n reference iterations with a synchronized UMF
update (large-batch flavor of the reference's serial shuffle). The reference
warm-up (static renders for the first 1000·n iters) runs via the
frame-data-parallel static path before switching to this step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import gaussians as G
from ..render import render_motion
from ..train.common import FrameBatch, gaussian_lrs
from ..train.common import rect_mask
from ..train.optim import ema_update
from ..train.pretrain import PretrainFlags, _base_image_loss

GREEN = jnp.array([0.0, 1.0, 0.0], jnp.float32)


def stack_identities(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def make_idp_pretrain_step(cfg, opt_cfg, umf_net, pmf_net,
                           spatial_lr_scale: float, num_ids: int, mesh: Mesh,
                           umf_tx, pmf_tx, axis: str = "id",
                           share_audio_net: bool = False):
    """Build the identity-parallel pre-training step (face branch).

    Args (to the returned step):
      states_stack/gopt_stack: per-identity GaussianState/AdamState stacked
        on axis 0 (shard over ``id``).
      umf_params/umf_opt_state/ema_params: replicated.
      pmf_stack/pmf_opt_stack: stacked per-identity PMFs (shard over ``id``).
      batch_stack: FrameBatch stacked on identity axis (shard over ``id``).
      frame_idx: [n] per-identity frame index; it: scalar iteration;
      flags: PretrainFlags scalars (use_regs, hair_paint).

    Returns (states, gopts, umf, umf_opt, pmfs, pmf_opts, ema, losses[n]).
    """
    id_sharding = NamedSharding(mesh, P(axis))

    def per_identity_loss(state_tpl, gparams, umf_p, pmf_p, pmf_all, off,
                          batch: FrameBatch, i, my_id, flags: PretrainFlags):
        cam = batch.camera(i)
        gt = batch.gt_image(i)
        aud, exp = batch.auds[i], batch.au_exp[i]
        face_m, hair_m = batch.face_mask[i], batch.hair_mask[i]
        mouth_m = batch.mouth_mask[i]
        head_m = face_m | hair_m
        h, w = cfg.image_height, cfg.image_width
        lips_m = rect_mask(h, w, batch.lips_rect[i]).astype(jnp.float32)

        if share_audio_net:
            from ..train.pretrain import tie_audio_params
            pmf_p = tie_audio_params(pmf_p, umf_p)
        st = state_tpl.replace(params=gparams)
        mr = render_motion(
            cfg, cam, st,
            umf=lambda x, a, e: umf_net.apply(umf_p, x, a, e),
            aud=aud, exp=exp, bg=GREEN,
            pmf=lambda x, a, e: pmf_net.apply(pmf_p, x, a, e),
            personalized=True, align=False, return_attn=True,
            means2d_offset=off)
        out = mr.out
        gt_w = jnp.where(head_m[None], gt, GREEN[:, None, None])
        gt_w = jnp.where(mouth_m[None], GREEN[:, None, None], gt_w)
        hp = flags.hair_paint
        img = out.image * (1 - hp) + jnp.where(
            hair_m[None], GREEN[:, None, None], out.image) * hp
        gt_w = gt_w * (1 - hp) + jnp.where(
            hair_m[None], GREEN[:, None, None], gt_w) * hp

        loss = _base_image_loss(img, gt_w, opt_cfg.lambda_dssim)

        m, pm = mr.motion, mr.p_motion
        reg = (jnp.abs(m["d_xyz"]).mean() + jnp.abs(m["d_rot"]).mean()
               + jnp.abs(m["d_opa"]).mean() + jnp.abs(m["d_scale"]).mean())
        reg += (jnp.abs(pm["d_xyz"]).mean() + jnp.abs(pm["d_rot"]).mean()
                + jnp.abs(pm["d_opa"]).mean() + jnp.abs(pm["d_scale"]).mean())
        loss += flags.use_regs * 1e-5 * reg

        hm = head_m[None].astype(jnp.float32)
        loss += flags.use_regs * 1e-3 * (
            ((1 - out.alpha) * hm).mean() + (out.alpha * (1 - hm)).mean())

        # contrastive hinge vs every other identity's PMF (stop-grad)
        if num_ids > 1:
            xyz = jax.lax.stop_gradient(gparams.xyz)

            def other_dxyz(p_other):
                if share_audio_net:
                    from ..train.pretrain import tie_audio_params
                    p_other = tie_audio_params(
                        p_other, jax.lax.stop_gradient(umf_p))
                return pmf_net.apply(p_other, xyz, aud, exp)["d_xyz"]

            all_dxyz = jax.vmap(other_dxyz)(
                jax.lax.stop_gradient(pmf_all))        # [n, N, 3]
            dots = jnp.maximum(
                jnp.sum(all_dxyz * pm["d_xyz"][None], -1), 0.0)
            not_self = (jnp.arange(num_ids) != my_id)[:, None]
            loss += flags.use_regs * jnp.sum(
                jnp.mean(jnp.where(not_self, dots, 0.0), -1))

        # eye-attention suppression in the lips rect, UMF + PMF (:347-354)
        lsum = jnp.maximum(lips_m.sum(), 1.0)
        loss += flags.use_regs * 5e-3 * (mr.attn[1] * lips_m).sum() / lsum
        loss += flags.use_regs * 5e-3 * (mr.p_attn[1] * lips_m).sum() / lsum

        # hair attention (:360-362)
        hmf = hair_m.astype(jnp.float32)
        attn_hair = ((mr.attn[1] * hmf).sum() + (mr.attn[0] * hmf).sum()
                     ) / jnp.maximum(hmf.sum(), 1.0)
        loss += flags.use_regs * (1 - hp) * 1e-4 * attn_hair
        return loss, out

    def step_body(states_stack, gopt_stack, umf_params, umf_opt_state,
                  pmf_stack, pmf_opt_stack, ema_params,
                  batch_stack: FrameBatch, frame_idx, it,
                  flags: PretrainFlags):
        states_stack = jax.lax.with_sharding_constraint(
            states_stack, jax.tree.map(lambda _: id_sharding, states_stack))

        ids = jnp.arange(num_ids)
        cap = states_stack.params.xyz.shape[1]
        offsets0 = jnp.zeros((num_ids, cap, 2))

        def summed_loss(gparams_stack, umf_p, pmf_all, offs):
            def one(state, gparams, pmf_p, off, batch, i, my_id):
                return per_identity_loss(state, gparams, umf_p, pmf_p,
                                         pmf_all, off, batch, i, my_id, flags)
            losses, outs = jax.vmap(one)(
                states_stack, gparams_stack, pmf_all, offs, batch_stack,
                frame_idx, ids)
            return jnp.mean(losses), (losses, outs)

        gparams_stack = states_stack.params
        (_, (losses, outs)), (g_gauss, g_umf, g_pmf, g_off) = (
            jax.value_and_grad(summed_loss, argnums=(0, 1, 2, 3),
                               has_aux=True)(
                gparams_stack, umf_params, pmf_stack, offsets0))
        # mean over identities scaled the per-identity grads by 1/n; undo for
        # the per-identity Gaussian/PMF updates and densification stats so
        # each identity sees exactly the serial step's gradients
        g_gauss = jax.tree.map(lambda x: x * num_ids, g_gauss)
        g_pmf = jax.tree.map(lambda x: x * num_ids, g_pmf)
        g_off = g_off * num_ids

        # per-identity Gaussian Adam (vmapped over the stacked states)
        lrs = gaussian_lrs(opt_cfg, it, spatial_lr_scale)

        def upd(params, grads, gopt, alive):
            return G.adam_update(params, grads, gopt, lrs, alive)

        new_params, gopt_stack = jax.vmap(upd)(
            states_stack.params, g_gauss, gopt_stack, states_stack.alive)
        states_stack = states_stack.replace(params=new_params)

        # replicated UMF update on the identity-mean gradient + EMA(0.995)
        u, umf_opt_state = umf_tx.update(g_umf, umf_opt_state, umf_params)
        umf_params = jax.tree.map(lambda p, d: p + d, umf_params, u)
        ema_params = ema_update(ema_params, umf_params, 0.995)

        # per-identity PMF updates (vmapped optax)
        def pupd(g, o, p):
            d, o2 = pmf_tx.update(g, o, p)
            return jax.tree.map(lambda a, b: a + b, p, d), o2

        pmf_stack, pmf_opt_stack = jax.vmap(pupd)(g_pmf, pmf_opt_stack,
                                                  pmf_stack)

        # densification stats + max radii, per identity
        def dstats(state, goff, radii):
            visible = radii > 0
            state = G.add_densification_stats(state, goff, visible)
            return G.update_max_radii(state, radii, visible)

        states_stack = jax.vmap(dstats)(states_stack, g_off, outs.radii)

        return (states_stack, gopt_stack, umf_params, umf_opt_state,
                pmf_stack, pmf_opt_stack, ema_params, losses)

    step = jax.jit(step_body, donate_argnums=(0, 1, 2, 3, 4, 5, 6))

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5, 6))
    def block(states_stack, gopt_stack, umf_params, umf_opt_state, pmf_stack,
              pmf_opt_stack, ema_params, batch_stack: FrameBatch,
              frame_idx_blk, its_blk, flags_blk: PretrainFlags):
        """Scan ``B`` identity-parallel steps as one device program.

        frame_idx_blk [B, n]; its_blk [B]; flags fields [B]."""
        def one(carry, xs):
            fi, it, flags = xs
            out = step_body(*carry, batch_stack, fi, it, flags)
            return out[:-1], out[-1]

        carry, losses = jax.lax.scan(
            one,
            (states_stack, gopt_stack, umf_params, umf_opt_state, pmf_stack,
             pmf_opt_stack, ema_params),
            (frame_idx_blk, its_blk, flags_blk))
        return carry + (losses,)

    return step, block


def make_idp_pretrain_mouth_step(cfg, opt_cfg, umf_net, pmf_net, face_net,
                                 spatial_lr_scale: float, num_ids: int,
                                 mesh: Mesh, umf_tx, pmf_tx,
                                 axis: str = "id"):
    """Identity-parallel mouth-branch pre-training step.

    Mirrors the serial loss exactly (train/pretrain.py
    make_pretrain_mouth_step — mouth-masked green composite with the
    (lips ⊻ mouth) band painted out, motion+PMF regs 1e-5, lips alpha mask
    1e-3, one-other contrastive hinge; reference pretrain_mouth.py:219-276).
    Per-identity face clouds ride the stack; the frozen face UMF is
    replicated. ``other_ids`` [n] selects each identity's contrastive
    partner (the serial path draws one at random per step).
    """
    from ..render import render_motion_mouth

    id_sharding = NamedSharding(mesh, P(axis))

    def per_identity_loss(state_tpl, gparams, umf_p, pmf_p, pmf_all, off,
                          face_state, face_umf_p, batch: FrameBatch, i,
                          other_id, flags: PretrainFlags):
        cam = batch.camera(i)
        gt = batch.gt_image(i)
        aud = batch.auds[i]
        mouth_m = batch.mouth_mask[i]
        h, w = cfg.image_height, cfg.image_width
        lips_m = rect_mask(h, w, batch.lips_rect[i])

        st = state_tpl.replace(params=gparams)
        mr = render_motion_mouth(
            cfg, cam, st,
            mouth_umf=lambda x, a, m: umf_net.apply(umf_p, x, a, m),
            face_state=face_state,
            face_umf=lambda x, a, e: face_net.apply(
                jax.lax.stop_gradient(face_umf_p), x, a, e),
            aud=aud, bg=GREEN,
            pmf=lambda x, a: pmf_net.apply(pmf_p, x, a),
            personalized=True, align=False, means2d_offset=off)
        out = mr.out
        gt_g = jnp.where(mouth_m[None], gt, GREEN[:, None, None])
        band = lips_m ^ mouth_m
        img = jnp.where(band[None], GREEN[:, None, None], out.image)

        loss = _base_image_loss(img, gt_g, opt_cfg.lambda_dssim)
        m, pm = mr.motion, mr.p_motion
        loss += flags.use_regs * 1e-5 * (
            jnp.abs(m["d_xyz"]).mean() + jnp.abs(m["d_rot"]).mean()
            + jnp.abs(pm["d_xyz"]).mean() + jnp.abs(pm["d_rot"]).mean())
        lm = lips_m[None].astype(jnp.float32)
        loss += flags.use_regs * 1e-3 * (
            ((1 - out.alpha) * lm).mean() + (out.alpha * (1 - lm)).mean())

        if num_ids > 1:
            xyz = jax.lax.stop_gradient(gparams.xyz)
            p_other = jax.lax.stop_gradient(
                jax.tree.map(lambda x: x[other_id], pmf_all))
            other = pmf_net.apply(p_other, xyz, aud)["d_xyz"]
            dots = jnp.maximum(jnp.sum(other * pm["d_xyz"], -1), 0.0)
            loss += flags.use_regs * dots.mean()
        return loss, out

    def step_body(states_stack, gopt_stack, umf_params, umf_opt_state,
                  pmf_stack, pmf_opt_stack, ema_params, face_states_stack,
                  face_umf_params, batch_stack: FrameBatch, frame_idx,
                  other_ids, it, flags: PretrainFlags):
        states_stack = jax.lax.with_sharding_constraint(
            states_stack, jax.tree.map(lambda _: id_sharding, states_stack))

        cap = states_stack.params.xyz.shape[1]
        offsets0 = jnp.zeros((num_ids, cap, 2))

        def summed_loss(gparams_stack, umf_p, pmf_all, offs):
            def one(state, gparams, pmf_p, off, face_state, batch, i, oid):
                return per_identity_loss(state, gparams, umf_p, pmf_p,
                                         pmf_all, off, face_state,
                                         face_umf_params, batch, i, oid,
                                         flags)
            losses, outs = jax.vmap(one)(
                states_stack, gparams_stack, pmf_all, offs,
                face_states_stack, batch_stack, frame_idx, other_ids)
            return jnp.mean(losses), (losses, outs)

        (_, (losses, outs)), (g_gauss, g_umf, g_pmf, g_off) = (
            jax.value_and_grad(summed_loss, argnums=(0, 1, 2, 3),
                               has_aux=True)(
                states_stack.params, umf_params, pmf_stack, offsets0))
        g_gauss = jax.tree.map(lambda x: x * num_ids, g_gauss)
        g_pmf = jax.tree.map(lambda x: x * num_ids, g_pmf)
        g_off = g_off * num_ids

        lrs = gaussian_lrs(opt_cfg, it, spatial_lr_scale)

        def upd(params, grads, gopt, alive):
            return G.adam_update(params, grads, gopt, lrs, alive)

        new_params, gopt_stack = jax.vmap(upd)(
            states_stack.params, g_gauss, gopt_stack, states_stack.alive)
        states_stack = states_stack.replace(params=new_params)

        u, umf_opt_state = umf_tx.update(g_umf, umf_opt_state, umf_params)
        umf_params = jax.tree.map(lambda p, d: p + d, umf_params, u)
        ema_params = ema_update(ema_params, umf_params, 0.995)

        def pupd(g, o, p):
            d, o2 = pmf_tx.update(g, o, p)
            return jax.tree.map(lambda a, b: a + b, p, d), o2

        pmf_stack, pmf_opt_stack = jax.vmap(pupd)(g_pmf, pmf_opt_stack,
                                                  pmf_stack)

        def dstats(state, goff, radii):
            visible = radii > 0
            state = G.add_densification_stats(state, goff, visible)
            return G.update_max_radii(state, radii, visible)

        states_stack = jax.vmap(dstats)(states_stack, g_off, outs.radii)

        return (states_stack, gopt_stack, umf_params, umf_opt_state,
                pmf_stack, pmf_opt_stack, ema_params, losses)

    step = jax.jit(step_body, donate_argnums=(0, 1, 2, 3, 4, 5, 6))

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5, 6))
    def block(states_stack, gopt_stack, umf_params, umf_opt_state, pmf_stack,
              pmf_opt_stack, ema_params, face_states_stack, face_umf_params,
              batch_stack: FrameBatch, frame_idx_blk, other_ids_blk, its_blk,
              flags_blk: PretrainFlags):
        def one(carry, xs):
            fi, oi, it, flags = xs
            out = step_body(*carry, face_states_stack, face_umf_params,
                            batch_stack, fi, oi, it, flags)
            return out[:-1], out[-1]

        carry, losses = jax.lax.scan(
            one,
            (states_stack, gopt_stack, umf_params, umf_opt_state, pmf_stack,
             pmf_opt_stack, ema_params),
            (frame_idx_blk, other_ids_blk, its_blk, flags_blk))
        return carry + (losses,)

    return step, block


def make_idp_densify(opt_cfg, extent: float):
    """Vmapped clone/split/prune over the identity axis — the serial
    trainer's block-boundary densification under identity sharding."""

    @partial(jax.jit, donate_argnums=(0, 1), static_argnums=(4,))
    def densify(states_stack, gopt_stack, key, min_opacity,
                use_screen_size: bool = False):
        n = states_stack.alive.shape[0]
        keys = jax.random.split(key, n)

        def one(state, gopt, k):
            return G.densify_and_prune(
                state, gopt, k, opt_cfg.densify_grad_threshold, min_opacity,
                extent, 20.0 if use_screen_size else None,
                opt_cfg.percent_dense)

        return jax.vmap(one)(states_stack, gopt_stack, keys)

    return densify
