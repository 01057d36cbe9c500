"""Multi-identity Universal Motion Field pre-training (face + mouth branches).

Reference parity (pretrain_face.py / pretrain_mouth.py, cited inline):
  * one Gaussian cloud + PMF per identity, shared UMF; a random identity is
    drawn every iteration (pretrain_face.py:156)
  * UMF AdamW(5e-3/5e-4, betas .9/.99, eps 1e-8) with LambdaLR
    0.5**(i/select_iter) then 0.1**(i/total) (:81-82) and an EMA(0.995)
    shadow saved as the ema checkpoint (:83,137,429-434)
  * warm phase (<1000·n face / <3000·n mouth) renders *statically* (:257-258)
  * cross-identity contrastive hinge on the positive inner product between
    the current identity's PMF d_xyz and other identities' PMFs evaluated at
    the same (xyz, aud, exp) (:326-343); mouth uses one random other identity
    (pretrain_mouth.py:253-276)
  * face: eye-attn suppression in the lips rect at 5e-3 for both UMF and PMF
    attention maps (:347-354); hair attn 1e-4 (:360-362)
  * mouth: loss on mouth-masked green GT with the (lips ⊻ mouth) band painted
    out (:219-225); greenish splats softened not pruned (:334-346)

TPU design: identity PMFs are *stacked* along a leading axis and the
contrastive term evaluates all of them in one vmap — the serialized per-
identity loop in the reference becomes a single batched network evaluation
(and the natural identity-sharding axis for multi-chip pre-training,
SURVEY.md §5.8). Like the adaptation trainers, steps run in lax.scan blocks
between densification events; the random identity is drawn once per block
(default 25 steps) rather than per step — a coarser interleaving than the
reference's per-iteration shuffle, chosen so each block is one device
program (set identity_block=1 to recover per-step switching at per-step
dispatch cost).
"""

from __future__ import annotations

import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..config import ModelConfig, OptimizationConfig
from ..data.dataset import load_frames, random_init_points, scene_extent
from ..models import gaussians as G
from ..models.motion import (MotionNetwork, MouthMotionNetwork,
                             PersonalizedMotionNetwork)
from ..ops.rasterize import RasterizeConfig
from ..render import render, render_motion, render_motion_mouth
from ..utils.losses import l1_loss, ssim
from ..utils.sh import eval_sh
from .common import FrameBatch, build_frame_batch, gaussian_lrs, rect_mask
from .optim import ema_update, label_tree, pmf_optimizer

GREEN = jnp.array([0.0, 1.0, 0.0], jnp.float32)


@struct.dataclass
class PretrainFlags:
    use_regs: jnp.ndarray    # 0/1, iteration past warm
    hair_paint: jnp.ndarray  # 0/1


def _stack_pmfs(pmf_params_list):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *pmf_params_list)


def _pick(tree, idx):
    return jax.tree.map(lambda x: x[idx], tree)


def _put(tree, idx, sub):
    return jax.tree.map(lambda x, s: x.at[idx].set(s), tree, sub)


def _base_image_loss(image, gt_masked, lambda_dssim):
    return (l1_loss(image, gt_masked)
            + lambda_dssim * (1.0 - ssim(image, gt_masked)))


def make_warm_step(cfg, opt_cfg, spatial_lr_scale, mouth: bool):
    """Static-render warm-up (pretrain_face.py:257-258), scanned block."""

    def step(state, gopt, batch: FrameBatch, i, it):
        cam = batch.camera(i)
        gt = batch.gt_image(i)
        if mouth:
            sel = batch.mouth_mask[i]
        else:
            sel = batch.face_mask[i] | batch.hair_mask[i]
        gt_m = jnp.where(sel[None], gt, GREEN[:, None, None])
        if not mouth:
            gt_m = jnp.where(batch.mouth_mask[i][None], GREEN[:, None, None],
                             gt_m)
        offset0 = jnp.zeros((state.capacity, 2))

        def loss_fn(params, off):
            st = state.replace(params=params)
            out = render(cfg, cam, st, GREEN, means2d_offset=off)
            img = out.image
            if mouth:
                h, w = cfg.image_height, cfg.image_width
                band = rect_mask(h, w, batch.lips_rect[i]) ^ batch.mouth_mask[i]
                img = jnp.where(band[None], GREEN[:, None, None], img)
            return _base_image_loss(img, gt_m, opt_cfg.lambda_dssim), out

        (loss, out), (gp, goff) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.params, offset0)
        lrs = gaussian_lrs(opt_cfg, it, spatial_lr_scale)
        new_p, gopt = G.adam_update(state.params, gp, gopt, lrs, state.alive)
        state = state.replace(params=new_p)
        visible = out.radii > 0
        state = G.add_densification_stats(state, goff, visible)
        state = G.update_max_radii(state, out.radii, visible)
        return state, gopt, loss

    @partial(jax.jit, donate_argnums=(0, 1))
    def block(state, gopt, batch: FrameBatch, idxs, its):
        def one(carry, xs):
            st, go, loss = step(carry[0], carry[1], batch, xs[0], xs[1])
            return (st, go), loss

        (state, gopt), losses = jax.lax.scan(one, (state, gopt), (idxs, its))
        return state, gopt, losses

    return block


def tie_audio_params(pmf_params, umf_params):
    """Substitute the UMF's AudioFeature subtree into a PMF param tree —
    the reference's ``--share_audio_net`` module aliasing
    (pretrain_face.py:79,124-126): PMF audio encoders ARE the UMF's, so
    their gradients flow to (and updates come from) the UMF optimizer."""
    return {"params": {**pmf_params["params"],
                       "audio": umf_params["params"]["audio"]}}


def make_pretrain_face_step(cfg, opt_cfg, umf_net, pmf_net, spatial_lr_scale,
                            num_ids: int, umf_tx, pmf_tx,
                            share_audio_net: bool = False):

    def step(state, gopt, umf_params, umf_opt_state, pmf_stack, pmf_opt_stack,
             ema_params, cur_id, batch: FrameBatch, i, it,
             flags: PretrainFlags):
        cam = batch.camera(i)
        gt = batch.gt_image(i)
        aud = batch.auds[i]
        exp = batch.au_exp[i]
        face_m, hair_m = batch.face_mask[i], batch.hair_mask[i]
        mouth_m = batch.mouth_mask[i]
        head_m = face_m | hair_m
        h, w = cfg.image_height, cfg.image_width
        rect = batch.lips_rect[i]
        lips_m = rect_mask(h, w, rect).astype(jnp.float32)

        pmf_cur = _pick(pmf_stack, cur_id)
        pmf_others = jax.lax.stop_gradient(pmf_stack)
        offset0 = jnp.zeros((state.capacity, 2))

        def loss_fn(gparams, umf_p, pmf_p, off):
            if share_audio_net:
                pmf_p = tie_audio_params(pmf_p, umf_p)
            st = state.replace(params=gparams)
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

            # cross-identity contrastive hinge (pretrain_face.py:326-343):
            # other identities' PMFs at the same (xyz, aud, exp), batched.
            if num_ids > 1:
                xyz = jax.lax.stop_gradient(gparams.xyz)

                def other_dxyz(p_other):
                    if share_audio_net:
                        p_other = tie_audio_params(
                            p_other, jax.lax.stop_gradient(umf_p))
                    return pmf_net.apply(p_other, xyz, aud, exp)["d_xyz"]

                all_dxyz = jax.vmap(other_dxyz)(pmf_others)  # [n, N, 3]
                dots = jnp.sum(all_dxyz * pm["d_xyz"][None], -1)  # [n, N]
                dots = jnp.maximum(dots, 0.0)
                not_self = (jnp.arange(num_ids) != cur_id)[:, None]
                loss += flags.use_regs * jnp.sum(
                    jnp.mean(jnp.where(not_self, dots, 0.0), axis=-1))

            # eye-attention suppression in the lips rect, UMF + PMF (:347-354)
            lsum = jnp.maximum(lips_m.sum(), 1.0)
            loss += flags.use_regs * 5e-3 * (mr.attn[1] * lips_m).sum() / lsum
            loss += flags.use_regs * 5e-3 * (mr.p_attn[1] * lips_m).sum() / lsum

            hmf = hair_m.astype(jnp.float32)
            attn_hair = ((mr.attn[1] * hmf).sum() + (mr.attn[0] * hmf).sum()
                         ) / jnp.maximum(hmf.sum(), 1.0)
            loss += flags.use_regs * (1 - hp) * 1e-4 * attn_hair
            return loss, out

        (loss, out), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3), has_aux=True)(
                state.params, umf_params, pmf_cur, offset0)
        g_gauss, g_umf, g_pmf, g_off = grads

        lrs = gaussian_lrs(opt_cfg, it, spatial_lr_scale)
        new_p, gopt = G.adam_update(state.params, g_gauss, gopt, lrs,
                                    state.alive)
        state = state.replace(params=new_p)

        upd, umf_opt_state = umf_tx.update(g_umf, umf_opt_state, umf_params)
        umf_params = jax.tree.map(lambda p, u: p + u, umf_params, upd)
        ema_params = ema_update(ema_params, umf_params, 0.995)

        pmf_opt_cur = _pick(pmf_opt_stack, cur_id)
        updp, pmf_opt_cur = pmf_tx.update(g_pmf, pmf_opt_cur, pmf_cur)
        pmf_cur = jax.tree.map(lambda p, u: p + u, pmf_cur, updp)
        pmf_stack = _put(pmf_stack, cur_id, pmf_cur)
        pmf_opt_stack = _put(pmf_opt_stack, cur_id, pmf_opt_cur)

        visible = out.radii > 0
        state = G.add_densification_stats(state, g_off, visible)
        state = G.update_max_radii(state, out.radii, visible)
        return (state, gopt, umf_params, umf_opt_state, pmf_stack,
                pmf_opt_stack, ema_params, loss)

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5, 6))
    def block(state, gopt, umf_params, umf_opt_state, pmf_stack,
              pmf_opt_stack, ema_params, cur_id, batch: FrameBatch,
              idxs, its, flags: PretrainFlags):
        def one(carry, xs):
            i, it, flag = xs
            out = step(*carry, cur_id, batch, i, it, flag)
            return out[:-1], out[-1]

        carry, losses = jax.lax.scan(
            one,
            (state, gopt, umf_params, umf_opt_state, pmf_stack,
             pmf_opt_stack, ema_params),
            (idxs, its, flags))
        return carry + (losses,)

    return block


def make_pretrain_mouth_step(cfg, opt_cfg, umf_net, pmf_net, face_net,
                             spatial_lr_scale, num_ids: int, umf_tx, pmf_tx):

    def step(state, gopt, umf_params, umf_opt_state, pmf_stack, pmf_opt_stack,
             ema_params, cur_id, other_id, face_state, face_umf_params,
             batch: FrameBatch, i, it, flags: PretrainFlags):
        cam = batch.camera(i)
        gt = batch.gt_image(i)
        aud = batch.auds[i]
        mouth_m = batch.mouth_mask[i]
        h, w = cfg.image_height, cfg.image_width
        lips_m = rect_mask(h, w, batch.lips_rect[i])

        pmf_cur = _pick(pmf_stack, cur_id)
        face_umf_frozen = jax.tree.map(jax.lax.stop_gradient, face_umf_params)
        offset0 = jnp.zeros((state.capacity, 2))

        def loss_fn(gparams, umf_p, pmf_p, off):
            st = state.replace(params=gparams)
            mr = render_motion_mouth(
                cfg, cam, st,
                mouth_umf=lambda x, a, m: umf_net.apply(umf_p, x, a, m),
                face_state=face_state,
                face_umf=lambda x, a, e: face_net.apply(face_umf_frozen, x, a, e),
                aud=aud, bg=GREEN,
                pmf=lambda x, a: pmf_net.apply(pmf_p, x, a),
                personalized=True, align=False,
                means2d_offset=off)
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

            # contrastive against one random other identity (:253-276)
            if num_ids > 1:
                xyz = jax.lax.stop_gradient(gparams.xyz)
                p_other = jax.lax.stop_gradient(_pick(pmf_stack, other_id))
                other = pmf_net.apply(p_other, xyz, aud)["d_xyz"]
                dots = jnp.maximum(jnp.sum(other * pm["d_xyz"], -1), 0.0)
                loss += flags.use_regs * dots.mean()
            return loss, out

        (loss, out), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3), has_aux=True)(
                state.params, umf_params, pmf_cur, offset0)
        g_gauss, g_umf, g_pmf, g_off = grads

        lrs = gaussian_lrs(opt_cfg, it, spatial_lr_scale)
        new_p, gopt = G.adam_update(state.params, g_gauss, gopt, lrs,
                                    state.alive)
        state = state.replace(params=new_p)
        upd, umf_opt_state = umf_tx.update(g_umf, umf_opt_state, umf_params)
        umf_params = jax.tree.map(lambda p, u: p + u, umf_params, upd)
        ema_params = ema_update(ema_params, umf_params, 0.995)

        pmf_opt_cur = _pick(pmf_opt_stack, cur_id)
        updp, pmf_opt_cur = pmf_tx.update(g_pmf, pmf_opt_cur, pmf_cur)
        pmf_cur = jax.tree.map(lambda p, u: p + u, pmf_cur, updp)
        pmf_stack = _put(pmf_stack, cur_id, pmf_cur)
        pmf_opt_stack = _put(pmf_opt_stack, cur_id, pmf_opt_cur)

        visible = out.radii > 0
        state = G.add_densification_stats(state, g_off, visible)
        state = G.update_max_radii(state, out.radii, visible)
        return (state, gopt, umf_params, umf_opt_state, pmf_stack,
                pmf_opt_stack, ema_params, loss)

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5, 6))
    def block(state, gopt, umf_params, umf_opt_state, pmf_stack,
              pmf_opt_stack, ema_params, cur_id, other_id, face_state,
              face_umf_params, batch: FrameBatch, idxs, its,
              flags: PretrainFlags):
        def one(carry, xs):
            i, it, flag = xs
            out = step(*carry, cur_id, other_id, face_state,
                       face_umf_params, batch, i, it, flag)
            return out[:-1], out[-1]

        carry, losses = jax.lax.scan(
            one,
            (state, gopt, umf_params, umf_opt_state, pmf_stack,
             pmf_opt_stack, ema_params),
            (idxs, its, flags))
        return carry + (losses,)

    return block


def _pad_batches(batches):
    """Pad FrameBatches to a common frame count (repeat last frame) so one
    compiled block serves every identity."""
    fmax = max(b.num_frames for b in batches)

    def pad(b: FrameBatch):
        n = b.num_frames
        if n == fmax:
            return b
        def padleaf(x):
            widths = [(0, fmax - n)] + [(0, 0)] * (x.ndim - 1)
            return jnp.concatenate(
                [x, jnp.repeat(x[-1:], fmax - n, axis=0)], axis=0)
        return jax.tree.map(padleaf, b)

    return [pad(b) for b in batches]


def _load_identity(model_cfg: ModelConfig, name: str, capacity: int,
                   mouth: bool, seed: int, stream: bool = False):
    src = os.path.join(model_cfg.source_path, name)
    records = load_frames(src, "train", model_cfg.audio_extractor, -1)
    if stream:
        from .common import HostFrameStore
        batch = HostFrameStore(records)
    else:
        batch = build_frame_batch(records)
    _, extent = scene_extent(records)
    xyz, colors = random_init_points(model_cfg.init_num, seed)
    if mouth:
        xyz = xyz / 2.0
        xyz[:, 1] -= 0.05                    # pretrain_mouth.py:76-77
    state = G.create_from_points(jnp.asarray(xyz), jnp.asarray(colors),
                                 capacity, model_cfg.sh_degree, extent)
    meta = dict(
        mouth=[r.mouth_bound[2] for r in records],
        blink=[r.blink for r in records],
        au25=[r.au25[0] for r in records],
        au25_pcts=records[0].au25[1:],
        mouth_px=[int(r.mouth_mask.sum()) for r in records],
        mouth_lb=records[0].mouth_bound[0],
        mouth_ub=records[0].mouth_bound[1],
        extent=extent,
    )
    return records, batch, state, meta


def _adaptive_resize(states, gopts, pts, dropped, dropped_seen, cap_max,
                     allow_shrink, tag, keep_slots=False):
    """Per-identity adaptive cloud capacity at log points (see train/face.py:
    padded ops cost by capacity, not live splats — pretrain starts small and
    grows with densification instead of paying resolve_capacity() from step
    one). ``dropped_seen`` is mutated in place (cumulative capacity-dropped
    children counters per identity)."""
    for k in range(len(states)):
        new_cap = G.adaptive_capacity_target(
            int(pts[k]), states[k].capacity, cap_max,
            allow_shrink=allow_shrink and not keep_slots)
        if int(dropped[k]) > dropped_seen[k]:  # saturated inside the window
            new_cap = max(new_cap, min(states[k].capacity * 2, cap_max))
            dropped_seen[k] = int(dropped[k])
        if new_cap != states[k].capacity:
            print(f"[{tag}] id{k} capacity {states[k].capacity} -> "
                  f"{new_cap} (alive {int(pts[k])})", flush=True)
            states[k], gopts[k] = G.pack_resize(states[k], gopts[k], new_cap,
                                                keep_slots=keep_slots)
    return states, gopts


def pretrain_face(model_cfg: ModelConfig, opt_cfg: OptimizationConfig,
                  data_list: list[str], log_every: int = 500, seed: int = 0,
                  warm_per_id: int = 1000, identity_block: int = 25,
                  share_audio_net: bool = False,
                  stream: bool | None = None, stream_threshold: int = 1000,
                  identity_parallel: bool = False):
    """Multi-identity face UMF pre-training (pretrain_face.py).

    ``share_audio_net``: tie every PMF's audio encoders to the UMF's
    (reference --share_audio_net, passed by the esperanto/hubert pretrain
    scripts, scripts/pretrain_con_eo.sh:8 / _hu.sh:8).

    ``stream``: keep frames in host RAM and upload per-block sub-batches
    (double-buffered: device_put of block k+1 overlaps compute of block k).
    Default auto-engages when any identity exceeds ``stream_threshold``
    frames — full-length pre-training videos (minutes at 25 fps) cannot
    live in HBM (the reference's README "Memory Hints" preload story).

    ``identity_parallel``: train every identity simultaneously over an
    ``id`` device mesh (parallel/identity_parallel.py) — one device per
    identity, replicated UMF with all-reduced gradients. Each of the
    ``opt_cfg.iterations`` steps updates all n identities at once (the
    serial path's n iterations with a synchronized UMF update); warm-up
    runs serially per identity first. Requires len(jax.devices()) >= n
    and is exclusive with ``stream``.
    """
    n = len(data_list)
    iterations = opt_cfg.iterations * n
    warm_step = warm_per_id * n
    densify_until = (opt_cfg.iterations - 1000) * n
    select_iter = max((opt_cfg.iterations - 10000) * n, 1)
    select_interval = 15

    cap_max = model_cfg.resolve_capacity()
    adaptive = getattr(model_cfg, "adaptive_capacity", False) \
        and not identity_parallel
    det_slots = getattr(model_cfg, "deterministic_slots", False)
    # padded ops cost by capacity, not live splats: start at a pow2 that
    # fits 2x the init cloud and grow with densification (train/face.py)
    capacity = (G.adaptive_start_capacity(model_cfg.init_num, cap_max)
                if adaptive else cap_max)
    if stream is None:
        import glob as _glob
        stream = any(
            len(_glob.glob(os.path.join(model_cfg.source_path, name,
                                        "gt_imgs", "*.jpg"))) > stream_threshold
            for name in data_list)
    if stream:
        print(f"[pretrain_face] streaming mode: frames stay in host RAM, "
              f"per-block sub-batches upload on demand")
    ids = [_load_identity(model_cfg, name, capacity, False, seed + k,
                          stream=stream)
           for k, name in enumerate(data_list)]
    h, w = ids[0][0][0].height, ids[0][0][0].width
    cfg = RasterizeConfig(h, w, max_per_tile=model_cfg.max_per_tile,
                          approx_topk=model_cfg.approx_topk)

    states = [x[2] for x in ids]
    batches = [x[1] for x in ids]
    metas = [x[3] for x in ids]
    gopts = [G.adam_init(s.params) for s in states]

    umf_net = MotionNetwork(model_cfg.audio_extractor)
    pmf_net = PersonalizedMotionNetwork("face", model_cfg.audio_extractor)
    key = jax.random.key(seed)
    keys = jax.random.split(key, n + 2)
    b0 = batches[0].gather([0]) if stream else batches[0]
    x0, a0, e0 = states[0].params.xyz[:8], b0.auds[0], b0.au_exp[0]
    umf_params = jax.jit(umf_net.init)(keys[0], x0, a0, e0)
    pmf_list = [jax.jit(pmf_net.init)(keys[1 + k], x0, a0, e0)
                for k in range(n)]
    pmf_stack = _stack_pmfs(pmf_list)
    ema_params = jax.tree.map(jnp.array, umf_params)

    # LambdaLR: 0.5**(i/select_iter) before select_iter else 0.1**(i/total)
    def sched_mult(step):
        s = jnp.asarray(step, jnp.float32)
        return jnp.where(s < select_iter, 0.5 ** (s / select_iter),
                         0.1 ** (s / iterations))

    import optax
    from .optim import label_tree as _lt

    def adamw(base_lr, wd):
        return optax.adamw(lambda s: base_lr * sched_mult(s), b1=0.9, b2=0.99,
                           eps=1e-8, weight_decay=wd)
    umf_tx = optax.multi_transform(
        {"net": adamw(5e-4, 0.0), "encoder": adamw(5e-3, 0.01),
         "audio_att": adamw(5e-4 * 5, 1e-4), "align": adamw(5e-4 / 2, 0.0)},
        _lt(umf_params))
    umf_opt_state = jax.jit(umf_tx.init)(umf_params)
    pmf_tx, pmf_opt_one = pmf_optimizer(pmf_list[0])
    pmf_opt_stack = _stack_pmfs([jax.tree.map(jnp.array, pmf_opt_one)
                                 for _ in range(n)])

    extent = metas[0]["extent"]
    if not stream:
        batches = _pad_batches(batches)
    warm = make_warm_step(cfg, opt_cfg, extent, mouth=False)

    if identity_parallel:
        assert not stream, "identity_parallel is exclusive with streaming"
        return _pretrain_face_idp(
            cfg, opt_cfg, umf_net, pmf_net, umf_tx, pmf_tx, umf_opt_state,
            umf_params, ema_params, pmf_stack, pmf_opt_stack, states, gopts,
            batches, metas, data_list, extent, n, warm, warm_per_id,
            log_every, seed, share_audio_net)

    motion_block = make_pretrain_face_step(cfg, opt_cfg, umf_net, pmf_net,
                                           extent, n, umf_tx, pmf_tx,
                                           share_audio_net=share_audio_net)

    rng = np.random.default_rng(seed)
    stacks = [[] for _ in range(n)]
    dropped_seen = [0] * n
    key = keys[-1]
    losses = []
    t0 = time.time()

    interval = opt_cfg.densification_interval
    it = 1
    while it <= iterations:
        block_end = min(iterations,
                        ((it - 1) // identity_block + 1) * identity_block,
                        ((it - 1) // interval + 1) * interval,
                        ((it - 1) // 1000 + 1) * 1000)
        if it < warm_step:
            block_end = min(block_end, warm_step - 1)
        sid = int(rng.integers(n))
        state, gopt, batch, meta = states[sid], gopts[sid], batches[sid], metas[sid]

        steps = list(range(it, block_end + 1))
        idxs = [_sample_face_curriculum(rng, meta, stacks[sid], s_, warm_step,
                                        select_iter, select_interval)
                for s_ in steps]
        its_arr = jnp.asarray(steps, jnp.int32)
        if stream:
            # upload only this block's frames; the device_put overlaps the
            # still-running previous block (losses stay un-materialized)
            batch = batch.gather(idxs)
            idxs_arr = jnp.arange(len(steps), dtype=jnp.int32)
        else:
            idxs_arr = jnp.asarray(idxs, jnp.int32)
        if it < warm_step:
            state, gopt, block_losses = warm(state, gopt, batch, idxs_arr,
                                             its_arr)
        else:
            flags = PretrainFlags(
                use_regs=jnp.asarray([float(s_ > warm_step) for s_ in steps],
                                     jnp.float32),
                hair_paint=jnp.asarray(
                    [float(s_ > warm_step and s_ % 7 != 0) for s_ in steps],
                    jnp.float32))
            (state, gopt, umf_params, umf_opt_state, pmf_stack,
             pmf_opt_stack, ema_params, block_losses) = motion_block(
                state, gopt, umf_params, umf_opt_state, pmf_stack,
                pmf_opt_stack, ema_params, sid, batch, idxs_arr, its_arr,
                flags)
        losses.append(block_losses)        # device array; materialize lazily
        nsteps = len(steps)
        it = block_end + 1
        end = block_end

        if end % 1000 == 0:
            state = G.one_up_sh_degree(state)
        if end < densify_until and end > opt_cfg.densify_from_iter \
                and end % interval == 0:
            key, sub = jax.random.split(key)
            floor = 0.05 + 0.25 * end / densify_until
            state, gopt = G.densify_and_prune(
                state, gopt, sub, opt_cfg.densify_grad_threshold, floor,
                meta["extent"],
                20.0 if end > opt_cfg.opacity_reset_interval else None,
                opt_cfg.percent_dense)
            cam_center = (batch.camera_center[len(idxs) - 1] if stream
                          else batch.camera_center[idxs[-1]])
            state, gopt = _prune_green(state, gopt, cam_center)
        states[sid], gopts[sid] = state, gopt

        if end % log_every < nsteps:
            pts, dropped, *recent = jax.device_get(
                (tuple(s_.num_alive() for s_ in states),
                 tuple(s_.dropped_children for s_ in states),
                 *losses[-max(1, log_every // nsteps):]))
            recent = np.concatenate([np.asarray(b) for b in recent])
            print(f"[pretrain_face {end}/{iterations}] "
                  f"loss={recent.mean():.4f} "
                  f"pts={[int(p) for p in pts]} "
                  f"t={time.time()-t0:.0f}s", flush=True)
            if adaptive:
                states, gopts = _adaptive_resize(
                    states, gopts, pts, dropped, dropped_seen, cap_max,
                    allow_shrink=(end % 2000 < nsteps), tag="pretrain_face",
                    keep_slots=det_slots)

    # ONE device_get (see train/face.py)
    losses = np.concatenate(jax.device_get(losses)).tolist() \
        if losses else []

    if share_audio_net:
        # bake the shared (UMF) audio params into the saved PMFs so
        # downstream consumers see the tensors that were actually used
        aud_tree = umf_params["params"]["audio"]
        pmf_stack = {"params": {
            **pmf_stack["params"],
            "audio": jax.tree.map(
                lambda x: jnp.broadcast_to(x, (n,) + x.shape), aud_tree)}}

    return dict(umf_params=umf_params, ema_params=ema_params,
                umf_opt_state=umf_opt_state,
                pmf_stack=pmf_stack, states=states, gopts=gopts,
                data_list=data_list, losses=losses, cfg=cfg)


def _pretrain_face_idp(cfg, opt_cfg, umf_net, pmf_net, umf_tx, pmf_tx,
                       umf_opt_state, umf_params, ema_params, pmf_stack,
                       pmf_opt_stack, states, gopts, batches, metas,
                       data_list, extent, n, warm, warm_per_id, log_every,
                       seed, share_audio_net):
    """Identity-parallel motion phase of pretrain_face (one device per
    identity; parallel/identity_parallel.py). Warm-up runs serially per
    identity first (the reference's static-render phase), then every step
    trains all n identities at once with the UMF gradient all-reduced.

    Per-identity iteration count equals the serial path's; the UMF sees
    ``opt_cfg.iterations`` large-batch updates instead of ``iterations*n``
    single-identity updates (documented large-batch deviation)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..parallel.identity_parallel import (make_idp_densify,
                                              make_idp_pretrain_step,
                                              stack_identities)

    devs = jax.devices()
    assert len(devs) >= n, (
        f"identity_parallel needs >= {n} devices, have {len(devs)}")
    mesh = Mesh(np.array(devs[:n]), ("id",))

    iterations = opt_cfg.iterations            # per identity
    densify_until = iterations - 1000
    select_iter = max(iterations - 10000, 1)
    interval = opt_cfg.densification_interval
    rng = np.random.default_rng(seed)
    stacks = [[] for _ in range(n)]
    key = jax.random.key(seed + 7)
    t0 = time.time()

    # ---- serial warm-up per identity (static renders) ----
    for sid in range(n):
        it = 1
        while it <= warm_per_id:
            end = min(warm_per_id, it + 99)
            idxs = [_sample_face_curriculum(
                rng, metas[sid], stacks[sid], s_, warm_per_id + 1,
                select_iter, 15) for s_ in range(it, end + 1)]
            states[sid], gopts[sid], _ = warm(
                states[sid], gopts[sid], batches[sid],
                jnp.asarray(idxs, jnp.int32),
                jnp.asarray(range(it, end + 1), jnp.int32))
            it = end + 1

    # ---- stack + shard ----
    id_sh = NamedSharding(mesh, P("id"))
    rep = NamedSharding(mesh, P())
    put = lambda t, s: jax.tree.map(lambda x: jax.device_put(x, s), t)
    states_stack = put(stack_identities(states), id_sh)
    gopt_stack = put(stack_identities(gopts), id_sh)
    batch_stack = put(stack_identities(batches), id_sh)
    pmf_stack = put(pmf_stack, id_sh)
    pmf_opt_stack = put(pmf_opt_stack, id_sh)
    umf_params = put(umf_params, rep)
    umf_opt_state = put(umf_opt_state, rep)
    ema_params = put(ema_params, rep)

    _, blk = make_idp_pretrain_step(cfg, opt_cfg, umf_net, pmf_net, extent,
                                    n, mesh, umf_tx, pmf_tx,
                                    share_audio_net=share_audio_net)
    densify = make_idp_densify(opt_cfg, extent)

    losses = []
    it = 1
    while it <= iterations:
        block_end = min(iterations, ((it - 1) // interval + 1) * interval,
                        ((it - 1) // 1000 + 1) * 1000)
        steps = list(range(it, block_end + 1))
        fidx = np.asarray(
            [[_sample_face_curriculum(rng, metas[i], stacks[i],
                                      warm_per_id + s_, warm_per_id,
                                      select_iter, 15) for i in range(n)]
             for s_ in steps], np.int32)
        flags = PretrainFlags(
            use_regs=jnp.ones((len(steps),), jnp.float32),
            hair_paint=jnp.asarray([float(s_ % 7 != 0) for s_ in steps],
                                   jnp.float32))
        (states_stack, gopt_stack, umf_params, umf_opt_state, pmf_stack,
         pmf_opt_stack, ema_params, blk_losses) = blk(
            states_stack, gopt_stack, umf_params, umf_opt_state, pmf_stack,
            pmf_opt_stack, ema_params, batch_stack,
            jnp.asarray(fidx), jnp.asarray(steps, jnp.int32), flags)
        losses.append(blk_losses)                  # [B, n] device array
        it = block_end + 1
        end = block_end

        if end % 1000 == 0:
            states_stack = jax.vmap(G.one_up_sh_degree)(states_stack)
        if end < densify_until and end > opt_cfg.densify_from_iter \
                and end % interval == 0:
            key, sub = jax.random.split(key)
            floor = 0.05 + 0.25 * end / densify_until
            states_stack, gopt_stack = densify(states_stack, gopt_stack,
                                               sub, floor)
        if end % log_every < len(steps):
            recent = np.asarray(losses[-1])
            print(f"[pretrain_face idp {end}/{iterations}] "
                  f"loss={recent.mean():.4f} "
                  f"pts={np.asarray(jax.vmap(lambda s: s.num_alive())(states_stack)).tolist()} "
                  f"t={time.time()-t0:.0f}s", flush=True)

    loss_flat = np.concatenate([np.asarray(b).mean(-1) for b in losses]) \
        if losses else np.zeros((0,))
    states = [jax.tree.map(lambda x, k=k: x[k], states_stack)
              for k in range(n)]
    gopts = [jax.tree.map(lambda x, k=k: x[k], gopt_stack)
             for k in range(n)]

    if share_audio_net:
        aud_tree = umf_params["params"]["audio"]
        pmf_stack = {"params": {
            **pmf_stack["params"],
            "audio": jax.tree.map(
                lambda x: jnp.broadcast_to(x, (n,) + x.shape), aud_tree)}}

    return dict(umf_params=umf_params, ema_params=ema_params,
                umf_opt_state=umf_opt_state, pmf_stack=pmf_stack,
                states=states, gopts=gopts, data_list=data_list,
                losses=loss_flat.tolist(), cfg=cfg)


def _pretrain_mouth_idp(cfg, opt_cfg, umf_net, pmf_net, face_net, umf_tx,
                        pmf_tx, umf_opt_state, umf_params, ema_params,
                        pmf_stack, pmf_opt_stack, states, gopts, batches,
                        metas, data_list, extent, n, face_states,
                        face_umf_params, warm, warm_per_id, log_every, seed):
    """Identity-parallel motion phase of pretrain_mouth (mirrors
    _pretrain_face_idp; per-identity face clouds stacked, frozen EMA face
    UMF replicated, contrastive partner rotated per step)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..parallel.identity_parallel import (make_idp_densify,
                                              make_idp_pretrain_mouth_step,
                                              stack_identities)
    from .mouth import sample_mouth_curriculum, _soften_green

    devs = jax.devices()
    assert len(devs) >= n, (
        f"identity_parallel needs >= {n} devices, have {len(devs)}")
    mesh = Mesh(np.array(devs[:n]), ("id",))

    iterations = opt_cfg.iterations
    densify_until = iterations - 1000
    select_iter = max(iterations - 10000, 1)
    interval = opt_cfg.densification_interval
    rng = np.random.default_rng(seed)
    stacks = [[] for _ in range(n)]
    key = jax.random.key(seed + 13)
    t0 = time.time()

    for sid in range(n):
        it = 1
        while it <= warm_per_id:
            end = min(warm_per_id, it + 99)
            idxs = [sample_mouth_curriculum(
                rng, metas[sid]["au25"], metas[sid]["au25_pcts"],
                metas[sid]["mouth_px"], stacks[sid], s_, warm_per_id + 1,
                select_iter, 7) for s_ in range(it, end + 1)]
            states[sid], gopts[sid], _ = warm(
                states[sid], gopts[sid], batches[sid],
                jnp.asarray(idxs, jnp.int32),
                jnp.asarray(range(it, end + 1), jnp.int32))
            it = end + 1

    id_sh = NamedSharding(mesh, P("id"))
    rep = NamedSharding(mesh, P())
    put = lambda t, s: jax.tree.map(lambda x: jax.device_put(x, s), t)
    states_stack = put(stack_identities(states), id_sh)
    gopt_stack = put(stack_identities(gopts), id_sh)
    batch_stack = put(stack_identities(batches), id_sh)
    face_states_stack = put(stack_identities(face_states), id_sh)
    pmf_stack = put(pmf_stack, id_sh)
    pmf_opt_stack = put(pmf_opt_stack, id_sh)
    umf_params = put(umf_params, rep)
    umf_opt_state = put(umf_opt_state, rep)
    ema_params = put(ema_params, rep)
    face_umf_params = put(face_umf_params, rep)

    _, blk = make_idp_pretrain_mouth_step(cfg, opt_cfg, umf_net, pmf_net,
                                          face_net, extent, n, mesh,
                                          umf_tx, pmf_tx)
    densify = make_idp_densify(opt_cfg, extent)

    losses = []
    it = 1
    while it <= iterations:
        block_end = min(iterations, ((it - 1) // interval + 1) * interval,
                        ((it - 1) // 1000 + 1) * 1000)
        steps = list(range(it, block_end + 1))
        fidx = np.asarray(
            [[sample_mouth_curriculum(
                rng, metas[i]["au25"], metas[i]["au25_pcts"],
                metas[i]["mouth_px"], stacks[i], warm_per_id + s_,
                warm_per_id, select_iter, 7) for i in range(n)]
             for s_ in steps], np.int32)
        others = np.asarray(
            [[(i + 1 + int(rng.integers(max(n - 1, 1)))) % n if n > 1 else i
              for i in range(n)] for _ in steps], np.int32)
        flags = PretrainFlags(
            use_regs=jnp.ones((len(steps),), jnp.float32),
            hair_paint=jnp.zeros((len(steps),), jnp.float32))
        (states_stack, gopt_stack, umf_params, umf_opt_state, pmf_stack,
         pmf_opt_stack, ema_params, blk_losses) = blk(
            states_stack, gopt_stack, umf_params, umf_opt_state, pmf_stack,
            pmf_opt_stack, ema_params, face_states_stack, face_umf_params,
            batch_stack, jnp.asarray(fidx), jnp.asarray(others),
            jnp.asarray(steps, jnp.int32), flags)
        losses.append(blk_losses)
        it = block_end + 1
        end = block_end

        if end % 1000 == 0:
            states_stack = jax.vmap(G.one_up_sh_degree)(states_stack)
        if end < densify_until and end > opt_cfg.densify_from_iter \
                and end % interval == 0:
            key, sub = jax.random.split(key)
            floor = 0.05 + 0.25 * end / max(densify_until, 1)
            states_stack, gopt_stack = densify(states_stack, gopt_stack,
                                               sub, floor)
            # green soften (not prune — pretrain_mouth.py:334-346), vmapped
            cams = batch_stack.camera_center[
                jnp.arange(n), jnp.asarray(fidx[-1])]
            states_stack = jax.vmap(_soften_green)(states_stack, cams)
        if end % log_every < len(steps):
            recent = np.asarray(losses[-1])
            print(f"[pretrain_mouth idp {end}/{iterations}] "
                  f"loss={recent.mean():.4f} t={time.time()-t0:.0f}s",
                  flush=True)

    loss_flat = np.concatenate([np.asarray(b).mean(-1) for b in losses]) \
        if losses else np.zeros((0,))
    states = [jax.tree.map(lambda x, k=k: x[k], states_stack)
              for k in range(n)]
    gopts = [jax.tree.map(lambda x, k=k: x[k], gopt_stack)
             for k in range(n)]
    return dict(umf_params=umf_params, ema_params=ema_params,
                umf_opt_state=umf_opt_state, pmf_stack=pmf_stack,
                states=states, gopts=gopts, data_list=data_list,
                losses=loss_flat.tolist(), cfg=cfg)


def _sample_face_curriculum(rng, meta, stack, it, warm_step, select_iter,
                            select_interval):
    n_frames = len(meta["mouth"])
    if not stack:
        stack.extend(range(n_frames))
    idx = stack.pop(int(rng.integers(len(stack))))
    if it % select_interval != 0:
        return idx
    step_rate = 1.0 / max(select_iter, 1)
    if it < warm_step:
        lb, ub = meta["mouth_lb"], meta["mouth_ub"]
        lb = lb + (ub - lb) * 0.2
        window = (ub - lb) * 0.2                 # pretrain_face.py:176
        lo = lb + step_rate * it * (ub - lb)
        hi = lo + window
        lo -= window
        vals = meta["mouth"]
    else:
        window = 0.3                              # :205
        lo = step_rate * it
        hi = lo + window
        lo -= window * 0.5
        vals = meta["blink"]
    for _ in range(100):
        if lo <= vals[idx] <= hi:
            return idx
        if not stack:
            stack.extend(range(n_frames))
        idx = stack.pop(int(rng.integers(len(stack))))
    return idx


@jax.jit
def _prune_green(state, opt, campos):
    feats = state.get_features()
    dirs = state.params.xyz - campos[None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    colors = jnp.maximum(
        eval_sh(state.max_sh_degree, jnp.swapaxes(feats, -1, -2), dirs) + 0.5, 0.0)
    green = ((colors[:, 0] < 30 / 255) & (colors[:, 1] > 225 / 255)
             & (colors[:, 2] < 30 / 255))
    return G.prune_mask(state, opt, green)


def pretrain_mouth(model_cfg: ModelConfig, opt_cfg: OptimizationConfig,
                   data_list: list[str], face_result: dict,
                   log_every: int = 500, seed: int = 0,
                   warm_per_id: int = 3000, identity_block: int = 25,
                   identity_parallel: bool = False,
                   stream: bool | None = None, stream_threshold: int = 1000):
    """Multi-identity mouth UMF pre-training (pretrain_mouth.py); consumes
    the face pre-training result (per-identity face clouds + EMA face UMF).

    ``identity_parallel``: train all identities per step over an ``id``
    device mesh (see pretrain_face); per-identity face clouds ride the
    stack, the frozen EMA face UMF is replicated.
    ``stream``: host-RAM frames with per-block uploads, like pretrain_face
    (auto-engages past ``stream_threshold`` frames; README Memory Hints)."""
    n = len(data_list)
    iterations = opt_cfg.iterations * n
    warm_step = warm_per_id * n
    densify_until = (opt_cfg.iterations - 1000) * n
    select_iter = max((opt_cfg.iterations - 10000) * n, 1)
    select_interval = 7

    cap_max = model_cfg.resolve_capacity()
    adaptive = getattr(model_cfg, "adaptive_capacity", False) \
        and not identity_parallel
    det_slots = getattr(model_cfg, "deterministic_slots", False)
    capacity = (G.adaptive_start_capacity(model_cfg.init_num, cap_max)
                if adaptive else cap_max)  # see _adaptive_resize
    if stream is None:
        import glob as _glob
        stream = any(
            len(_glob.glob(os.path.join(model_cfg.source_path, name,
                                        "gt_imgs", "*.jpg"))) > stream_threshold
            for name in data_list)
    if stream:
        print("[pretrain_mouth] streaming mode: frames stay in host RAM, "
              "per-block sub-batches upload on demand")
    ids = [_load_identity(model_cfg, name, capacity, True, seed + 7 * k,
                          stream=stream)
           for k, name in enumerate(data_list)]
    h, w = ids[0][0][0].height, ids[0][0][0].width
    cfg = RasterizeConfig(h, w, max_per_tile=model_cfg.max_per_tile,
                          approx_topk=model_cfg.approx_topk)

    states = [x[2] for x in ids]
    batches = [x[1] for x in ids]
    metas = [x[3] for x in ids]
    gopts = [G.adam_init(s.params) for s in states]

    # frozen per-identity face clouds + EMA face UMF (pretrain_mouth.py:80-98)
    face_states = face_result["states"]
    face_umf_params = face_result["ema_params"]

    umf_net = MouthMotionNetwork(model_cfg.audio_extractor)
    pmf_net = PersonalizedMotionNetwork("mouth", model_cfg.audio_extractor)
    face_net = MotionNetwork(model_cfg.audio_extractor)

    key = jax.random.key(seed + 99)
    keys = jax.random.split(key, n + 2)
    b0 = batches[0].gather([0]) if stream else batches[0]
    x0, a0 = states[0].params.xyz[:8], b0.auds[0]
    umf_params = jax.jit(umf_net.init)(keys[0], x0, a0, jnp.zeros((1, 3)))
    pmf_list = [jax.jit(pmf_net.init)(keys[1 + k], x0, a0)
                for k in range(n)]
    pmf_stack = _stack_pmfs(pmf_list)
    ema_params = jax.tree.map(jnp.array, umf_params)

    import optax

    def sched_mult(step):
        s = jnp.asarray(step, jnp.float32)
        return jnp.where(s < select_iter, 0.5 ** (s / select_iter),
                         0.1 ** (s / iterations))

    def adamw(base_lr, wd):
        return optax.adamw(lambda s: base_lr * sched_mult(s), b1=0.9, b2=0.99,
                           eps=1e-8, weight_decay=wd)
    umf_tx = optax.multi_transform(
        {"net": adamw(5e-4, 0.0), "encoder": adamw(5e-3, 0.01),
         "audio_att": adamw(5e-4 * 5, 1e-4), "align": adamw(5e-4 / 2, 0.0)},
        label_tree(umf_params))
    umf_opt_state = jax.jit(umf_tx.init)(umf_params)
    pmf_tx, pmf_opt_one = pmf_optimizer(pmf_list[0])
    pmf_opt_stack = _stack_pmfs([jax.tree.map(jnp.array, pmf_opt_one)
                                 for _ in range(n)])

    extent = metas[0]["extent"]
    if not stream:
        batches = _pad_batches(batches)
    warm = make_warm_step(cfg, opt_cfg, extent, mouth=True)

    if identity_parallel:
        assert not stream, "identity_parallel is exclusive with streaming"
        # A serial pretrain_face run with adaptive capacity (the default)
        # leaves per-identity face clouds at different capacities;
        # stack_identities needs homogeneous shapes — pad every cloud to
        # the max capacity (exact: dead-slot padding only).
        caps = sorted({s.capacity for s in face_states})
        if len(caps) > 1:
            print(f"[pretrain_mouth] padding face clouds {caps} -> "
                  f"{caps[-1]} for identity stacking", flush=True)
            face_states = [G.pack_resize_state(s, caps[-1])
                           for s in face_states]
        assert len({s.capacity for s in states}) == 1
        return _pretrain_mouth_idp(
            cfg, opt_cfg, umf_net, pmf_net, face_net, umf_tx, pmf_tx,
            umf_opt_state, umf_params, ema_params, pmf_stack, pmf_opt_stack,
            states, gopts, batches, metas, data_list, extent, n,
            face_states, face_umf_params, warm, warm_per_id, log_every,
            seed)

    motion_block = make_pretrain_mouth_step(cfg, opt_cfg, umf_net, pmf_net,
                                            face_net, extent, n, umf_tx,
                                            pmf_tx)

    from .mouth import sample_mouth_curriculum, _soften_green
    rng = np.random.default_rng(seed)
    stacks = [[] for _ in range(n)]
    dropped_seen = [0] * n
    key = keys[-1]
    losses = []
    t0 = time.time()

    interval = opt_cfg.densification_interval
    it = 1
    while it <= iterations:
        block_end = min(iterations,
                        ((it - 1) // identity_block + 1) * identity_block,
                        ((it - 1) // interval + 1) * interval,
                        ((it - 1) // 1000 + 1) * 1000)
        if it < warm_step:
            block_end = min(block_end, warm_step - 1)
        sid = int(rng.integers(n))
        state, gopt, batch, meta = states[sid], gopts[sid], batches[sid], metas[sid]

        steps = list(range(it, block_end + 1))
        idxs = [sample_mouth_curriculum(
            rng, meta["au25"], meta["au25_pcts"], meta["mouth_px"],
            stacks[sid], s_, warm_step, select_iter, select_interval)
            for s_ in steps]
        its_arr = jnp.asarray(steps, jnp.int32)
        if stream:
            # upload only this block's frames (see pretrain_face)
            batch = batch.gather(idxs)
            idxs_arr = jnp.arange(len(steps), dtype=jnp.int32)
        else:
            idxs_arr = jnp.asarray(idxs, jnp.int32)
        if it < warm_step:
            state, gopt, block_losses = warm(state, gopt, batch, idxs_arr,
                                             its_arr)
        else:
            other = sid if n == 1 else int(rng.choice(
                [k for k in range(n) if k != sid]))
            flags = PretrainFlags(
                use_regs=jnp.asarray([float(s_ > warm_step) for s_ in steps],
                                     jnp.float32),
                hair_paint=jnp.zeros(len(steps), jnp.float32))
            (state, gopt, umf_params, umf_opt_state, pmf_stack,
             pmf_opt_stack, ema_params, block_losses) = motion_block(
                state, gopt, umf_params, umf_opt_state, pmf_stack,
                pmf_opt_stack, ema_params, sid, other, face_states[sid],
                face_umf_params, batch, idxs_arr, its_arr, flags)
        losses.append(block_losses)        # device array; materialize lazily
        nsteps = len(steps)
        it = block_end + 1
        end = block_end

        if end % 1000 == 0:
            state = G.one_up_sh_degree(state)
        if end < densify_until and end > opt_cfg.densify_from_iter \
                and end % interval == 0:
            key, sub = jax.random.split(key)
            floor = 0.05 + 0.25 * end / densify_until
            state, gopt = G.densify_and_prune(
                state, gopt, sub, opt_cfg.densify_grad_threshold, floor,
                meta["extent"],
                20.0 if end > opt_cfg.opacity_reset_interval else None,
                opt_cfg.percent_dense)
            # host-side index (int(idxs_arr[-1]) would sync on the queued
            # block — see train/face.py)
            cam_center = (batch.camera_center[len(idxs) - 1] if stream
                          else batch.camera_center[idxs[-1]])
            state = _soften_green(state, cam_center)
        states[sid], gopts[sid] = state, gopt

        if end % log_every < nsteps:
            pts, dropped, *recent = jax.device_get(
                (tuple(s_.num_alive() for s_ in states),
                 tuple(s_.dropped_children for s_ in states),
                 *losses[-max(1, log_every // nsteps):]))
            recent = np.concatenate([np.asarray(b) for b in recent])
            print(f"[pretrain_mouth {end}/{iterations}] "
                  f"loss={recent[-log_every:].mean():.4f} "
                  f"pts={[int(p) for p in pts]} "
                  f"t={time.time()-t0:.0f}s", flush=True)
            if adaptive:
                states, gopts = _adaptive_resize(
                    states, gopts, pts, dropped, dropped_seen, cap_max,
                    allow_shrink=(end % 2000 < nsteps),
                    tag="pretrain_mouth", keep_slots=det_slots)

    # ONE device_get (see train/face.py)
    losses = np.concatenate(jax.device_get(losses)).tolist() \
        if losses else []
    return dict(umf_params=umf_params, ema_params=ema_params,
                umf_opt_state=umf_opt_state, pmf_stack=pmf_stack,
                states=states, gopts=gopts, data_list=data_list,
                losses=losses, cfg=cfg)
