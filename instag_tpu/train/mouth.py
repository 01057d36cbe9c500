"""Few-shot mouth-interior adaptation trainer (reference train_mouth.py).

Loads the pre-trained mouth UMF and the *trained* face checkpoint (frozen) —
the face UMF's per-frame motion range conditions the mouth field
(render_motion_mouth, k drawn uniformly from [10, 50] per step, :175-179).

Specifics (cited from train_mouth.py):
  * init cloud squeezed toward the mouth: xyz/2, y -= 0.05 (:77-79)
  * AU25-percentile curriculum, large-open frames first (:125-148), plus a
    mouth-mask >= 20 px visibility filter (:145-148)
  * loss: L1+0.2(1-SSIM) on the mouth-masked green image with the
    (lips_rect ⊻ mouth_mask) band painted background (:212-215); after warm:
    PMF p_xyz reg 1e-5 and lips-rect alpha loss 1e-3 (:218-221)
  * greenish splats are softened, not pruned: grad-accum halved, opacity
    reset to 0.1, raw scales /10 (:276-280)
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..config import ModelConfig, OptimizationConfig
from ..data.dataset import random_init_points, scene_extent
from ..models import gaussians as G
from ..models.motion import (MotionNetwork, MouthMotionNetwork,
                             PersonalizedMotionNetwork)
from ..ops.rasterize import RasterizeConfig
from ..render import render_motion_mouth
from ..utils.general import inverse_sigmoid
from ..utils.losses import l1_loss, ssim
from ..utils.sh import eval_sh
from .common import FrameBatch, build_frame_batch, gaussian_lrs, rect_mask
from .optim import pmf_optimizer, umf_optimizer

GREEN = jnp.array([0.0, 1.0, 0.0], jnp.float32)


@struct.dataclass
class MouthFlags:
    align: jnp.ndarray      # 0/1
    use_regs: jnp.ndarray   # 0/1
    valid: jnp.ndarray      # 0 on block-padding steps (see train/face.py)


def make_mouth_block(cfg: RasterizeConfig, opt_cfg, mouth_net, pmf_net,
                     face_net, spatial_lr_scale, umf_tx, pmf_tx,
                     dp: int = 1, mesh=None):
    """Jitted multi-step mouth training block (lax.scan over steps; see
    train/face.py for the loop-structure rationale).

    ``dp=B``: every scan step consumes a ``[B]`` row of frame indices and
    vmaps the FULL per-frame loss over them (one shared k per step),
    updating once with the mean gradient and accumulating densification
    stats as the per-frame SUM — exactly like make_face_block(dp=B). With
    ``mesh`` the gathered rows shard over the 'dp' axis (model replicated,
    grads all-reduce over ICI). ``dp=1`` keeps the un-vmapped serial graph
    (the vmap-over-1 penalty, BASELINE.md r3)."""
    h, w = cfg.image_height, cfg.image_width
    row_sharding = None
    if dp > 1:
        # vmapped lax.cond runs BOTH scatter branches; pick the full
        # scatter statically for the DP path (rasterize.scatter_mode)
        import dataclasses as _dc
        cfg = _dc.replace(cfg, scatter_mode="full")
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        row_sharding = NamedSharding(mesh, PartitionSpec("dp"))

    def step_loss(st, umf_p, pmf_p, off, face_state, face_umf_frozen,
                  batch: FrameBatch, i, k, flags: MouthFlags):
        cam = batch.camera(i)
        gt = batch.gt_image(i)
        aud = batch.auds[i]
        mouth_m = batch.mouth_mask[i]
        rect = batch.lips_rect[i]
        lips_m = rect_mask(h, w, rect)

        mr = render_motion_mouth(
            cfg, cam, st,
            mouth_umf=lambda x, a, m: mouth_net.apply(umf_p, x, a, m),
            face_state=face_state,
            face_umf=lambda x, a, e: face_net.apply(face_umf_frozen, x, a, e),
            aud=aud, bg=GREEN,
            pmf=lambda x, a: pmf_net.apply(pmf_p, x, a),
            personalized=False, align=flags.align, k=k,
            means2d_offset=off)
        out = mr.out
        image = out.image
        alpha = out.alpha

        gt_green = jnp.where(mouth_m[None], gt, GREEN[:, None, None])
        band = lips_m ^ mouth_m
        img = jnp.where(band[None], GREEN[:, None, None], image)

        loss = l1_loss(img, gt_green)
        loss += opt_cfg.lambda_dssim * (1.0 - ssim(img, gt_green))
        loss += flags.use_regs * 1e-5 * jnp.abs(mr.p_motion["p_xyz"]).mean()
        lm = lips_m[None].astype(jnp.float32)
        loss += flags.use_regs * 1e-3 * (
            ((1 - alpha) * lm).mean() + (alpha * (1 - lm)).mean())
        return loss, out

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5))
    def block(state, gopt, umf_params, umf_opt_state, pmf_params,
              pmf_opt_state, face_state, face_umf_params, batch: FrameBatch,
              idxs, its, ks, flags: MouthFlags):
        def one(carry, xs):
            (state, gopt, umf_params, umf_opt_state, pmf_params,
             pmf_opt_state) = carry
            i, it, k, flag = xs              # i: [B] frame indices
            face_umf_frozen = jax.tree.map(jax.lax.stop_gradient,
                                           face_umf_params)

            if dp == 1:
                offset0 = jnp.zeros((state.capacity, 2))

                def loss_fn(gparams, umf_p, pmf_p, off):
                    return step_loss(state.replace(params=gparams), umf_p,
                                     pmf_p, off, face_state, face_umf_frozen,
                                     batch, i[0], k, flag)
            else:
                offset0 = jnp.zeros((dp, state.capacity, 2))
                rows = jax.tree.map(lambda x: x[i], batch)
                if row_sharding is not None:
                    rows = jax.tree.map(
                        lambda x: jax.lax.with_sharding_constraint(
                            x, row_sharding), rows)
                    offset0 = jax.lax.with_sharding_constraint(
                        offset0, row_sharding)

                def loss_fn(gparams, umf_p, pmf_p, off):
                    st = state.replace(params=gparams)

                    def per_frame(row, off_b):
                        return step_loss(
                            st, umf_p, pmf_p, off_b, face_state,
                            face_umf_frozen,
                            jax.tree.map(lambda x: x[None], row), 0, k, flag)

                    losses, outs = jax.vmap(per_frame)(rows, off)
                    return jnp.mean(losses), outs

            (loss, out), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2, 3), has_aux=True)(
                    state.params, umf_params, pmf_params, offset0)
            g_gauss, g_umf, g_pmf, g_off = grads

            lrs = gaussian_lrs(opt_cfg, it, spatial_lr_scale)
            new_params, new_gopt = G.adam_update(state.params, g_gauss, gopt,
                                                 lrs, state.alive)
            new_state = state.replace(params=new_params)
            upd, new_umf_opt = umf_tx.update(g_umf, umf_opt_state, umf_params)
            new_umf = jax.tree.map(lambda p, u: p + u, umf_params, upd)
            updp, new_pmf_opt = pmf_tx.update(g_pmf, pmf_opt_state,
                                              pmf_params)
            new_pmf = jax.tree.map(lambda p, u: p + u, pmf_params, updp)

            visible = out.radii > 0                  # [B, N] ([N] serial)
            if dp == 1:
                new_state = G.add_densification_stats(new_state, g_off,
                                                      visible)
                new_state = G.update_max_radii(new_state, out.radii, visible)
            else:
                # undo the mean-loss 1/B on the offset grads so accumulated
                # per-frame norms equal B serial steps (train/face.py)
                new_state = G.add_densification_stats_batch(
                    new_state, g_off * dp, visible)
                new_state = G.update_max_radii_batch(new_state, out.radii,
                                                     visible)

            new_carry = (new_state, new_gopt, new_umf, new_umf_opt, new_pmf,
                         new_pmf_opt)
            carry = jax.tree.map(
                lambda n, o: jnp.where(flag.valid > 0, n, o), new_carry,
                (state, gopt, umf_params, umf_opt_state, pmf_params,
                 pmf_opt_state))
            return carry, loss

        carry, losses = jax.lax.scan(
            one,
            (state, gopt, umf_params, umf_opt_state, pmf_params,
             pmf_opt_state),
            (idxs, its, ks, flags))
        return carry + (losses,)

    return block


@jax.jit
def _soften_green(state: G.GaussianState, campos):
    """Greenish mouth splats are softened (train_mouth.py:276-280)."""
    feats = state.get_features()
    dirs = state.params.xyz - campos[None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    colors = jnp.maximum(
        eval_sh(state.max_sh_degree, jnp.swapaxes(feats, -1, -2), dirs) + 0.5, 0.0)
    green = ((colors[:, 0] < 100 / 255) & (colors[:, 1] > 180 / 255)
             & (colors[:, 2] < 100 / 255)) & state.alive
    accum = jnp.where(green, state.xyz_grad_accum / 2, state.xyz_grad_accum)
    opacity = jnp.where(green[:, None],
                        inverse_sigmoid(jnp.full_like(state.params.opacity, 0.1)),
                        state.params.opacity)
    scaling = jnp.where(green[:, None], state.params.scaling / 10,
                        state.params.scaling)
    params = state.params.replace(opacity=opacity, scaling=scaling)
    return state.replace(params=params, xyz_grad_accum=accum)


def sample_mouth_curriculum(rng, au25_vals, au25_pcts, mouth_px, stack, it,
                            warm_step, iterations, select_interval=5):
    """AU25 curriculum: widest-open frames first, window sliding down
    (train_mouth.py:125-148)."""
    if not stack:
        stack.extend(range(len(au25_vals)))
    idx = stack.pop(int(rng.integers(len(stack))))
    lb_g, ub_g = au25_pcts[0], au25_pcts[2]   # p25, p75
    mouth_step = 1.0 / max(iterations, 1)
    tries = 0

    def redraw():
        nonlocal idx
        if not stack:
            stack.extend(range(len(au25_vals)))
        idx = stack.pop(int(rng.integers(len(stack))))

    if it < warm_step:
        while au25_vals[idx] < ub_g and tries < 200:
            redraw(); tries += 1
    elif it % select_interval == 0:
        au_ub = ub_g
        au_lb = au_ub - mouth_step * it * (ub_g - lb_g)
        while (au25_vals[idx] < au_lb or au25_vals[idx] > au_ub) and tries < 200:
            redraw(); tries += 1
    tries = 0
    while mouth_px[idx] < 20 and tries < 200:
        redraw(); tries += 1
    return idx


def train_mouth(model_cfg: ModelConfig, opt_cfg: OptimizationConfig,
                face_bundle: dict, pretrain_bundle: dict | None = None,
                long: bool = False, log_every: int = 500,
                warm_step: int = 3000, seed: int = 0,
                resume_bundle: dict | None = None,
                stream: bool | None = None, stream_threshold: int = 1000,
                data_parallel: int = 1, dp_mesh=None):
    from .common import HostFrameStore, load_training_frames
    records = load_training_frames(model_cfg)
    if stream is None:
        stream = len(records) > stream_threshold  # --long full-video clips
    if stream:
        print("[train_mouth] streaming mode: frames stay in host RAM")
        batch = HostFrameStore(records)
    else:
        batch = build_frame_batch(records)
    _, extent = scene_extent(records)
    h, w = records[0].height, records[0].width
    cfg = RasterizeConfig(h, w, max_per_tile=model_cfg.max_per_tile,
                          approx_topk=model_cfg.approx_topk)

    iterations = opt_cfg.iterations
    densify_until = iterations - 1000 if not long else opt_cfg.densify_until_iter

    cap_max = model_cfg.resolve_capacity()
    adaptive = getattr(model_cfg, "adaptive_capacity", False)
    det_slots = getattr(model_cfg, "deterministic_slots", False)
    capacity = (G.adaptive_start_capacity(model_cfg.init_num, cap_max)
                if adaptive else cap_max)  # see train/face.py
    xyz, colors = random_init_points(model_cfg.init_num, seed)
    xyz = xyz / 2.0
    xyz[:, 1] -= 0.05                       # squeeze toward mouth (:77-79)
    state = G.create_from_points(jnp.asarray(xyz), jnp.asarray(colors),
                                 capacity, model_cfg.sh_degree, extent)
    gopt = G.adam_init(state.params)

    mouth_net = MouthMotionNetwork(model_cfg.audio_extractor)
    pmf_net = PersonalizedMotionNetwork("mouth", model_cfg.audio_extractor)
    face_net = MotionNetwork(model_cfg.audio_extractor)

    key = jax.random.key(seed)
    k1, k2, key = jax.random.split(key, 3)
    b0 = batch.gather([0]) if stream else batch
    x0, a0 = state.params.xyz[:8], b0.auds[0]
    mv0 = jnp.zeros((1, 3))
    umf_params = jax.jit(mouth_net.init)(k1, x0, a0, mv0)
    if pretrain_bundle is not None:
        umf_params = jax.tree.map(jnp.asarray, pretrain_bundle["umf_params"])
    pmf_params = jax.jit(pmf_net.init)(k2, x0, a0)

    face_state: G.GaussianState = face_bundle["state"]
    face_umf_params = face_bundle["umf_params"]

    umf_tx, umf_opt_state = umf_optimizer(
        umf_params, total_iters=iterations, warm_step=warm_step, long=long)
    pmf_tx, pmf_opt_state = pmf_optimizer(pmf_params)

    first_iter = 1
    if resume_bundle is not None:
        from ..io.checkpoints import restore_like, state_from_dict
        state = state_from_dict(resume_bundle["state"])
        gopt = restore_like(gopt, resume_bundle["gopt"])
        umf_params = jax.tree.map(jnp.asarray, resume_bundle["umf_params"])
        pmf_params = jax.tree.map(jnp.asarray, resume_bundle["pmf_params"])
        if "umf_opt_state" in resume_bundle:
            umf_opt_state = restore_like(umf_opt_state,
                                         resume_bundle["umf_opt_state"])
        if "pmf_opt_state" in resume_bundle:
            pmf_opt_state = restore_like(pmf_opt_state,
                                         resume_bundle["pmf_opt_state"])
        first_iter = int(resume_bundle.get("iteration", 0)) + 1

    block = make_mouth_block(cfg, opt_cfg, mouth_net, pmf_net, face_net,
                             extent, umf_tx, pmf_tx, dp=data_parallel,
                             mesh=dp_mesh)

    au25_vals = [r.au25[0] for r in records]
    au25_pcts = records[0].au25[1:]
    mouth_px = [int(r.mouth_mask.sum()) for r in records]
    rng = np.random.default_rng(seed)
    stack: list[int] = []
    losses = []
    dropped_seen = 0
    t0 = time.time()

    interval = opt_cfg.densification_interval
    it = first_iter
    while it <= iterations:
        block_end = min(iterations, ((it - 1) // interval + 1) * interval,
                        ((it - 1) // 1000 + 1) * 1000)
        idxs, its_arr, ks, al, ur = [], [], [], [], []
        for step_i in range(it, block_end + 1):
            idxs.append([sample_mouth_curriculum(
                rng, au25_vals, au25_pcts, mouth_px, stack, step_i,
                warm_step, iterations, 7 if long else 5)
                for _ in range(data_parallel)])
            its_arr.append(step_i)
            ks.append(int(rng.integers(10, 51)))     # :175
            al.append(float(step_i > 1000))
            ur.append(float(step_i > warm_step))
        n = block_end - it + 1
        va = [1.0] * n
        if n < interval:  # pad to the single compiled block shape
            padn = interval - n
            idxs += [idxs[-1]] * padn
            its_arr += [block_end] * padn
            ks += [10] * padn
            al += [0.0] * padn
            ur += [0.0] * padn
            va += [0.0] * padn
        flags = MouthFlags(align=jnp.asarray(al, jnp.float32),
                           use_regs=jnp.asarray(ur, jnp.float32),
                           valid=jnp.asarray(va, jnp.float32))
        if stream:
            flat = [j for row in idxs for j in row]
            blk_batch = batch.gather(flat)
            idx_arr = jnp.arange(len(flat), dtype=jnp.int32).reshape(
                len(idxs), data_parallel)
        else:
            blk_batch = batch
            idx_arr = jnp.asarray(idxs, jnp.int32)   # [n, B]
        (state, gopt, umf_params, umf_opt_state, pmf_params, pmf_opt_state,
         block_losses) = block(
            state, gopt, umf_params, umf_opt_state, pmf_params,
            pmf_opt_state, face_state, face_umf_params, blk_batch,
            idx_arr, jnp.asarray(its_arr, jnp.int32),
            jnp.asarray(ks, jnp.int32), flags)
        losses.append(block_losses[:n])    # lazy (see train/face.py)
        it = block_end + 1
        end = block_end

        if end % 1000 == 0:
            state = G.one_up_sh_degree(state)
        if end < densify_until and end > opt_cfg.densify_from_iter \
                and end % interval == 0:
            key, sub = jax.random.split(key)
            floor = 0.05 + 0.25 * end / max(densify_until, 1)
            state, gopt = G.densify_and_prune(
                state, gopt, sub, opt_cfg.densify_grad_threshold, floor,
                extent, 20.0 if end > opt_cfg.opacity_reset_interval else None,
                opt_cfg.percent_dense)
            if end > 2000:
                # host-side index (int(idx_arr[-1]) would sync on the whole
                # queued block — see train/face.py)
                li = (len(idxs) * data_parallel - 1) if stream \
                    else idxs[-1][-1]
                state = _soften_green(state, blk_batch.camera_center[li])
        if (not long) and end % opt_cfg.opacity_reset_interval == 0 \
                and end < densify_until:
            state, gopt = G.reset_opacity(state, gopt)

        if end % log_every < n:
            dropped, n_alive, *recent = jax.device_get(
                (state.dropped_children, state.num_alive(),
                 *losses[-max(1, log_every // interval):]))
            recent = np.concatenate([np.asarray(b) for b in recent])
            print(f"[mouth {end}/{iterations}] loss="
                  f"{recent[-log_every:].mean():.4f} "
                  f"pts={int(n_alive)} t={time.time()-t0:.0f}s",
                  flush=True)
            if adaptive:
                new_cap = G.adaptive_capacity_target(
                    int(n_alive), state.capacity, cap_max,
                    allow_shrink=(end % 2000 < n) and not det_slots)
                if int(dropped) > dropped_seen:
                    new_cap = max(new_cap, min(state.capacity * 2, cap_max))
                    dropped_seen = int(dropped)
                if new_cap != state.capacity:
                    print(f"[mouth] capacity {state.capacity} -> {new_cap} "
                          f"(alive {int(n_alive)})", flush=True)
                    state, gopt = G.pack_resize(state, gopt, new_cap,
                                                keep_slots=det_slots)

    # ONE device_get: per-block np.asarray would pay a tunnel RPC per block
    losses = np.concatenate(jax.device_get(losses)).tolist() \
        if losses else []
    return dict(state=state, gopt=gopt, umf_params=umf_params,
                umf_opt_state=umf_opt_state, pmf_params=pmf_params,
                pmf_opt_state=pmf_opt_state, losses=losses, cfg=cfg,
                extent=extent)
