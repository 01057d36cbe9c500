"""Joint fusion fine-tune (reference train_fuse_con.py): 2000 iterations,
no densification, motion nets and geometry frozen — only appearance trains
(face features/opacity, mouth features; :149-164 with bg_iter=0) with the
opacity LR overridden to 1e-3 by the pipeline scripts.

Composite (:125-144): mouth over per-frame torso background, face over that;
loss = L1 + 0.2(1-SSIM) vs the full GT; patch-LPIPS 0.05 in the second half
(:186-193).
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ModelConfig, OptimizationConfig
from ..data.dataset import scene_extent
from ..models import gaussians as G
from ..models.lpips import load_lpips_params
from ..models.motion import (MotionNetwork, MouthMotionNetwork,
                             PersonalizedMotionNetwork)
from ..ops.rasterize import RasterizeConfig
from ..render import composite_fuse, render_motion, render_motion_mouth
from ..utils.losses import l1_loss, patchify, ssim
from .common import FrameBatch, build_frame_batch, gaussian_lrs

GREEN = jnp.array([0.0, 1.0, 0.0], jnp.float32)

# appearance-only training: zero LR on frozen attributes (:156-164)
_FACE_TRAIN = {"features_dc", "features_rest", "identity", "opacity"}
_MOUTH_TRAIN = {"features_dc", "features_rest", "identity"}


def _mask_lrs(lrs: dict, trainable: set) -> dict:
    return {k: (v if k in trainable else 0.0) for k, v in lrs.items()}


def fuse_patch_sizes(h: int, w: int) -> tuple[int, ...]:
    """The EXACT reference LPIPS patch-side set: random.randint(16,21)*2
    (train_fuse_con.py:188-193) — six lax.switch branches in one block.
    Single source of truth for the trainer AND cli/adapt's warm-ahead
    compile (the set is part of the executable's cache key)."""
    return tuple(s for s in (32, 34, 36, 38, 40, 42)
                 if s <= min(h, w)) or (min(h, w),)


def make_fuse_block(cfg: RasterizeConfig, opt_cfg, face_net, mouth_net,
                    face_pmf_net, mouth_pmf_net, spatial_lr_scale,
                    lpips_fn=None, lpips_patches: tuple[int, ...] = (),
                    dp: int = 1, mesh=None):
    """``dp=B``: the full per-frame fuse loss (composite + LPIPS cond)
    vmaps over a ``[B]`` index row per step; parameters update once with
    the mean gradient (see make_face_block). ``mesh`` shards the gathered
    rows over the 'dp' axis."""
    row_sharding = None
    if dp > 1:
        # vmapped lax.cond runs BOTH scatter branches; pick the full
        # scatter statically for the DP path (rasterize.scatter_mode)
        import dataclasses as _dc
        cfg = _dc.replace(cfg, scatter_mode="full")
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        row_sharding = NamedSharding(mesh, PartitionSpec("dp"))

    def frame_loss(face_state, mouth_state, f_umf, m_umf, f_pmf, m_pmf,
                   face_params, mouth_params, batch: FrameBatch, i,
                   patch_idx, use_lpips, lp):
        cam = batch.camera(i)
        gt = batch.gt_image(i)
        aud = batch.auds[i]
        exp = batch.au_exp[i]
        torso_bg = batch.bg_image(i)
        sg = jax.lax.stop_gradient

        # geometry frozen (reference requires_grad=False, :156-164):
        # stop-gradient so no geometry backward is built at all
        fst = face_state.replace(params=face_params.replace(
            xyz=sg(face_params.xyz), scaling=sg(face_params.scaling),
            rotation=sg(face_params.rotation)))
        mst = mouth_state.replace(params=mouth_params.replace(
            xyz=sg(mouth_params.xyz), scaling=sg(mouth_params.scaling),
            rotation=sg(mouth_params.rotation),
            opacity=sg(mouth_params.opacity)))
        fr = render_motion(
            cfg, cam, fst,
            umf=lambda x, a, e: face_net.apply(f_umf, x, a, e),
            aud=aud, exp=exp, bg=GREEN,
            pmf=lambda x, a, e: face_pmf_net.apply(f_pmf, x, a, e),
            personalized=False, align=True)
        mrr = render_motion_mouth(
            cfg, cam, mst,
            mouth_umf=lambda x, a, m: mouth_net.apply(m_umf, x, a, m),
            face_state=fst,
            face_umf=lambda x, a, e: face_net.apply(f_umf, x, a, e),
            aud=aud, bg=GREEN,
            pmf=lambda x, a: mouth_pmf_net.apply(m_pmf, x, a),
            personalized=False, align=True)
        image = composite_fuse(fr.out.image, fr.out.alpha,
                               mrr.out.image, mrr.out.alpha,
                               GREEN, torso_bg)
        loss = l1_loss(image, gt)
        loss += opt_cfg.lambda_dssim * (1.0 - ssim(image, gt))
        if lpips_fn is not None and lpips_patches:
            # lax.cond: first-half steps skip the AlexNet entirely and
            # the whole run is ONE compiled block (VERDICT r2 item 1)
            def lp_terms(operands):
                img_, gt_, pidx_ = operands

                def lp_branch(ps):
                    def run(imgs):
                        a, b = imgs
                        return lpips_fn(lp, patchify(a * 2 - 1, ps),
                                        patchify(b * 2 - 1, ps)).mean()
                    return run
                return 0.05 * jax.lax.switch(
                    pidx_, [lp_branch(ps) for ps in lpips_patches],
                    (img_, gt_))

            loss += jax.lax.cond(use_lpips > 0.5, lp_terms,
                                 lambda operands: jnp.float32(0.0),
                                 (image, gt, patch_idx))
        return loss

    def _step_inner(face_state, face_gopt, mouth_state, mouth_gopt,
                    face_umf_params, mouth_umf_params, face_pmf_params,
                    mouth_pmf_params, batch: FrameBatch, i, it, patch_idx,
                    use_lpips, lp):
        sg = jax.lax.stop_gradient
        f_umf = jax.tree.map(sg, face_umf_params)
        m_umf = jax.tree.map(sg, mouth_umf_params)
        f_pmf = jax.tree.map(sg, face_pmf_params)
        m_pmf = jax.tree.map(sg, mouth_pmf_params)

        if dp == 1:
            def loss_fn(face_params, mouth_params):
                return frame_loss(face_state, mouth_state, f_umf, m_umf,
                                  f_pmf, m_pmf, face_params, mouth_params,
                                  batch, i[0], patch_idx, use_lpips, lp)
        else:
            rows = jax.tree.map(lambda x: x[i], batch)
            if row_sharding is not None:
                rows = jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(
                        x, row_sharding), rows)

            def loss_fn(face_params, mouth_params):
                def per_frame(row):
                    return frame_loss(
                        face_state, mouth_state, f_umf, m_umf, f_pmf, m_pmf,
                        face_params, mouth_params,
                        jax.tree.map(lambda x: x[None], row), 0,
                        patch_idx, use_lpips, lp)

                return jnp.mean(jax.vmap(per_frame)(rows))

        loss, (g_face, g_mouth) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(face_state.params, mouth_state.params)

        # the pipeline scripts pass --opacity_lr 0.001 (train_xx_few.sh:21);
        # honored via the flag like the reference train_fuse_con.py
        lrs = gaussian_lrs(opt_cfg, it, spatial_lr_scale)
        lrs = dict(lrs, opacity=opt_cfg.opacity_lr)
        fp, face_gopt = G.adam_update(face_state.params, g_face, face_gopt,
                                      _mask_lrs(lrs, _FACE_TRAIN),
                                      face_state.alive)
        mp, mouth_gopt = G.adam_update(mouth_state.params, g_mouth, mouth_gopt,
                                       _mask_lrs(lrs, _MOUTH_TRAIN),
                                       mouth_state.alive)
        return (face_state.replace(params=fp), face_gopt,
                mouth_state.replace(params=mp), mouth_gopt, loss)

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def block(face_state, face_gopt, mouth_state, mouth_gopt,
              face_umf_params, mouth_umf_params, face_pmf_params,
              mouth_pmf_params, batch: FrameBatch, idxs, its, patch_idxs,
              use_lpips_arr, valid_arr, lpips_params):
        # lpips_params is a traced argument, not a closure capture — a
        # closed-over AlexNet tree is re-embedded as MLIR constants at
        # every lowering (see train/face.py make_face_block)
        def one(carry, xs):
            i, it, pidx, ul, valid = xs
            out = _step_inner(*carry, face_umf_params, mouth_umf_params,
                              face_pmf_params, mouth_pmf_params, batch,
                              i, it, pidx, ul, lpips_params)
            # padding steps (valid=0) discard the update (fixed block shape)
            new_carry = jax.tree.map(
                lambda n, o: jnp.where(valid > 0, n, o), out[:-1], carry)
            return new_carry, out[-1]

        carry, losses = jax.lax.scan(
            one, (face_state, face_gopt, mouth_state, mouth_gopt),
            (idxs, its, patch_idxs, use_lpips_arr, valid_arr))
        return carry + (losses,)

    return block


def train_fuse(model_cfg: ModelConfig, opt_cfg: OptimizationConfig,
               face_bundle: dict, mouth_bundle: dict,
               log_every: int = 500, seed: int = 0,
               lpips_enabled: bool = True,
               data_parallel: int = 1, dp_mesh=None):
    from .common import load_training_frames
    records = load_training_frames(model_cfg)
    batch = build_frame_batch(records)
    _, extent = scene_extent(records)
    h, w = records[0].height, records[0].width

    # copy: the jitted step donates these buffers; keep callers' bundles valid
    face_state: G.GaussianState = jax.tree.map(jnp.array, face_bundle["state"])
    mouth_state: G.GaussianState = jax.tree.map(jnp.array, mouth_bundle["state"])
    face_gopt = G.adam_init(face_state.params)
    mouth_gopt = G.adam_init(mouth_state.params)
    if getattr(model_cfg, "adaptive_capacity", False) \
            and not getattr(model_cfg, "deterministic_slots", False):
        # fusion never densifies — one pack to a snug pow2 pays for the
        # whole 2k-iteration stage (and for synthesis, which inherits
        # these shapes)
        fa, ma = jax.device_get((face_state.num_alive(),
                                 mouth_state.num_alive()))
        for nm, n_alive, st, go in (("face", int(fa), face_state, face_gopt),
                                    ("mouth", int(ma), mouth_state,
                                     mouth_gopt)):
            new_cap = min(max(G._pow2ceil(2 * max(n_alive, 1)), 2048),
                          st.capacity)
            if new_cap != st.capacity:
                print(f"[fuse] {nm} capacity {st.capacity} -> {new_cap} "
                      f"(alive {n_alive})", flush=True)
                st, go = G.pack_resize(st, go, new_cap)
                if nm == "face":
                    face_state, face_gopt = st, go
                else:
                    mouth_state, mouth_gopt = st, go
    cfg = RasterizeConfig(h, w, max_per_tile=model_cfg.max_per_tile,
                          approx_topk=model_cfg.approx_topk)

    # motion nets are frozen in fusion -> inference-mode (gather) lookups
    face_net = MotionNetwork(model_cfg.audio_extractor, onehot=False)
    mouth_net = MouthMotionNetwork(model_cfg.audio_extractor, onehot=False)
    face_pmf = PersonalizedMotionNetwork("face", model_cfg.audio_extractor,
                                         onehot=False)
    mouth_pmf = PersonalizedMotionNetwork("mouth", model_cfg.audio_extractor,
                                          onehot=False)

    iterations = opt_cfg.iterations
    lpips_start = iterations // 2             # :42
    patch_sizes = fuse_patch_sizes(h, w)

    lpips_call, lpips_params = None, {}
    if lpips_enabled:
        lpips_model, lpips_params, _lpips_real = load_lpips_params()

        def lpips_call(lp, a, b):
            return lpips_model.apply(lp, a, b)

    # ONE compiled block: LPIPS second half rides a per-step lax.cond
    run = make_fuse_block(cfg, opt_cfg, face_net, mouth_net, face_pmf,
                          mouth_pmf, extent,
                          lpips_call if lpips_enabled else None,
                          patch_sizes if lpips_enabled else (),
                          dp=data_parallel, mesh=dp_mesh)

    rng = np.random.default_rng(seed)
    losses = []
    t0 = time.time()
    block_len = 100
    it = 1
    while it <= iterations:
        block_end = min(iterations, ((it - 1) // block_len + 1) * block_len)
        steps = list(range(it, block_end + 1))
        n = len(steps)
        idxs = [[int(rng.integers(batch.num_frames))
                 for _ in range(data_parallel)] for _ in steps]
        pidx = [int(rng.integers(len(patch_sizes))) for _ in steps]
        ul = [float(s > lpips_start) for s in steps]
        valid = [1.0] * n
        if n < block_len:  # pad to the single compiled shape
            padn = block_len - n
            steps = steps + [block_end] * padn
            idxs = idxs + [idxs[-1]] * padn
            pidx = pidx + [0] * padn
            ul = ul + [0.0] * padn
            valid = valid + [0.0] * padn
        (face_state, face_gopt, mouth_state, mouth_gopt, block_losses) = run(
            face_state, face_gopt, mouth_state, mouth_gopt,
            face_bundle["umf_params"], mouth_bundle["umf_params"],
            face_bundle["pmf_params"], mouth_bundle["pmf_params"],
            batch, jnp.asarray(idxs, jnp.int32), jnp.asarray(steps, jnp.int32),
            jnp.asarray(pidx, jnp.int32), jnp.asarray(ul, jnp.float32),
            jnp.asarray(valid, jnp.float32), lpips_params)
        losses.append(block_losses[:n])    # lazy (see train/face.py)
        it = block_end + 1
        if block_end % log_every < n:
            # one round trip for all recent loss blocks (see train/face.py)
            recent = np.concatenate([np.asarray(b) for b in jax.device_get(
                losses[-max(1, log_every // block_len):])])
            print(f"[fuse {block_end}/{iterations}] "
                  f"loss={recent[-log_every:].mean():.4f} "
                  f"t={time.time()-t0:.0f}s", flush=True)

    # ONE device_get: per-block np.asarray would pay a tunnel RPC per block
    losses = np.concatenate(jax.device_get(losses)).tolist() \
        if losses else []
    return dict(face_state=face_state, mouth_state=mouth_state,
                face_umf_params=face_bundle["umf_params"],
                mouth_umf_params=mouth_bundle["umf_params"],
                face_pmf_params=face_bundle["pmf_params"],
                mouth_pmf_params=mouth_bundle["pmf_params"],
                losses=losses, cfg=cfg)
