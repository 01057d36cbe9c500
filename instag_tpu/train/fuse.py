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
from ..data.dataset import load_frames, scene_extent
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


def make_fuse_step(cfg: RasterizeConfig, opt_cfg, face_net, mouth_net,
                   face_pmf_net, mouth_pmf_net, spatial_lr_scale,
                   lpips_fn=None, lpips_patch: int = 0):

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def _step(face_state, face_gopt, mouth_state, mouth_gopt, face_umf_params,
              mouth_umf_params, face_pmf_params, mouth_pmf_params,
              batch: FrameBatch, i, it):
        cam = batch.camera(i)
        gt = batch.gt_image(i)
        aud = batch.auds[i]
        exp = batch.au_exp[i]
        torso_bg = batch.bg_image(i)

        sg = jax.lax.stop_gradient
        f_umf = jax.tree.map(sg, face_umf_params)
        m_umf = jax.tree.map(sg, mouth_umf_params)
        f_pmf = jax.tree.map(sg, face_pmf_params)
        m_pmf = jax.tree.map(sg, mouth_pmf_params)

        def loss_fn(face_params, mouth_params):
            fst = face_state.replace(params=face_params)
            mst = mouth_state.replace(params=mouth_params)
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
            if lpips_patch and lpips_fn is not None:
                pi = patchify(image * 2 - 1, lpips_patch)
                pg = patchify(gt * 2 - 1, lpips_patch)
                loss += 0.05 * lpips_fn(pi, pg).mean()
            return loss

        loss, (g_face, g_mouth) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(face_state.params, mouth_state.params)

        lrs = gaussian_lrs(opt_cfg, it, spatial_lr_scale)
        lrs = dict(lrs, opacity=1e-3)  # script override (train_xx_few.sh)
        fp, face_gopt = G.adam_update(face_state.params, g_face, face_gopt,
                                      _mask_lrs(lrs, _FACE_TRAIN),
                                      face_state.alive)
        mp, mouth_gopt = G.adam_update(mouth_state.params, g_mouth, mouth_gopt,
                                       _mask_lrs(lrs, _MOUTH_TRAIN),
                                       mouth_state.alive)
        return (face_state.replace(params=fp), face_gopt,
                mouth_state.replace(params=mp), mouth_gopt, loss)

    return _step


def train_fuse(model_cfg: ModelConfig, opt_cfg: OptimizationConfig,
               face_bundle: dict, mouth_bundle: dict,
               log_every: int = 500, seed: int = 0,
               lpips_enabled: bool = True):
    records = load_frames(model_cfg.source_path, "train",
                          model_cfg.audio_extractor, model_cfg.N_views)
    batch = build_frame_batch(records)
    _, extent = scene_extent(records)
    h, w = records[0].height, records[0].width

    # copy: the jitted step donates these buffers; keep callers' bundles valid
    face_state: G.GaussianState = jax.tree.map(jnp.array, face_bundle["state"])
    mouth_state: G.GaussianState = jax.tree.map(jnp.array, mouth_bundle["state"])
    face_gopt = G.adam_init(face_state.params)
    mouth_gopt = G.adam_init(mouth_state.params)
    cfg = RasterizeConfig(h, w, max_per_tile=model_cfg.max_per_tile)

    face_net = MotionNetwork(model_cfg.audio_extractor)
    mouth_net = MouthMotionNetwork(model_cfg.audio_extractor)
    face_pmf = PersonalizedMotionNetwork("face", model_cfg.audio_extractor)
    mouth_pmf = PersonalizedMotionNetwork("mouth", model_cfg.audio_extractor)

    iterations = opt_cfg.iterations
    lpips_start = iterations // 2             # :42
    patch_sizes = [s for s in (32, 36, 40) if s <= min(h, w)] or [min(h, w)]

    base = make_fuse_step(cfg, opt_cfg, face_net, mouth_net, face_pmf,
                          mouth_pmf, extent)
    lp_steps = {}
    if lpips_enabled:
        lpips_model, lpips_params = load_lpips_params()

        def lpips_call(a, b):
            return lpips_model.apply(lpips_params, a, b)

        lp_steps = {ps: make_fuse_step(cfg, opt_cfg, face_net, mouth_net,
                                       face_pmf, mouth_pmf, extent,
                                       lpips_call, ps)
                    for ps in patch_sizes}

    rng = np.random.default_rng(seed)
    losses = []
    t0 = time.time()
    for it in range(1, iterations + 1):
        i = int(rng.integers(batch.num_frames))
        if lp_steps and it > lpips_start:
            step = lp_steps[patch_sizes[int(rng.integers(len(patch_sizes)))]]
        else:
            step = base
        face_state, face_gopt, mouth_state, mouth_gopt, loss = step(
            face_state, face_gopt, mouth_state, mouth_gopt,
            face_bundle["umf_params"], mouth_bundle["umf_params"],
            face_bundle["pmf_params"], mouth_bundle["pmf_params"],
            batch, i, it)
        losses.append(float(loss))
        if it % log_every == 0:
            print(f"[fuse {it}/{iterations}] "
                  f"loss={np.mean(losses[-log_every:]):.4f} "
                  f"t={time.time()-t0:.0f}s", flush=True)

    return dict(face_state=face_state, mouth_state=mouth_state,
                face_umf_params=face_bundle["umf_params"],
                mouth_umf_params=mouth_bundle["umf_params"],
                face_pmf_params=face_bundle["pmf_params"],
                mouth_pmf_params=mouth_bundle["pmf_params"],
                losses=losses, cfg=cfg)
