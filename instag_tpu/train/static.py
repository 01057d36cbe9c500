"""Minimum end-to-end slice: vanilla 3DGS fitting of talking-head frames.

No motion networks — proves rasterizer + Adam + densification + data loop on
one chip (SURVEY.md §7 step 4). Also the substrate the motion trainers build
on. CLI:

    python -m instag_tpu.train.static --source_path data/<id> \
        --model_path output/<run> --iterations 2000 --init_num 1000
"""

from __future__ import annotations

import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..config import (ModelConfig, OptimizationConfig, make_parser, parse_all,
                      save_cfg)
from ..data.dataset import load_frames, random_init_points, scene_extent
from ..models import gaussians as G
from ..ops.rasterize import RasterizeConfig
from ..render import render
from ..utils.losses import psnr
from .common import FrameBatch, build_frame_batch, gaussian_lrs, rgb_loss


def make_train_step(cfg: RasterizeConfig, opt_cfg: OptimizationConfig,
                    spatial_lr_scale: float):
    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(state: G.GaussianState, opt: G.AdamState, batch: FrameBatch,
                   frame_idx, step):
        cam = batch.camera(frame_idx)
        gt = batch.gt_image(frame_idx)
        bg = batch.bg_image(frame_idx)
        offset = jnp.zeros((state.capacity, 2))

        def loss_fn(params, off):
            st = state.replace(params=params)
            # per-frame torso composite as the rasterization background
            out = render(cfg, cam, st, jnp.zeros(3), means2d_offset=off)
            img = out.image + bg * (1.0 - out.alpha)
            return rgb_loss(img, gt, opt_cfg.lambda_dssim), out

        (loss, out), (g_params, g_off) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.params, offset)

        lrs = gaussian_lrs(opt_cfg, step, spatial_lr_scale)
        new_params, opt = G.adam_update(state.params, g_params, opt, lrs,
                                        state.alive)
        state = state.replace(params=new_params)
        visible = out.radii > 0
        state = G.add_densification_stats(state, g_off, visible)
        state = G.update_max_radii(state, out.radii, visible)
        return state, opt, loss

    return train_step


@partial(jax.jit, static_argnums=(3,), donate_argnums=(0, 1))
def densify_step(state, opt, key, max_screen: bool, max_grad, min_opacity,
                 extent, percent_dense):
    return G.densify_and_prune(state, opt, key, max_grad, min_opacity, extent,
                               20.0 if max_screen else None, percent_dense)


def train(model_cfg: ModelConfig, opt_cfg: OptimizationConfig,
          log_every: int = 200, eval_at_end: bool = True):
    records = load_frames(model_cfg.source_path, "train",
                          model_cfg.audio_extractor, model_cfg.N_views)
    batch = build_frame_batch(records)
    _, extent = scene_extent(records)

    h, w = records[0].height, records[0].width
    cfg = RasterizeConfig(h, w, max_per_tile=model_cfg.max_per_tile,
                          approx_topk=model_cfg.approx_topk)

    capacity = model_cfg.resolve_capacity()
    xyz, colors = random_init_points(model_cfg.init_num)
    state = G.create_from_points(jnp.asarray(xyz), jnp.asarray(colors),
                                 capacity, model_cfg.sh_degree, extent)
    opt = G.adam_init(state.params)

    step_fn = make_train_step(cfg, opt_cfg, extent)
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    t0 = time.time()
    losses = []
    for it in range(1, opt_cfg.iterations + 1):
        if it % 1000 == 0:
            state = G.one_up_sh_degree(state)
        frame = int(rng.integers(batch.num_frames))
        state, opt, loss = step_fn(state, opt, batch, frame, it)
        losses.append(loss)

        if (it < opt_cfg.densify_until_iter
                and it > opt_cfg.densify_from_iter
                and it % opt_cfg.densification_interval == 0):
            key, sub = jax.random.split(key)
            state, opt = densify_step(
                state, opt, sub, it > opt_cfg.opacity_reset_interval,
                opt_cfg.densify_grad_threshold, 0.005, extent,
                opt_cfg.percent_dense)
        if it % opt_cfg.opacity_reset_interval == 0 and it < opt_cfg.densify_until_iter:
            state, opt = G.reset_opacity(state, opt)

        if it % log_every == 0:
            l = float(jnp.mean(jnp.stack(losses[-log_every:])))
            n = int(state.num_alive())
            print(f"[{it}/{opt_cfg.iterations}] loss={l:.4f} "
                  f"points={n} elapsed={time.time()-t0:.1f}s", flush=True)

    result = {"iterations": opt_cfg.iterations,
              "final_loss": float(jnp.mean(jnp.stack(losses[-50:]))),
              "num_points": int(state.num_alive()),
              "train_time_s": time.time() - t0}

    if eval_at_end:
        @jax.jit
        def eval_frame(state, batch, i):
            out = render(cfg, batch.camera(i), state, jnp.zeros(3))
            img = out.image + batch.bg_image(i) * (1.0 - out.alpha)
            return psnr(jnp.clip(img, 0, 1), batch.gt_image(i))
        scores = [float(eval_frame(state, batch, i))
                  for i in range(min(8, batch.num_frames))]
        result["train_psnr"] = float(np.mean(scores))
        print(f"train-view PSNR: {result['train_psnr']:.2f} dB", flush=True)

    return state, opt, result


def main(argv=None):
    parser = make_parser("Vanilla 3DGS static training (minimum slice)")
    model_cfg, _, opt_cfg, _ = parse_all(parser, argv)
    if model_cfg.model_path:
        save_cfg(model_cfg.model_path, model_cfg)
    state, _, result = train(model_cfg, opt_cfg)
    if model_cfg.model_path:
        from ..io.checkpoints import save_gaussian_ply
        save_gaussian_ply(os.path.join(model_cfg.model_path,
                                       "point_cloud.ply"), state)
    print(result)


if __name__ == "__main__":
    main()
