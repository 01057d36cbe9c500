"""In-training validation reporting (reference training_report,
train_face.py:814-883 / pretrain_face.py:572-638): render held-out and train
cameras at test iterations, log L1/PSNR scalars and image panels.

Scalars go to metrics.jsonl (+ TensorBoard when available) via
utils.logger.MetricsLogger; panels are saved as PNGs under
<log_dir>/val_renders (TensorBoard images when available).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..render import render_motion
from ..utils.logger import MetricsLogger
from ..utils.losses import l1_loss, psnr
from .common import FrameBatch

GREEN = jnp.array([0.0, 1.0, 0.0], jnp.float32)


class FaceValReporter:
    """Renders a fixed subset of val + train frames through the face branch
    and logs L1/PSNR (the reference uses test idx 5,15,...,95 and train idx
    5,10,...,25 — same spirit here with whatever the clip provides)."""

    def __init__(self, cfg, umf_net, pmf_net, val_batch: FrameBatch | None,
                 train_batch: FrameBatch, log_dir: str | None,
                 num_val: int = 8, num_train: int = 4,
                 save_images: bool = True):
        self.cfg = cfg
        self.logger = MetricsLogger(log_dir) if log_dir else None
        self.save_images = save_images and log_dir is not None
        self.log_dir = log_dir
        self.sets = {}
        if val_batch is not None and val_batch.num_frames > 0:
            step = max(1, val_batch.num_frames // num_val)
            self.sets["val"] = (val_batch, list(range(0, val_batch.num_frames,
                                                      step))[:num_val])
        step = max(1, train_batch.num_frames // num_train)
        self.sets["train"] = (train_batch,
                              list(range(0, train_batch.num_frames,
                                         step))[:num_train])

        @jax.jit
        def render_one(state, umf_params, pmf_params, batch: FrameBatch, i):
            mr = render_motion(
                cfg, batch.camera(i), state,
                umf=lambda x, a, e: umf_net.apply(umf_params, x, a, e),
                aud=batch.auds[i], exp=batch.au_exp[i], bg=GREEN,
                pmf=lambda x, a, e: pmf_net.apply(pmf_params, x, a, e),
                personalized=False, align=True)
            # recomposite over the per-frame torso background for a
            # GT-comparable image (training_report:339)
            img = (mr.out.image - GREEN[:, None, None] * (1 - mr.out.alpha)
                   + batch.bg_image(i) * (1 - mr.out.alpha))
            img = jnp.clip(img, 0.0, 1.0)
            gt = batch.gt_image(i)
            # depth-normal panel (reference train_face.py:843-845: normals
            # from the rendered depth, masked by alpha, mapped to [0,1])
            from ..utils.normals import depth_to_normal
            cam = batch.camera(i)
            dn = depth_to_normal(cam.view_transform, cam.tanfovx,
                                 cam.tanfovy, mr.out.depth)
            dn = (dn.transpose(2, 0, 1) * jax.lax.stop_gradient(mr.out.alpha)
                  ) * 0.5 + 0.5
            return img, dn, l1_loss(img, gt), psnr(img, gt)

        self._render_one = render_one

    def __call__(self, iteration: int, state, umf_params, pmf_params) -> dict:
        results = {}
        for name, (batch, ids) in self.sets.items():
            l1s, psnrs = [], []
            for j, i in enumerate(ids):
                img, dn, l1, ps = self._render_one(state, umf_params,
                                                   pmf_params, batch, i)
                l1s.append(float(l1))
                psnrs.append(float(ps))
                if self.save_images and j == 0:
                    self._save_panel(name, iteration, img, batch, i, dn)
            results[f"{name}_l1"] = float(np.mean(l1s))
            results[f"{name}_psnr"] = float(np.mean(psnrs))
            if self.logger:
                self.logger.scalar(f"{name}/l1", results[f"{name}_l1"],
                                   iteration)
                self.logger.scalar(f"{name}/psnr", results[f"{name}_psnr"],
                                   iteration)
        if self.logger:
            self.logger.scalar("total_points", int(state.num_alive()),
                               iteration)
        return results

    def _save_panel(self, name, iteration, img, batch, i, depth_normal=None):
        try:
            from PIL import Image
            cols = [np.asarray(img).transpose(1, 2, 0),
                    np.asarray(batch.gt_image(i)).transpose(1, 2, 0)]
            if depth_normal is not None:
                cols.append(np.asarray(depth_normal).transpose(1, 2, 0))
            panel = np.concatenate(cols, axis=1)
            panel = (np.clip(panel, 0, 1) * 255).astype(np.uint8)
            out_dir = os.path.join(self.log_dir, "val_renders")
            os.makedirs(out_dir, exist_ok=True)
            Image.fromarray(panel).save(
                os.path.join(out_dir, f"{name}_{iteration}.png"))
            if self.logger and self.logger._tb is not None:
                self.logger.image(f"{name}/render_vs_gt",
                                  panel.transpose(2, 0, 1) / 255.0, iteration)
        except Exception:
            pass
