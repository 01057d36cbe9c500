"""Offline evaluation: PSNR / LPIPS / LMD over frame sequences, and AU error.

Replacements for the reference's metrics.py (PSNR + LPIPS(alex) + LMD via
face-alignment landmarks over videos, :8-217) and auerror.py (17-AU MSE from
two OpenFace CSVs, :22-40).

LMD requires a landmark detector; `face_alignment` is not available in this
image, so `lmd_from_landmarks` accepts precomputed landmark arrays (the .lms
files the data pipeline produces) — same mouth-region L2 metric, producer-
agnostic. The CLI computes PSNR/LPIPS always and LMD when .lms files exist.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .models.lpips import load_lpips_params
from .utils.losses import psnr as psnr_fn


def video_psnr(frames_a: np.ndarray, frames_b: np.ndarray) -> float:
    """Mean per-frame PSNR over [T,H,W,3] uint8 arrays."""
    a = jnp.asarray(frames_a, jnp.float32) / 255.0
    b = jnp.asarray(frames_b, jnp.float32) / 255.0
    vals = jax.vmap(psnr_fn)(a, b)
    return float(jnp.mean(vals))


def video_lpips(frames_a: np.ndarray, frames_b: np.ndarray,
                batch: int = 8) -> float:
    """Mean LPIPS(alex) over frames [T,H,W,3] uint8 (metrics.py LPIPSMeter)."""
    model, params, real = load_lpips_params()
    apply = jax.jit(model.apply)
    t = frames_a.shape[0]
    vals = []
    for s in range(0, t, batch):
        a = jnp.asarray(frames_a[s:s + batch], jnp.float32) / 127.5 - 1.0
        b = jnp.asarray(frames_b[s:s + batch], jnp.float32) / 127.5 - 1.0
        if a.shape[0] < batch:  # pad to keep one compiled shape
            pad = batch - a.shape[0]
            a = jnp.pad(a, ((0, pad), (0, 0), (0, 0), (0, 0)))
            b = jnp.pad(b, ((0, pad), (0, 0), (0, 0), (0, 0)))
            d = apply(params, a.transpose(0, 3, 1, 2), b.transpose(0, 3, 1, 2))
            vals.extend(np.asarray(d)[: batch - pad])
        else:
            d = apply(params, a.transpose(0, 3, 1, 2), b.transpose(0, 3, 1, 2))
            vals.extend(np.asarray(d))
    return float(np.mean(vals))


def load_gt_landmarks(source_path: str, img_ids: list[int]) -> np.ndarray | None:
    """Stack the dataset's precomputed ``ori_imgs/{id}.lms`` landmark files
    for the given frames (the reference preprocessing's face_alignment
    output, data_utils/process.py task 7); None when any is missing."""
    import os
    out = []
    for i in img_ids:
        p = os.path.join(source_path, "ori_imgs", f"{i}.lms")
        if not os.path.exists(p):
            return None
        out.append(np.loadtxt(p, dtype=np.float32))
    return np.stack(out)


def track_video_landmarks(frames: np.ndarray) -> np.ndarray | None:
    """Run the in-repo FAN tracker (data_utils/landmarks.py) over rendered
    frames [T,H,W,3] uint8 -> [T,68,2], the reference metrics.py LMDMeter
    protocol (it runs face_alignment on BOTH videos, :189-217). Returns
    None with a loud message when the public 2DFAN weights are not mounted
    (egress-gated in this image; scripts/fetch_weights.sh)."""
    try:
        from .data_utils.landmarks import LandmarkTracker
        tracker = LandmarkTracker()
    except Exception as e:  # missing weights / torch import issue
        print(f"[metrics] LMD SKIPPED — FAN landmark tracker unavailable: "
              f"{e}", flush=True)
        return None
    return np.stack([tracker(np.asarray(f)) for f in frames])


def lmd_from_landmarks(lms_a: np.ndarray, lms_b: np.ndarray) -> float:
    """Landmark distance on the mouth region (indices 48:68), after
    normalizing each face by translation (metrics.py LMDMeter semantics):
    lms [T, 68, 2]."""
    def norm(l):
        mouth = l[:, 48:68]
        center = l.mean(axis=1, keepdims=True)
        return mouth - center
    d = np.linalg.norm(norm(lms_a) - norm(lms_b), axis=-1)
    return float(d.mean())


AU_COLS = [1, 2, 4, 5, 6, 7, 9, 10, 12, 14, 15, 17, 20, 23, 25, 26, 45]
AU_LOWER = [10, 12, 14, 15, 17, 20, 23, 25, 26]
AU_UPPER = [1, 2, 4, 5, 6, 7, 9, 45]


def au_error(csv_a: str, csv_b: str) -> dict:
    """AU intensity MSE from two OpenFace CSVs, split lower/upper face
    (reference auerror.py:22-40)."""
    import pandas as pd
    a = pd.read_csv(csv_a)
    b = pd.read_csv(csv_b)
    a.columns = [c.strip() for c in a.columns]
    b.columns = [c.strip() for c in b.columns]
    t = min(len(a), len(b))

    def mse(cols):
        errs = []
        for i in cols:
            key = f"AU{i:02d}_r"
            errs.append(np.mean((a[key].values[:t] - b[key].values[:t]) ** 2))
        return float(np.mean(errs))

    return {"au_all": mse(AU_COLS), "au_lower": mse(AU_LOWER),
            "au_upper": mse(AU_UPPER)}


def evaluate_frames(pred: np.ndarray, gt: np.ndarray,
                    lms_pred: np.ndarray | None = None,
                    lms_gt: np.ndarray | None = None) -> dict:
    from .models.lpips import load_lpips_params as _llp
    _, _, lpips_real = _llp()
    out = {"psnr": video_psnr(pred, gt), "lpips": video_lpips(pred, gt),
           "lpips_real": lpips_real}
    if lms_pred is not None and lms_gt is not None:
        out["lmd"] = lmd_from_landmarks(lms_pred, lms_gt)
    return out
