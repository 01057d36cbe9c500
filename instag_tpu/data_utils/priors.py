"""External-model preprocessing wrappers: teeth masks + sapiens geometry.

Both depend on large external checkpoints that cannot be fetched in this
zero-egress image; the functions run when weights are present and otherwise
raise with the exact on-disk contract so outputs from any producer
(including the reference pipeline) drop in.

  * Teeth masks (reference data_utils/easyportrait/create_teeth_mask.py):
    boolean [H, W] arrays at teeth_mask/{id}.npy, True on visible teeth.
    The reference runs an EasyPortrait FPN segmentor (mmseg); here any
    torchscript/torch segmentation model with a 'teeth' class id can be
    plugged via INSTAG_TEETH_MODEL. A landmark-based fallback produces
    conservative masks (inner-mouth polygon) so the pipeline can run
    end-to-end without the external model.

  * Sapiens priors (reference data_utils/sapiens/run.sh + lite scripts):
    per-frame monocular depth [H, W] float and normal [H, W, 3] float .npy
    under sapiens/{depth,normal}/sapiens_0.3b/{id}.npy, first 500 frames.
    Torchscript checkpoints via INSTAG_SAPIENS_DEPTH / INSTAG_SAPIENS_NORMAL.
"""

from __future__ import annotations

import glob
import os

import numpy as np


def create_teeth_masks(base_dir: str, ori_imgs_dir: str,
                       use_fallback: bool = True) -> None:
    """Write teeth_mask/{id}.npy for every frame."""
    import cv2
    out_dir = os.path.join(base_dir, "teeth_mask")
    os.makedirs(out_dir, exist_ok=True)
    model_path = os.environ.get("INSTAG_TEETH_MODEL", "weights/teeth_fpn.pt")
    fpn_path = os.environ.get("INSTAG_EASYPORTRAIT_FPN",
                              "weights/fpn-fp-512.pth")

    model = None
    fpn = None
    if os.path.exists(model_path):
        import torch
        model = torch.jit.load(model_path, map_location="cpu").eval()
    elif os.path.exists(fpn_path):
        # the reference's actual segmentor (mmseg fpn-fp-512.pth), via the
        # from-scratch key-compatible arch in easyportrait_fpn.py
        from .easyportrait_fpn import load_fpn_fp, segment
        fpn = load_fpn_fp(fpn_path)

    for image_path in sorted(glob.glob(os.path.join(ori_imgs_dir, "*.jpg"))):
        img_id = os.path.basename(image_path).split(".")[0]
        img = cv2.imread(image_path)
        h, w = img.shape[:2]
        if model is not None:
            import torch
            inp = cv2.resize(img[:, :, ::-1], (512, 512)).astype(np.float32)
            inp = (inp / 255.0 - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
            with torch.no_grad():
                seg = model(torch.from_numpy(
                    inp.transpose(2, 0, 1))[None].float())[0]
            cls = seg.argmax(0).numpy().astype(np.uint8)
            teeth = cv2.resize((cls == 7).astype(np.uint8), (w, h),
                               interpolation=cv2.INTER_NEAREST).astype(bool)
        elif fpn is not None:
            from .easyportrait_fpn import TEETH_CLASS, segment
            teeth = segment(fpn, img) == TEETH_CLASS
        elif use_fallback:
            # landmark fallback: inner-mouth polygon (indices 60-67)
            lms_path = image_path.replace(".jpg", ".lms")
            teeth = np.zeros((h, w), bool)
            if os.path.exists(lms_path):
                lms = np.loadtxt(lms_path)
                poly = lms[60:68].astype(np.int32)  # (x, y)
                mask = np.zeros((h, w), np.uint8)
                cv2.fillPoly(mask, [poly], 1)
                teeth = mask.astype(bool)
        else:
            raise RuntimeError(
                f"teeth segmentation model not found at {model_path}; set "
                "INSTAG_TEETH_MODEL or enable the landmark fallback")
        np.save(os.path.join(out_dir, f"{img_id}.npy"), teeth)
    src = ("torchscript model" if model is not None else
           "EasyPortrait FPN" if fpn is not None else "landmark fallback")
    print(f"[teeth] wrote masks to {out_dir} ({src})")


def run_sapiens(base_dir: str, max_frames: int = 500) -> None:
    """Write sapiens/{depth,normal}/sapiens_0.3b/{id}.npy monocular priors
    for the first `max_frames` gt frames (the reference's budget,
    data_utils/sapiens/lite/scripts/depth.sh)."""
    import cv2
    depth_path = os.environ.get("INSTAG_SAPIENS_DEPTH", "")
    normal_path = os.environ.get("INSTAG_SAPIENS_NORMAL", "")
    if not (depth_path and os.path.exists(depth_path)
            and normal_path and os.path.exists(normal_path)):
        raise RuntimeError(
            "sapiens torchscript checkpoints not found; set "
            "INSTAG_SAPIENS_DEPTH and INSTAG_SAPIENS_NORMAL, or copy "
            "precomputed sapiens/{depth,normal}/sapiens_*/{id}.npy outputs "
            "from the reference pipeline — training runs without priors "
            "(the sapiens losses simply stay off)")
    import torch
    d_model = torch.jit.load(depth_path, map_location="cpu").eval()
    n_model = torch.jit.load(normal_path, map_location="cpu").eval()
    d_dir = os.path.join(base_dir, "sapiens/depth/sapiens_0.3b")
    n_dir = os.path.join(base_dir, "sapiens/normal/sapiens_0.3b")
    os.makedirs(d_dir, exist_ok=True)
    os.makedirs(n_dir, exist_ok=True)
    paths = sorted(glob.glob(os.path.join(base_dir, "gt_imgs", "*.jpg")),
                   key=lambda p: int(os.path.basename(p).split(".")[0]))
    for p in paths[:max_frames]:
        img_id = os.path.basename(p).split(".")[0]
        img = cv2.imread(p)[:, :, ::-1]
        h, w = img.shape[:2]
        inp = cv2.resize(img, (768, 1024)).astype(np.float32)
        inp = (inp / 255.0 - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
        t = torch.from_numpy(inp.transpose(2, 0, 1))[None].float()
        with torch.no_grad():
            depth = d_model(t)[0, 0].numpy()
            normal = n_model(t)[0].numpy().transpose(1, 2, 0)
        depth = cv2.resize(depth, (w, h))
        normal = cv2.resize(normal, (w, h))
        normal = normal / np.maximum(
            np.linalg.norm(normal, axis=-1, keepdims=True), 1e-6)
        np.save(os.path.join(d_dir, f"{img_id}.npy"), depth)
        np.save(os.path.join(n_dir, f"{img_id}.npy"), normal)
    print(f"[sapiens] wrote priors for {min(len(paths), max_frames)} frames")
