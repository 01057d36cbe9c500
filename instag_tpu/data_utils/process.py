"""9-task preprocessing orchestrator (reference data_utils/process.py:511-544).

    python -m instag_tpu.data_utils.process <video-or-dir> [--task N] [--asr X]

Tasks: 1 extract audio, 2 audio features, 3 frames, 4 semantic parsing,
5 background, 6 torso+gt, 7 landmarks, 8 face tracking, 9 transforms json.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess

import numpy as np


def extract_audio(path: str, out_path: str, sample_rate: int = 16000) -> None:
    """Task 1 (reference :9-19): video -> 16 kHz wav. Needs ffmpeg; if the
    input is already a wav it is copied/resampled natively."""
    print(f"[INFO] extract audio {path} -> {out_path}")
    if path.endswith(".wav"):
        from ..data.audio import load_wav
        from scipy.io import wavfile
        wav = load_wav(path, sample_rate)
        wavfile.write(out_path, sample_rate,
                      (wav * 32767).astype(np.int16))
        return
    ffmpeg = shutil.which("ffmpeg")
    if not ffmpeg:
        if os.path.exists(out_path):
            print(f"[INFO] no ffmpeg; using pre-extracted {out_path}")
            return
        raise RuntimeError(
            "ffmpeg is not available in this environment; provide a "
            "pre-extracted aud.wav next to the video instead")
    subprocess.run([ffmpeg, "-y", "-i", path, "-f", "wav",
                    "-ar", str(sample_rate), out_path], check=True)


def extract_audio_features(wav_path: str, mode: str = "deepspeech") -> None:
    """Task 2 (reference :22-35): wav -> per-frame feature windows."""
    from .audio_features import extract_features
    extract_features(wav_path, mode)


def extract_images(path: str, out_dir: str, fps: int = 25) -> None:
    """Task 3 (reference :38-44): video -> 25 fps jpgs, natively via OpenCV
    (this image has no ffmpeg)."""
    import cv2
    print(f"[INFO] extract images {path} -> {out_dir}")
    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(path)
    src_fps = cap.get(cv2.CAP_PROP_FPS) or fps
    step = src_fps / fps
    nxt, src_idx, out_idx = 0.0, 0, 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if src_idx >= nxt - 1e-6:
            cv2.imwrite(os.path.join(out_dir, f"{out_idx}.jpg"), frame,
                        [cv2.IMWRITE_JPEG_QUALITY, 98])
            out_idx += 1
            nxt += step
        src_idx += 1
    cap.release()
    print(f"[INFO] extracted {out_idx} frames")


def extract_semantics(ori_imgs_dir: str, parsing_dir: str) -> None:
    """Task 4 (reference :46-51): BiSeNet head/neck/torso/bg parsing."""
    from .face_parsing import run_parsing
    run_parsing(ori_imgs_dir, parsing_dir)


def extract_background(base_dir: str, ori_imgs_dir: str) -> None:
    """Task 5 (reference :89-...): background plate by taking, per pixel, the
    sampled frame where the pixel is farthest from any foreground, then
    nearest-foreground-fill for never-background pixels."""
    import cv2
    from scipy.spatial import cKDTree
    print("[INFO] extract background")
    image_paths = sorted(glob.glob(os.path.join(ori_imgs_dir, "*.jpg")),
                         key=lambda p: int(os.path.basename(p).split(".")[0]))
    image_paths = image_paths[::20]
    h, w = cv2.imread(image_paths[0]).shape[:2]
    all_xys = np.mgrid[0:h, 0:w].reshape(2, -1).T

    dists = []
    for p in image_paths:
        parse = cv2.imread(p.replace("ori_imgs", "parsing")
                           .replace(".jpg", ".png"))
        bg = (parse[..., 0] == 255) & (parse[..., 1] == 255) & \
             (parse[..., 2] == 255)
        fg_xys = np.stack(np.nonzero(~bg)).T
        tree = cKDTree(fg_xys)
        d, _ = tree.query(all_xys, k=1)
        dists.append(d)
    dists = np.stack(dists)                      # [S, h*w]
    max_dist = dists.max(0)
    max_id = dists.argmax(0)

    imgs = np.stack([cv2.imread(p) for p in image_paths]).reshape(
        len(image_paths), -1, 3)
    bc = np.zeros((h * w, 3), np.uint8)
    far = max_dist > 5
    far_idx = np.nonzero(far)[0]
    bc[far_idx] = imgs[max_id[far_idx], far_idx]
    bc = bc.reshape(h, w, 3)

    # fill pixels that were never clearly background from their nearest
    # background pixel
    far2 = (max_dist > 5).reshape(h, w)
    fg_xys = np.stack(np.nonzero(far2)).T
    bg_xys = np.stack(np.nonzero(~far2)).T
    if len(bg_xys) and len(fg_xys):
        tree = cKDTree(fg_xys)
        _, idx = tree.query(bg_xys, k=1)
        src = fg_xys[idx]
        bc[bg_xys[:, 0], bg_xys[:, 1]] = bc[src[:, 0], src[:, 1]]
    cv2.imwrite(os.path.join(base_dir, "bc.jpg"), bc)


def extract_torso_and_gt(base_dir: str, ori_imgs_dir: str) -> None:
    """Task 6 (reference :199-...): gt = frame with bg replaced by the plate;
    torso RGBA with vertical head-hole inpainting and neck blending."""
    import cv2
    from scipy.ndimage import binary_dilation
    print("[INFO] extract torso + gt")
    bg_image = cv2.imread(os.path.join(base_dir, "bc.jpg"))
    os.makedirs(os.path.join(base_dir, "gt_imgs"), exist_ok=True)
    os.makedirs(os.path.join(base_dir, "torso_imgs"), exist_ok=True)

    for image_path in sorted(glob.glob(os.path.join(ori_imgs_dir, "*.jpg"))):
        ori = cv2.imread(image_path)
        seg = cv2.imread(image_path.replace("ori_imgs", "parsing")
                         .replace(".jpg", ".png"))
        head = (seg[..., 0] == 255) & (seg[..., 1] == 0) & (seg[..., 2] == 0)
        neck = (seg[..., 0] == 0) & (seg[..., 1] == 255) & (seg[..., 2] == 0)
        torso = (seg[..., 0] == 0) & (seg[..., 1] == 0) & (seg[..., 2] == 255)
        bg = (seg[..., 0] == 255) & (seg[..., 1] == 255) & (seg[..., 2] == 255)

        gt = ori.copy()
        gt[bg] = bg_image[bg]
        cv2.imwrite(image_path.replace("ori_imgs", "gt_imgs"), gt)

        torso_img = gt.copy()
        torso_img[head] = bg_image[head]
        alpha = 255 * np.ones((gt.shape[0], gt.shape[1], 1), np.uint8)

        def column_tops(part):
            coords = np.stack(np.nonzero(part), -1)
            if len(coords) == 0:
                return None, None
            order = np.lexsort((coords[:, 0], coords[:, 1]))
            coords = coords[order]
            _, uid, ucnt = np.unique(coords[:, 1], return_index=True,
                                     return_counts=True)
            return coords[uid], ucnt

        inpaint_torso_mask = None
        tops, _ = column_tops(torso)
        if tops is not None:
            L = 9
            above = tops - np.array([1, 0])
            ok = head[tuple(above.T)]
            if ok.any():
                tops = tops[ok]
                colors = gt[tuple(tops.T)]
                coords = tops[None].repeat(L, 0)
                coords = coords + np.stack(
                    [-np.arange(L), np.zeros(L, np.int64)], -1)[:, None]
                coords = coords.reshape(-1, 2).clip(0, None)
                cols = (colors[None].repeat(L, 0)
                        * (0.98 ** np.arange(L)).reshape(L, 1, 1)).reshape(-1, 3)
                torso_img[tuple(coords.T)] = cols
                inpaint_torso_mask = np.zeros(gt.shape[:2], bool)
                inpaint_torso_mask[tuple(coords.T)] = True

        push_down = 4
        L = 48 + push_down + 1
        neck_d = binary_dilation(
            neck, structure=np.array([[0, 1, 0], [0, 1, 0], [0, 1, 0]], bool),
            iterations=3)
        tops, ucnt = column_tops(neck_d)
        inpaint_mask = np.zeros(gt.shape[:2], bool)
        if tops is not None:
            above = tops - np.array([1, 0])
            ok = head[tuple(above.clip(0, None).T)]
            tops = tops[ok]
            if len(tops):
                off = np.minimum(ucnt[ok] - 1, push_down)
                tops = tops + np.stack([off, np.zeros_like(off)], -1)
                colors = gt[tuple(tops.T)]
                coords = tops[None].repeat(L, 0)
                coords = coords + np.stack(
                    [-np.arange(L), np.zeros(L, np.int64)], -1)[:, None]
                coords = coords.reshape(-1, 2).clip(0, None)
                cols = (colors[None].repeat(L, 0)
                        * (0.98 ** np.arange(L)).reshape(L, 1, 1)).reshape(-1, 3)
                torso_img[tuple(coords.T)] = cols
                inpaint_mask[tuple(coords.T)] = True
                blur = cv2.GaussianBlur(torso_img, (5, 5), 0)
                torso_img[inpaint_mask] = blur[inpaint_mask]

        mask = neck_d | torso | inpaint_mask
        if inpaint_torso_mask is not None:
            mask |= inpaint_torso_mask
        torso_img[~mask] = 0
        alpha[~mask] = 0
        cv2.imwrite(image_path.replace("ori_imgs", "torso_imgs")
                    .replace(".jpg", ".png"),
                    np.concatenate([torso_img, alpha], -1))


def extract_landmarks(ori_imgs_dir: str) -> None:
    """Task 7 (reference :54-86): 68-pt landmarks via face_alignment when
    installed, else the native from-scratch FAN tracker (landmarks.py) with
    public 2DFAN-4 weights."""
    try:
        import face_alignment
    except ImportError:
        from .landmarks import extract_landmarks_fan
        extract_landmarks_fan(ori_imgs_dir)
        return
    import cv2
    try:
        fa = face_alignment.FaceAlignment(
            face_alignment.LandmarksType._2D, flip_input=False)
    except AttributeError:
        fa = face_alignment.FaceAlignment(
            face_alignment.LandmarksType.TWO_D, flip_input=False)
    for image_path in sorted(glob.glob(os.path.join(ori_imgs_dir, "*.jpg"))):
        img = cv2.cvtColor(cv2.imread(image_path), cv2.COLOR_BGR2RGB)
        preds = fa.get_landmarks(img)
        if preds:
            np.savetxt(image_path.replace("jpg", "lms"),
                       preds[0].reshape(-1, 2)[:, :2], "%f")


def face_tracking(base_dir: str, ori_imgs_dir: str) -> None:
    """Task 8: head-pose tracking -> track_params (reference uses a BFM 3DMM
    photometric tracker; here a native landmark/PnP tracker, see tracker.py)."""
    from .tracker import track_poses
    track_poses(base_dir, ori_imgs_dir)


def euler2rot(euler: np.ndarray) -> np.ndarray:
    """XYZ euler -> rotation matrices, matching the reference convention
    (process.py save_transforms euler2rot)."""
    theta, phi, psi = euler[:, 0], euler[:, 1], euler[:, 2]
    one = np.ones_like(theta)
    zero = np.zeros_like(theta)
    rx = np.stack([one, zero, zero,
                   zero, np.cos(theta), np.sin(theta),
                   zero, -np.sin(theta), np.cos(theta)], -1).reshape(-1, 3, 3)
    ry = np.stack([np.cos(phi), zero, -np.sin(phi),
                   zero, one, zero,
                   np.sin(phi), zero, np.cos(phi)], -1).reshape(-1, 3, 3)
    rz = np.stack([np.cos(psi), -np.sin(psi), zero,
                   np.sin(psi), np.cos(psi), zero,
                   zero, zero, one], -1).reshape(-1, 3, 3)
    return rx @ ry @ rz


def save_transforms(base_dir: str, ori_imgs_dir: str,
                    last_seconds_val: float | None = None,
                    fps: int = 25) -> None:
    """Task 9 (reference :396-...) + split.py variant: write
    transforms_{train,val}.json from track_params. Default split keeps
    1/11 of frames for val; ``last_seconds_val`` switches to the split.py
    rule (last N seconds as val)."""
    import cv2
    print("[INFO] save transforms")
    image_paths = glob.glob(os.path.join(ori_imgs_dir, "*.jpg"))
    h, w = cv2.imread(image_paths[0]).shape[:2]

    params = load_track_params(base_dir)
    focal = params["focal"]
    euler = params["euler"]
    trans = params["trans"] / 10.0
    n = euler.shape[0]

    rot = euler2rot(euler)
    rot_inv = rot.transpose(0, 2, 1)
    trans_inv = -(rot_inv @ trans[:, :, None])[:, :, 0]

    if last_seconds_val is not None:
        split_at = n - int(fps * last_seconds_val) - 1   # split.py:53
    else:
        split_at = int(n * 10 / 11)
    splits = {"train": range(0, split_at), "val": range(split_at, n)}

    for name, ids in splits.items():
        out = {"focal_len": float(np.ravel(focal)[0]),
               "cx": w / 2.0, "cy": h / 2.0, "frames": []}
        for i in ids:
            pose = np.eye(4)
            pose[:3, :3] = rot_inv[i]
            pose[:3, 3] = trans_inv[i]
            out["frames"].append({"img_id": int(i), "aud_id": int(i),
                                  "transform_matrix": pose.tolist()})
        with open(os.path.join(base_dir, f"transforms_{name}.json"), "w") as f:
            json.dump(out, f, indent=2, separators=(",", ": "))


def load_track_params(base_dir: str) -> dict:
    """Read track_params from .npz (ours) or .pt (reference tracker)."""
    npz = os.path.join(base_dir, "track_params.npz")
    if os.path.exists(npz):
        return dict(np.load(npz))
    pt = os.path.join(base_dir, "track_params.pt")
    import torch
    d = torch.load(pt, map_location="cpu", weights_only=False)
    return {k: np.asarray(v) for k, v in d.items()}


def _copy_synthetic_gt(gt_dir: str, base_dir: str, ori_imgs_dir: str,
                       parsing_dir: str, what: str) -> None:
    """Satisfy a weights-gated task from a synthetic-GT stub directory
    (data/synthetic_hard.py render_hard_video): the generator knows the
    exact parsing masks / landmarks / teeth masks / AUs, so the chain can
    run end-to-end in-env with zero external checkpoints. Frame counts
    must match the extracted video frames."""
    n_frames = len(glob.glob(os.path.join(ori_imgs_dir, "*.jpg")))
    if what == "parsing":
        srcs = sorted(glob.glob(os.path.join(gt_dir, "parsing", "*.png")))
        dst = parsing_dir
    elif what == "landmarks":
        srcs = sorted(glob.glob(os.path.join(gt_dir, "ori_imgs", "*.lms")))
        dst = ori_imgs_dir
    elif what == "teeth":
        srcs = sorted(glob.glob(os.path.join(gt_dir, "teeth_mask", "*.npy")))
        dst = os.path.join(base_dir, "teeth_mask")
        os.makedirs(dst, exist_ok=True)
    else:
        raise ValueError(what)
    if len(srcs) != n_frames:
        raise RuntimeError(
            f"synthetic GT stub has {len(srcs)} {what} files but the video "
            f"extracted {n_frames} frames — regenerate the stub at the "
            f"video's frame count")
    print(f"[INFO] synthetic GT: copying {len(srcs)} {what} files")
    for s in srcs:
        shutil.copy(s, os.path.join(dst, os.path.basename(s)))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("path", type=str, help="path to video file")
    parser.add_argument("--task", type=int, default=-1, help="-1 = all")
    parser.add_argument("--asr", type=str, default="deepspeech")
    parser.add_argument("--synthetic_gt", type=str, default=None,
                        help="synthetic-GT stub dir (render_hard_video): "
                             "satisfies the weights-gated tasks 4/7/11 "
                             "(parsing/landmarks/teeth) + au.csv by copying "
                             "the generator's exact masks instead of "
                             "running BiSeNet/FAN/EasyPortrait/OpenFace")
    opt = parser.parse_args(argv)

    base_dir = os.path.dirname(opt.path)
    wav_path = os.path.join(base_dir, "aud.wav")
    ori_imgs_dir = os.path.join(base_dir, "ori_imgs")
    parsing_dir = os.path.join(base_dir, "parsing")
    os.makedirs(ori_imgs_dir, exist_ok=True)
    os.makedirs(parsing_dir, exist_ok=True)

    t = opt.task
    gt = opt.synthetic_gt
    if t in (-1, 1):
        extract_audio(opt.path, wav_path)
    if t in (-1, 2):
        extract_audio_features(wav_path, opt.asr)
    if t in (-1, 3):
        extract_images(opt.path, ori_imgs_dir)
    if t in (-1, 4):
        if gt:
            _copy_synthetic_gt(gt, base_dir, ori_imgs_dir, parsing_dir,
                               "parsing")
        else:
            extract_semantics(ori_imgs_dir, parsing_dir)
    if t in (-1, 5):
        extract_background(base_dir, ori_imgs_dir)
    if t in (-1, 6):
        extract_torso_and_gt(base_dir, ori_imgs_dir)
    if t in (-1, 7):
        if gt:
            _copy_synthetic_gt(gt, base_dir, ori_imgs_dir, parsing_dir,
                               "landmarks")
        else:
            extract_landmarks(ori_imgs_dir)
    if t in (-1, 8):
        face_tracking(base_dir, ori_imgs_dir)
    if t in (-1, 9):
        save_transforms(base_dir, ori_imgs_dir)
        if gt and os.path.exists(os.path.join(gt, "au.csv")):
            shutil.copy(os.path.join(gt, "au.csv"),
                        os.path.join(base_dir, "au.csv"))
    if t == 10:   # split.py variant: last 12 s as val
        save_transforms(base_dir, ori_imgs_dir, last_seconds_val=12)
    if t in (-1, 11):  # teeth masks (easyportrait equivalent)
        if gt:
            _copy_synthetic_gt(gt, base_dir, ori_imgs_dir, parsing_dir,
                               "teeth")
        else:
            from .priors import create_teeth_masks
            create_teeth_masks(base_dir, ori_imgs_dir)
    if t == 12:        # sapiens geometry priors (optional, few-shot only)
        from .priors import run_sapiens
        run_sapiens(base_dir)


if __name__ == "__main__":
    main()
