"""CLI: video-vs-video evaluation (reference metrics.py __main__):
PSNR + LPIPS, plus LMD when landmark files are supplied.

    python -m instag_tpu.cli.metrics --pred out.mp4 --gt gt.mp4 \
        [--lms_pred pred_lms_dir --lms_gt gt_lms_dir]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def _load_video(path: str) -> np.ndarray:
    if path.endswith(".npz"):
        return np.load(path)["video"]
    import cv2
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame[:, :, ::-1])  # BGR -> RGB
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return np.stack(frames)


def _load_lms_dir(path: str) -> np.ndarray:
    files = sorted(glob.glob(os.path.join(path, "*.lms")),
                   key=lambda p: int(os.path.basename(p).split(".")[0]))
    return np.stack([np.loadtxt(f) for f in files])


def main(argv=None):
    parser = argparse.ArgumentParser("metrics")
    parser.add_argument("--pred", required=True)
    parser.add_argument("--gt", required=True)
    parser.add_argument("--lms_pred", default="")
    parser.add_argument("--lms_gt", default="")
    parser.add_argument("--track", action="store_true",
                        help="run the in-repo FAN tracker on BOTH videos "
                             "for LMD (the reference metrics.py protocol, "
                             ":189-217; loud skip without FAN weights)")
    args = parser.parse_args(argv)

    from ..metrics import evaluate_frames, track_video_landmarks
    pred = _load_video(args.pred)
    gt = _load_video(args.gt)
    t = min(len(pred), len(gt))
    lp = _load_lms_dir(args.lms_pred) if args.lms_pred else None
    lg = _load_lms_dir(args.lms_gt) if args.lms_gt else None
    if args.track and lp is None:
        lp = track_video_landmarks(pred[:t])
        lg = track_video_landmarks(gt[:t]) if lp is not None else None
    if lp is not None and lg is not None:
        tl = min(len(lp), len(lg))
        lp, lg = lp[:tl], lg[:tl]
    out = evaluate_frames(pred[:t], gt[:t], lp, lg)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
