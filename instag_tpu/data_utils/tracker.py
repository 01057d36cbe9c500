"""Landmark-based head-pose tracker (task 8).

Native replacement for the reference's BFM-2009 photometric tracker
(data_utils/face_tracking/face_tracker.py): instead of a pytorch3d
differentiable-mesh fit, per-frame pose comes from PnP against a canonical
3-D 68-landmark template, with the same two outer stages the reference uses —
(1) focal-length grid search over 600-1400 by landmark reprojection error
(:60-130), (2) per-frame pose refinement (:317-350; here RANSAC-PnP + a
temporal smoothing pass). Output: track_params.npz with
{euler [N,3], trans [N,3] (stored x10 like the reference — see
camera_extrinsic_toy_test readme and the /10.0 at process.py:404),
focal [1], id, exp, light (zeros — appearance fitting is 3DMM-specific and
not needed by any downstream consumer of this pipeline)}.
"""

from __future__ import annotations

import glob
import os

import numpy as np


def canonical_landmarks_3d() -> np.ndarray:
    """Approximate canonical 68-point 3-D face template, head ~0.25 units
    wide, centered at the origin, +y up, +z toward the camera (the world
    convention the dataset reader expects: the fitted head sits at the
    origin inside the bound-0.15 motion volume after the /10 scaling)."""
    P = np.zeros((68, 3), np.float32)
    # jaw (0-16): ellipse from left to right, receding in z toward the ears
    t = np.linspace(-np.pi / 2, np.pi / 2, 17)
    P[0:17, 0] = 1.10 * np.sin(t)
    P[0:17, 1] = -0.9 * np.cos(t) - 0.15
    P[0:17, 2] = -0.45 * np.abs(np.sin(t))
    # brows (17-26)
    bx = np.linspace(-0.75, -0.15, 5)
    P[17:22, 0] = bx;  P[17:22, 1] = 0.55
    P[17:22, 2] = 0.10 - 0.1 * np.abs(bx + 0.45)
    P[22:27, 0] = -bx[::-1]; P[22:27, 1] = 0.55
    P[22:27, 2] = P[17:22, 2][::-1]
    # nose ridge (27-30) + base (31-35)
    P[27:31, 0] = 0.0
    P[27:31, 1] = np.linspace(0.42, -0.05, 4)
    P[27:31, 2] = np.linspace(0.18, 0.45, 4)
    P[31:36, 0] = np.linspace(-0.22, 0.22, 5)
    P[31:36, 1] = -0.18
    P[31:36, 2] = 0.30 - 0.25 * np.abs(np.linspace(-1, 1, 5))
    # eyes (36-41 left, 42-47 right)
    for k, ex in enumerate([-0.45, 0.45]):
        a = np.linspace(0, 2 * np.pi, 6, endpoint=False)
        P[36 + 6 * k: 42 + 6 * k, 0] = ex + 0.16 * np.cos(a)
        P[36 + 6 * k: 42 + 6 * k, 1] = 0.30 + 0.08 * np.sin(a)
        P[36 + 6 * k: 42 + 6 * k, 2] = 0.05
    # outer lips (48-59), inner lips (60-67)
    a = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    P[48:60, 0] = 0.32 * np.cos(a)
    P[48:60, 1] = -0.55 + 0.14 * np.sin(a)
    P[48:60, 2] = 0.22
    a = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    P[60:68, 0] = 0.20 * np.cos(a)
    P[60:68, 1] = -0.55 + 0.07 * np.sin(a)
    P[60:68, 2] = 0.24
    return P * 0.12  # head ≈ 0.26 units wide


# pose-stable subset: brows excluded, mouth excluded (they deform)
_RIGID = np.array([0, 2, 4, 8, 12, 14, 16, 27, 28, 29, 30, 31, 33, 35,
                   36, 39, 42, 45])


def rot2euler(R: np.ndarray) -> np.ndarray:
    """Inverse of process.euler2rot (R = Rx(θ) Ry(φ) Rz(ψ)); batched."""
    phi = np.arcsin(-R[:, 0, 2])
    psi = np.arctan2(-R[:, 0, 1], R[:, 0, 0])
    theta = np.arctan2(R[:, 1, 2], R[:, 2, 2])
    return np.stack([theta, phi, psi], -1)


def _solve_frame(cv2, obj, img_pts, K):
    ok, rvec, tvec = cv2.solvePnP(obj.astype(np.float64),
                                  img_pts.astype(np.float64), K, None,
                                  flags=cv2.SOLVEPNP_EPNP)
    if ok:
        rvec, tvec = cv2.solvePnPRefineLM(obj.astype(np.float64),
                                          img_pts.astype(np.float64), K,
                                          None, rvec, tvec)
    return ok, rvec, tvec


def track_poses(base_dir: str, ori_imgs_dir: str,
                focal_candidates=range(600, 1500, 100),
                smooth: int = 5) -> None:
    import cv2
    lms_paths = sorted(glob.glob(os.path.join(ori_imgs_dir, "*.lms")),
                       key=lambda p: int(os.path.basename(p).split(".")[0]))
    assert lms_paths, f"no .lms landmark files under {ori_imgs_dir}"
    lms = np.stack([np.loadtxt(p) for p in lms_paths])   # [N, 68, 2] (x, y)
    img0 = cv2.imread(lms_paths[0].replace(".lms", ".jpg"))
    h, w = img0.shape[:2]
    cx, cy = w / 2.0, h / 2.0

    # The template is the world-frame geometry (head at origin, +y up);
    # the pixel y-down convention is carried by the COLMAP-style camera
    # rotation PnP recovers, not by flipping the object points.
    obj = canonical_landmarks_3d()
    rigid_obj = obj[_RIGID]

    # stage 1: focal grid search on a frame subset (reference :60-130)
    subset = lms[:: max(1, len(lms) // 20)]
    best_focal, best_err = None, np.inf
    for f in focal_candidates:
        K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], np.float64)
        errs = []
        for frame_lms in subset:
            pts = frame_lms[_RIGID]
            ok, rvec, tvec = _solve_frame(cv2, rigid_obj, pts, K)
            if not ok:
                continue
            proj, _ = cv2.projectPoints(rigid_obj, rvec, tvec, K, None)
            errs.append(np.linalg.norm(proj[:, 0] - pts, axis=-1).mean())
        err = np.mean(errs) if errs else np.inf
        if err < best_err:
            best_focal, best_err = f, err
    print(f"[tracker] focal={best_focal} (reproj err {best_err:.2f}px)")

    # stage 2: per-frame pose
    K = np.array([[best_focal, 0, cx], [0, best_focal, cy], [0, 0, 1]],
                 np.float64)
    Rs, ts = [], []
    prev = None
    for frame_lms in lms:
        ok, rvec, tvec = _solve_frame(cv2, rigid_obj, frame_lms[_RIGID], K)
        if not ok and prev is not None:
            rvec, tvec = prev
        prev = (rvec, tvec)
        R, _ = cv2.Rodrigues(rvec)
        Rs.append(R)
        ts.append(tvec[:, 0])
    Rs = np.stack(Rs)
    ts = np.stack(ts)

    # PnP gives world->COLMAP-camera (x right, y down, z forward). The
    # transforms json stores OpenGL-convention c2w that the reader flips
    # back to COLMAP (dataset.py _camera_matrices), so the stored w2c must
    # be the OpenGL-camera one: negate the camera's y/z axes (left-multiply
    # by diag(1,-1,-1)).
    F = np.diag([1.0, -1.0, -1.0])
    Rs = F @ Rs
    ts = ts @ F.T

    # temporal smoothing of translations (the reference smooths within its
    # 32-frame batches)
    if smooth > 1:
        kernel = np.ones(smooth) / smooth
        pad = smooth // 2
        tp = np.pad(ts, ((pad, pad), (0, 0)), mode="edge")
        ts = np.stack([np.convolve(tp[:, i], kernel, "valid")
                       for i in range(3)], -1)

    euler = rot2euler(Rs)
    np.savez(os.path.join(base_dir, "track_params.npz"),
             euler=euler.astype(np.float32),
             trans=(ts * 10.0).astype(np.float32),
             focal=np.array([best_focal], np.float32),
             id=np.zeros((100,), np.float32),
             exp=np.zeros((len(lms), 79), np.float32),
             light=np.zeros((len(lms), 27), np.float32))
    print(f"[tracker] wrote track_params.npz for {len(lms)} frames")
