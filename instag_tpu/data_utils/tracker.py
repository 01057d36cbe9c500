"""Head-pose + photometric 3DMM tracker (task 8).

Native replacement for the reference's BFM-2009 tracker
(data_utils/face_tracking/face_tracker.py), in the same stages:
  1. focal-length grid search over 600-1400 by landmark reprojection error
     (:60-130) with PnP against a canonical 68-landmark template;
  2. per-frame PnP pose + temporal smoothing — the initialization;
  3. when a morphable model is available (``model_path`` arg, the
     ``INSTAG_3DMM`` env var, or ``<base>/3DMM/3dmm_model.npz`` — convert
     the reference's 3DMM_info.npy with ``face_model.convert_bfm_info``),
     the full photometric fit (photometric.py): landmark pose refit, joint
     id/exp, texture + SH lighting on a 32-frame batch, per-batch fine fit
     (:159-350) over the JAX differentiable mesh renderer — filling the
     ``id``/``exp``/``light`` outputs the PnP-only path zeroes.

Output: track_params.npz with {euler [N,3], trans [N,3] (stored x10 like
the reference — see camera_extrinsic_toy_test readme and the /10.0 at
process.py:404), focal [1], id [100], exp [N,79], light [N,27]}.
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


def _find_model(base_dir: str, model_path: str | None) -> str | None:
    for cand in (model_path, os.environ.get("INSTAG_3DMM"),
                 os.path.join(base_dir, "3DMM", "3dmm_model.npz")):
        if cand and os.path.exists(cand):
            return cand
    return None


def track_poses(base_dir: str, ori_imgs_dir: str,
                focal_candidates=range(600, 1500, 100),
                smooth: int = 5, model_path: str | None = None,
                photometric_iters=(400, 600, 60, 40),
                downscale: int = 4, model=None) -> None:
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

    # stage 3: photometric 3DMM fit (reference :159-350) when a morphable
    # model is available; refines pose and fills id/exp/light
    id_out = np.zeros((100,), np.float32)
    exp_out = np.zeros((len(lms), 79), np.float32)
    light_out = np.zeros((len(lms), 27), np.float32)
    mpath = None if model is not None else _find_model(base_dir, model_path)
    if model is not None or mpath is not None:
        from .face_model import load_model
        from .photometric import fit_photometric
        if model is None:
            model = load_model(mpath)
        ds = max(1, downscale)
        imgs = []
        for p in lms_paths:
            im = cv2.imread(p.replace(".lms", ".jpg"))[:, :, ::-1]
            if ds > 1:
                im = cv2.resize(im, (w // ds, h // ds),
                                interpolation=cv2.INTER_AREA)
            imgs.append(im.astype(np.float32) / 255.0)
        imgs = np.stack(imgs)
        fit = fit_photometric(
            model, (lms / ds).astype(np.float32), imgs,
            best_focal / ds, cx / ds, cy / ds,
            euler_init=rot2euler(Rs), trans_init=ts,
            iters=photometric_iters)
        print(f"[tracker] photometric fit: landmark err "
              f"{fit['lan_err_px'] * ds:.2f}px (was PnP {best_err:.2f}px)")
        from .photometric import euler2rot_jax
        Rs = np.asarray(euler2rot_jax(fit["euler"]))
        ts = fit["trans"].astype(np.float64)
        nid = min(100, fit["id"].shape[0])
        id_out[:nid] = fit["id"][:nid]
        nexp = min(79, fit["exp"].shape[1])
        exp_out[:, :nexp] = fit["exp"][:, :nexp]
        light_out[:] = fit["light"]
        smooth = 1  # the fine stage already smooths (rigid-vertex laplacian)

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
             id=id_out, exp=exp_out, light=light_out)
    print(f"[tracker] wrote track_params.npz for {len(lms)} frames")
