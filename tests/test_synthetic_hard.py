"""Hard synthetic identity family (data/synthetic_hard.py) contract tests.

The family exists to give the quality stack an outcome surface the blob
scenes lack (VERDICT r4: texture for LPIPS/SH, AU-driven blink geometry,
teeth, hair, an audio->motion map 75 frames undersample). These tests pin
the on-disk contract, the camera consistency with the dataset reader, and
the QUANTITATIVE scene properties the flagship transfer A/B relies on.
"""

import json
import os

import numpy as np
import pytest

from instag_tpu.data.synthetic_hard import (_Identity, _MotionModel,

                                            generate_hard_scene)

pytestmark = pytest.mark.smoke  # fast contract tier: pytest -m smoke < 5 min


@pytest.fixture(scope="module")
def hard_scene(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hard") / "id0")
    generate_hard_scene(path, n_frames=24, size=128, seed=3, n_val=4,
                        supersample=1)
    return path


def test_on_disk_contract(hard_scene):
    for sub in ["gt_imgs", "torso_imgs", "parsing", "teeth_mask",
                "ori_imgs"]:
        assert os.path.isdir(os.path.join(hard_scene, sub))
    tr = json.load(open(os.path.join(hard_scene, "transforms_train.json")))
    va = json.load(open(os.path.join(hard_scene, "transforms_val.json")))
    assert len(tr["frames"]) == 24 and len(va["frames"]) == 4
    aud = np.load(os.path.join(hard_scene, "aud_ds.npy"))
    assert aud.shape == (28, 16, 29)
    lms = np.loadtxt(os.path.join(hard_scene, "ori_imgs", "0.lms"))
    assert lms.shape == (68, 2)
    assert (lms >= 0).all() and (lms < 128).all()


def test_reader_roundtrip(hard_scene):
    from instag_tpu.data.dataset import load_frames
    recs = load_frames(hard_scene, split="train",
                       audio_extractor="deepspeech")
    assert len(recs) == 24
    r = recs[0]
    assert r.image.shape == (128, 128, 3)
    assert r.face_mask.sum() > 500          # face region present
    assert r.hair_mask.sum() > 50           # hair region present
    assert r.mouth_mask.sum() > 10          # mouth region present
    assert r.auds.shape == (8, 29, 16)
    # teeth pixels were painted blue in parsing so the reader's
    # face_mask/mouth_mask xor logic applies (dataset.py:226-232)
    teeth = np.load(os.path.join(hard_scene, "teeth_mask", "0.npy"))
    assert not (teeth & np.asarray(r.face_mask)).any()


def test_camera_consistency_with_rasterizer(hard_scene):
    """A world point projects to the same pixel through the generator's
    ray camera and the reader's reconstructed row-vector matrices (the
    rasterizer's ndc2Pix path) — the 3D-consistency contract that makes
    the scene fittable by a Gaussian cloud."""
    from instag_tpu.data.dataset import load_frames
    from instag_tpu.data.synthetic_hard import (R_HEAD, _project,
                                                _surface_point)
    tr = json.load(open(os.path.join(hard_scene, "transforms_train.json")))
    recs = load_frames(hard_scene, split="train",
                       audio_extractor="deepspeech")
    pts = _surface_point(np.array([0.0, 0.3, -0.4]),
                         np.array([0.0, -0.3, 0.2]))
    for i in [0, 7, 19]:
        c2w = np.array(tr["frames"][i]["transform_matrix"])
        ref = _project(c2w, tr["focal_len"], 128, 128, pts)
        r = recs[i]
        hom = np.concatenate([pts, np.ones((3, 1))], -1)
        clip = hom @ np.asarray(r.full_proj_transform)   # row-vector
        ndc = clip[:, :2] / clip[:, 3:4]
        px = ((ndc[:, 0] + 1) * 128 - 1) * 0.5           # CUDA ndc2Pix
        py = ((ndc[:, 1] + 1) * 128 - 1) * 0.5
        got = np.stack([px, py], -1)
        assert np.abs(got - ref).max() < 0.35, (i, got, ref)
    # sanity: the head center projects near the image center
    assert np.abs(_project(np.array(tr["frames"][0]["transform_matrix"]),
                           tr["focal_len"], 128, 128,
                           np.zeros((1, 3))) - 63.5).max() < 8
    assert R_HEAD < 0.15                                  # hash-grid bound


def test_blink_drives_pixels_and_au45():
    """Frames at a blink peak differ from open-eye frames INSIDE the eye
    region, and AU45_r tracks the blink signal (the exp input genuinely
    drives visible geometry)."""
    import pandas as pd
    from instag_tpu.data.synthetic_hard import (_MotionModel, _Identity,
                                                _pixel_rays, _shade_frame)
    ident = _Identity(5)
    motion = _MotionModel(5, 8, 200)
    peak = int(np.argmax(motion.blink))
    assert motion.blink[peak] > 0.9
    m = motion.params(peak)
    c2w = np.eye(4)
    c2w[2, 3] = 10.0 / 3.0
    o, d = _pixel_rays(c2w, 8.0 * 128, 128, 128)
    b = d @ o
    disc = b * b - (o @ o - 0.11 ** 2)
    hit = disc > 0
    t_hit = (-b - np.sqrt(np.maximum(disc, 0)))[hit]
    n = (o[None] + t_hit[:, None] * d[hit]) / 0.11
    open_rgb, open_masks = _shade_frame(ident, n, m, 0.0, 0.0)
    closed_rgb, _ = _shade_frame(ident, n, m, 1.0, 0.0)
    eyes = open_masks["eyes"]
    assert eyes.sum() > 20
    assert np.abs(open_rgb[eyes] - closed_rgb[eyes]).max() > 30.0
    assert np.abs(open_rgb[~eyes] - closed_rgb[~eyes]).max() < 1e-3


def test_identity_variation_and_shared_decode():
    """Appearance varies per seed; the articulation DECODE is shared
    (human anatomy) while per-identity dS is small — the structure a
    universal motion field can exploit."""
    a, b = _Identity(0), _Identity(1)
    assert np.abs(a.skin - b.skin).max() > 1.0
    ma, mb = _MotionModel(0, 8, 50), _MotionModel(1, 8, 50)
    np.testing.assert_allclose(ma.S0, mb.S0)
    np.testing.assert_allclose(ma.S1, mb.S1)
    assert np.abs(ma.dS - mb.dS).max() > 1e-3
    assert np.linalg.norm(ma.dS) < 0.5 * np.linalg.norm(ma.S0 + ma.S1)
    # articulation content differs per identity (different speech)
    assert np.abs(ma.a - mb.a).max() > 0.1


def test_75_frames_undersample_the_motion_map():
    """The scene property the few-second thesis needs: a ridge fit of the
    audio->motion map from 75 frames generalizes MUCH worse than the same
    fit from 400 frames (the blob scenes failed this — 75 frames already
    covered their 1-D map, making the transfer A/B negative for scene
    reasons; VERDICT r4 missing #1)."""
    motion = _MotionModel(11, 8, 520)
    rng = np.random.default_rng(0)
    P = rng.normal(size=(8, 16, 29)).astype(np.float32) / np.sqrt(8)
    T = 500
    feats = np.stack([
        np.concatenate([motion.art(min(max(t + w - 8, 0), T - 1)) @ P[:, w]
                        for w in range(16)])
        for t in range(T)])
    targets = np.stack([motion.params(t) for t in range(T)])
    test_sl = slice(420, 500)

    def ridge_err(n_train):
        X, Y = feats[:n_train], targets[:n_train]
        lam = 1e-3 * np.eye(X.shape[1])
        W = np.linalg.solve(X.T @ X + lam, X.T @ Y)
        pred = feats[test_sl] @ W
        return float(np.sqrt(np.mean((pred - targets[test_sl]) ** 2)))

    err_75, err_400 = ridge_err(75), ridge_err(400)
    assert err_75 > 2.0 * err_400, (err_75, err_400)
