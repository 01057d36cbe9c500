"""Metrics-layer tests: LMD fixtures (VERDICT r3 item 3), GT landmark
loading, the FAN loud-skip path, and the AU-error meter."""

import numpy as np
import pytest

from instag_tpu.metrics import (au_error, evaluate_frames, lmd_from_landmarks,

                                load_gt_landmarks, track_video_landmarks,
                                video_psnr)

pytestmark = pytest.mark.smoke  # fast contract tier: pytest -m smoke < 5 min


def _base_lms(t=4, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(10, 90, size=(t, 68, 2)).astype(np.float32)


def test_lmd_zero_for_identical():
    lms = _base_lms()
    assert lmd_from_landmarks(lms, lms) == 0.0


def test_lmd_known_offset():
    """Shift ONLY the mouth points (48:68) of one side by (3, 4): the
    per-face translation normalization subtracts the all-68 centroid, which
    moves by 20/68 of the shift, so every mouth point's residual is
    (1 - 20/68)·(3,4) -> LMD = (48/68)·5 exactly."""
    a = _base_lms()
    b = a.copy()
    b[:, 48:68, :] += np.array([3.0, 4.0], np.float32)
    np.testing.assert_allclose(lmd_from_landmarks(b, a), (48 / 68) * 5.0,
                               rtol=1e-5)


def test_lmd_translation_invariant():
    """A rigid translation of the whole face is normalized away
    (reference LMDMeter subtracts the face center, metrics.py:8-177)."""
    a = _base_lms()
    b = a + np.array([17.0, -9.0], np.float32)
    assert lmd_from_landmarks(a, b) < 1e-4


def test_load_gt_landmarks(tmp_path):
    d = tmp_path / "ori_imgs"
    d.mkdir()
    lms = _base_lms(t=2)
    np.savetxt(d / "3.lms", lms[0], "%.2f")
    np.savetxt(d / "7.lms", lms[1], "%.2f")
    out = load_gt_landmarks(str(tmp_path), [3, 7])
    assert out.shape == (2, 68, 2)
    np.testing.assert_allclose(out, np.round(lms, 2), atol=1e-6)
    # any missing file -> None (caller skips LMD)
    assert load_gt_landmarks(str(tmp_path), [3, 99]) is None


def test_track_video_landmarks_loud_skip(capsys, monkeypatch):
    """Without FAN weights (egress-gated in this image) the tracker is
    unavailable: track_video_landmarks returns None and says so loudly."""
    monkeypatch.delenv("INSTAG_FAN_WEIGHTS", raising=False)
    frames = np.zeros((2, 32, 32, 3), np.uint8)
    out = track_video_landmarks(frames)
    if out is None:
        assert "LMD SKIPPED" in capsys.readouterr().out
    else:  # weights-mounted host: the tracker ran for real
        assert out.shape == (2, 68, 2)


def test_evaluate_frames_keys_and_psnr():
    rng = np.random.default_rng(1)
    gt = rng.integers(0, 255, (3, 64, 64, 3), dtype=np.uint8)
    noisy = np.clip(gt.astype(np.int32)
                    + rng.integers(-8, 8, gt.shape), 0, 255).astype(np.uint8)
    scores = evaluate_frames(noisy, gt)
    assert {"psnr", "lpips", "lpips_real"} <= set(scores)
    assert 25 < scores["psnr"] < 45
    assert video_psnr(gt, gt) > 90  # identical frames


def test_au_error_fixture(tmp_path):
    import pandas as pd
    from instag_tpu.metrics import AU_COLS, AU_LOWER, AU_UPPER
    t = 5
    a = {f"AU{i:02d}_r": np.zeros(t) for i in AU_COLS}
    b = {f"AU{i:02d}_r": np.zeros(t) for i in AU_COLS}
    b["AU25_r"] += 2.0                      # lower-face AU, MSE 4
    b["AU45_r"] += 1.0                      # upper-face AU, MSE 1
    pa, pb = tmp_path / "a.csv", tmp_path / "b.csv"
    pd.DataFrame(a).to_csv(pa, index=False)
    pd.DataFrame(b).to_csv(pb, index=False)
    out = au_error(str(pa), str(pb))
    np.testing.assert_allclose(out["au_lower"], 4.0 / len(AU_LOWER))
    np.testing.assert_allclose(out["au_upper"], 1.0 / len(AU_UPPER))
    np.testing.assert_allclose(out["au_all"], 5.0 / len(AU_COLS))
