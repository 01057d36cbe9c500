import os

import numpy as np
import pytest

from instag_tpu.data.audio import (AudioWindows, load_wav, mel_filterbank,
                                   melspectrogram, window_audio_features)
from instag_tpu.data.dataset import load_frames, random_init_points, scene_extent
from instag_tpu.data.plyio import (read_ply, read_point_cloud, write_ply,
                                   write_point_cloud)
from instag_tpu.data.synthetic import generate_scene

pytestmark = pytest.mark.smoke  # fast contract tier: pytest -m smoke < 5 min


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (100, 3)).astype(np.uint8)
    p = str(tmp_path / "pc.ply")
    write_point_cloud(p, xyz, rgb)
    xyz2, col2 = read_point_cloud(p)
    np.testing.assert_allclose(xyz2, xyz, rtol=1e-6)
    np.testing.assert_allclose(col2, rgb / 255.0, atol=1e-6)


def test_ply_generic_fields(tmp_path):
    p = str(tmp_path / "gauss.ply")
    names = ["x", "y", "opacity"]
    arrays = [np.arange(5, dtype=np.float32), np.ones(5, np.float32),
              np.full(5, -2.5, np.float32)]
    write_ply(p, names, arrays)
    d = read_ply(p)
    np.testing.assert_allclose(d["opacity"], -2.5)
    np.testing.assert_allclose(d["x"], np.arange(5))


def test_mel_filterbank_shape_and_norm():
    fb = mel_filterbank()
    assert fb.shape == (80, 401)
    # every filter has nonzero support; slaney normalization keeps rows small
    assert (fb.sum(axis=1) > 0).all()


def test_melspectrogram_range():
    t = np.arange(16000, dtype=np.float32)
    wav = 0.5 * np.sin(2 * np.pi * 440 * t / 16000)
    mel = melspectrogram(wav)
    assert mel.shape[0] == 80
    assert mel.min() >= -4.0 and mel.max() <= 4.0
    # a pure tone has energy concentrated in few bands
    band_energy = mel.mean(axis=1)
    assert band_energy.argmax() < 40


def test_audio_windows_len_and_shape():
    wav = np.random.default_rng(0).normal(size=32000).astype(np.float32) * 0.1
    ds = AudioWindows(wav)
    assert len(ds) > 40  # 2 seconds at 25 fps
    crop = ds[0]
    assert crop.shape == (1, 80, 16)
    crop_last = ds[len(ds) - 1]
    assert crop_last.shape == (1, 80, 16)


def test_window_audio_features_padding():
    feats = np.arange(10, dtype=np.float32)[:, None]  # [10, 1]
    w = window_audio_features(feats, 0)
    assert w.shape == (8, 1)
    np.testing.assert_array_equal(w[:4, 0], 0)  # left-padded
    np.testing.assert_array_equal(w[4:, 0], [0, 1, 2, 3])
    w2 = window_audio_features(feats, 9)
    np.testing.assert_array_equal(w2[:, 0], [5, 6, 7, 8, 9, 0, 0, 0])


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("scene"))
    generate_scene(d, n_frames=6, size=64, n_val=2)
    return d


def test_synthetic_scene_reader_roundtrip(scene_dir):
    recs = load_frames(scene_dir, "train", "deepspeech", n_views=-1)
    assert len(recs) == 6
    r = recs[0]
    assert r.image.shape == (64, 64, 3)
    assert r.bg.shape == (64, 64, 3)
    assert r.auds.shape == (8, 29, 16)
    assert r.au_exp.shape == (6,)
    assert r.face_mask.dtype == bool
    assert r.face_mask.sum() > 50          # head blob present
    assert r.mouth_mask.sum() > 5
    assert r.view_transform.shape == (4, 4)
    # camera orbits at radius ~10/3 looking at the origin
    assert abs(np.linalg.norm(r.camera_center) - 10 / 3) < 0.05
    # lips rect is inside the image
    xmin, xmax, ymin, ymax = r.lips_rect
    assert 0 <= xmin < xmax <= 64 and 0 <= ymin < ymax <= 64


def test_val_split_and_extent(scene_dir):
    val = load_frames(scene_dir, "val", "deepspeech")
    assert len(val) == 2
    train = load_frames(scene_dir, "train", "deepspeech")
    center, radius = scene_extent(train)
    assert radius > 0


def test_n_views_cap(scene_dir):
    recs = load_frames(scene_dir, "train", "deepspeech", n_views=3)
    assert len(recs) == 3
    # few-shot mode looks for sapiens priors; none exist -> None
    assert recs[0].normal is None


def test_random_init_points():
    xyz, colors = random_init_points(500)
    assert xyz.shape == (500, 3)
    assert np.abs(xyz).max() <= 0.1
    assert colors.min() >= 0.0 and colors.max() <= 1.0


def test_frame_projection_sees_head(scene_dir):
    """Project the origin through a frame's camera: must land mid-image."""
    recs = load_frames(scene_dir, "train", "deepspeech")
    r = recs[0]
    p = np.array([0.0, 0.0, 0.0, 1.0]) @ r.full_proj_transform
    ndc = p[:3] / p[3]
    px = ((ndc[0] + 1) * r.width - 1) * 0.5
    py = ((ndc[1] + 1) * r.height - 1) * 0.5
    assert 20 < px < 44 and 20 < py < 44  # near image center


def test_motion_dims_default_bit_identical(tmp_path):
    """motion_dims=1 (default) must reproduce the historical scenes exactly
    (fixtures + recorded experiments depend on it); motion_dims=3 must stay
    a valid dataset whose audio track carries the extra signals."""
    import hashlib

    def digest(d):
        h = hashlib.sha256()
        for root, _, files in sorted(os.walk(d)):
            for f in sorted(files):
                h.update(f.encode())
                h.update(open(os.path.join(root, f), "rb").read())
        return h.hexdigest()

    a, b, c = (tmp_path / n for n in ("a", "b", "c"))
    generate_scene(str(a), n_frames=5, size=64, n_val=2, variation=1.0,
                   seed=3)
    generate_scene(str(b), n_frames=5, size=64, n_val=2, variation=1.0,
                   seed=3, motion_dims=1)
    assert digest(a) == digest(b)

    generate_scene(str(c), n_frames=5, size=64, n_val=2, variation=1.0,
                   seed=3, motion_dims=3)
    assert digest(c) != digest(a)
    aud_a = np.load(a / "aud_ds.npy")
    aud_c = np.load(c / "aud_ds.npy")
    assert aud_a.shape == aud_c.shape
    assert not np.allclose(aud_a, aud_c)
    from instag_tpu.data.dataset import load_frames
    recs = load_frames(str(c), "train", "deepspeech", -1)
    assert len(recs) == 5
