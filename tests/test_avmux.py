"""Audio-mux tests (VERDICT r3 item 6/8): tail alignment, the pure-Python
MJPEG+PCM AVI container (decodable by OpenCV, PCM bit-exact on re-parse),
and the wav reader."""

import os
import struct
import wave

import numpy as np
import pytest

from instag_tpu.io.avmux import (mux_audio, read_wav_mono, tail_audio,

                                 write_avi_mjpeg_pcm)

pytestmark = pytest.mark.smoke  # fast contract tier: pytest -m smoke < 5 min


def _write_wav(path, samples, sr=16000, ch=1):
    with wave.open(str(path), "wb") as f:
        f.setnchannels(ch)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(np.asarray(samples, np.int16).tobytes())


def _sine(n, sr=16000, hz=440):
    t = np.arange(n) / sr
    return (np.sin(2 * np.pi * hz * t) * 12000).astype(np.int16)


def test_read_wav_mono_roundtrip(tmp_path):
    s = _sine(16000)
    _write_wav(tmp_path / "a.wav", s)
    out, sr = read_wav_mono(str(tmp_path / "a.wav"))
    assert sr == 16000
    np.testing.assert_array_equal(out, s)


def test_tail_audio_alignment():
    sr, fps = 16000, 25
    s = np.arange(sr * 4, dtype=np.int16)     # 4 s ramp
    out = tail_audio(s, sr, n_frames=50, fps=fps)   # want last 2 s
    assert len(out) == sr * 2
    np.testing.assert_array_equal(out, s[-sr * 2:])
    # shorter track zero-pads at the FRONT (tail stays aligned to the end)
    short = tail_audio(s[:sr], sr, n_frames=50, fps=fps)
    assert len(short) == sr * 2
    assert (short[:sr] == 0).all()
    np.testing.assert_array_equal(short[sr:], s[:sr])


def _parse_avi_pcm(path):
    """Concatenate every 01wb chunk's payload (linear scan of movi)."""
    blob = open(path, "rb").read()
    out = b""
    pos = blob.find(b"movi") + 4
    end = blob.find(b"idx1")
    while pos < end:
        fcc = blob[pos:pos + 4]
        size = struct.unpack("<I", blob[pos + 4:pos + 8])[0]
        if fcc == b"01wb":
            out += blob[pos + 8:pos + 8 + size]
        pos += 8 + size + (size % 2)
    return np.frombuffer(out, np.int16)


def test_avi_mjpeg_pcm_container(tmp_path):
    import cv2
    rng = np.random.default_rng(0)
    t, h, w, fps, sr = 10, 48, 64, 25, 8000
    video = np.zeros((t, h, w, 3), np.uint8)
    for i in range(t):                       # solid colors survive JPEG
        video[i] = (20 * i, 128, 255 - 20 * i)
    pcm = _sine(int(t * sr / fps), sr)
    path = str(tmp_path / "out_audio.avi")
    write_avi_mjpeg_pcm(path, video, fps, pcm, sr)

    cap = cv2.VideoCapture(path)
    assert cap.isOpened(), "OpenCV cannot open the generated AVI"
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f[:, :, ::-1])
    assert abs(cap.get(cv2.CAP_PROP_FPS) - fps) < 0.5
    cap.release()
    assert len(frames) == t
    # JPEG at q92 on solid frames: well within 3 gray levels
    err = np.abs(np.stack(frames).astype(int) - video.astype(int)).mean()
    assert err < 3.0
    # PCM payload is bit-exact
    np.testing.assert_array_equal(_parse_avi_pcm(path), pcm)


def test_mux_audio_fallback_and_skip(tmp_path, capsys):
    video = np.full((5, 32, 32, 3), 80, np.uint8)
    out_mp4 = str(tmp_path / "out.mp4")
    # no wav -> loud skip, None
    assert mux_audio(out_mp4, video, 25.0, str(tmp_path / "none.wav")) is None
    assert "SKIPPED" in capsys.readouterr().out
    # wav present -> an audio-bearing file is written
    _write_wav(tmp_path / "aud.wav", _sine(16000))
    dst = mux_audio(out_mp4, video, 25.0, str(tmp_path / "aud.wav"))
    assert dst is not None and os.path.exists(dst)
    if dst.endswith(".avi"):
        pcm = _parse_avi_pcm(dst)
        assert len(pcm) == int(round(5 * 16000 / 25))
