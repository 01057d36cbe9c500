"""Audio feature extraction (task 2) — the four extractor families.

Layouts match the reference on-disk contract (scene/dataset_readers.py:101-150):
  aud_ds.npy  [T, 16, 29]   DeepSpeech logits windows
  aud_eo.npy  [T, 16, 44]   Wav2Vec2 esperanto logits windows
  aud_hu.npy  [T, 16, 1024] HuBERT features windows
  aud_ave.npy [T+4, 512, 1] AVE (SyncTalk audio-visual encoder) embeddings

DeepSpeech needs the TF1 frozen graph, Wav2Vec/HuBERT need HF checkpoints,
AVE needs the SyncTalk encoder weights — none are downloadable in this
zero-egress image, so each extractor activates only when its weights are
locally available (HF cache / weights/), with clear errors otherwise. The
frame alignment + 16-step windowing (deepspeech_features/fea_win.py) is
implemented natively.
"""

from __future__ import annotations

import os

import numpy as np


def make_frame_windows(feats: np.ndarray, num_video_frames: int,
                       win: int = 16) -> np.ndarray:
    """Resample per-step features [S, D] to the video frame rate and build
    the centred 16-step window per frame -> [T, 16, D]
    (deepspeech_features windowing semantics)."""
    s, d = feats.shape
    # linear-resample feature steps so that 2 steps ≈ 1 video frame (the
    # deepspeech pipeline produces ~50 windows/s for 25 fps video)
    src = np.linspace(0, s - 1, num_video_frames * 2)
    idx0 = np.floor(src).astype(int)
    idx1 = np.minimum(idx0 + 1, s - 1)
    a = (src - idx0)[:, None]
    steps = feats[idx0] * (1 - a) + feats[idx1] * a     # [2T, D]

    half = win // 2
    padded = np.concatenate([np.zeros((half, d), feats.dtype), steps,
                             np.zeros((half, d), feats.dtype)], 0)
    out = np.stack([padded[2 * t: 2 * t + win]
                    for t in range(num_video_frames)])
    return out.astype(np.float32)


def _video_frame_count(base_dir: str) -> int:
    import glob
    return len(glob.glob(os.path.join(base_dir, "ori_imgs", "*.jpg")))


def extract_wav2vec(wav_path: str, out_path: str,
                    model_name: str = "cpierse/wav2vec2-large-xlsr-53-esperanto"):
    """Esperanto Wav2Vec2 CTC logits (reference data_utils/wav2vec.py)."""
    from transformers import Wav2Vec2ForCTC, Wav2Vec2Processor
    import torch
    from ..data.audio import load_wav
    try:
        processor = Wav2Vec2Processor.from_pretrained(model_name,
                                                      local_files_only=True)
        model = Wav2Vec2ForCTC.from_pretrained(model_name,
                                               local_files_only=True)
    except Exception as e:
        raise RuntimeError(
            f"HF checkpoint {model_name} not in the local cache (no "
            "network egress); pre-populate the cache to use this "
            "extractor") from e
    wav = load_wav(wav_path, 16000)
    inputs = processor(wav, sampling_rate=16000, return_tensors="pt")
    with torch.no_grad():
        logits = model(inputs.input_values).logits[0].numpy()  # [S, 44?]
    n = _video_frame_count(os.path.dirname(wav_path)) or int(
        len(wav) / 16000 * 25)
    np.save(out_path, make_frame_windows(logits, n))


def extract_hubert(wav_path: str, out_path: str,
                   model_name: str = "facebook/hubert-large-ls960-ft"):
    """HuBERT hidden features (reference data_utils/hubert.py), chunked."""
    from transformers import HubertModel, Wav2Vec2FeatureExtractor
    import torch
    from ..data.audio import load_wav
    try:
        fe = Wav2Vec2FeatureExtractor.from_pretrained(model_name,
                                                      local_files_only=True)
        model = HubertModel.from_pretrained(model_name, local_files_only=True)
    except Exception as e:
        raise RuntimeError(
            f"HF checkpoint {model_name} not in the local cache (no "
            "network egress)") from e
    wav = load_wav(wav_path, 16000)
    chunks = []
    step = 16000 * 20
    with torch.no_grad():
        for s in range(0, len(wav), step):
            seg = wav[max(0, s - 1600): s + step + 1600]
            inp = fe(seg, sampling_rate=16000, return_tensors="pt")
            h = model(inp.input_values).last_hidden_state[0].numpy()
            chunks.append(h)
    feats = np.concatenate(chunks, 0)
    n = _video_frame_count(os.path.dirname(wav_path)) or int(
        len(wav) / 16000 * 25)
    np.save(out_path, make_frame_windows(feats, n))


def extract_ave(wav_path: str, out_path: str):
    """AVE embeddings via the flax AudioEncoder (weights converted from the
    SyncTalk audio_visual_encoder.pth; set INSTAG_AVE_WEIGHTS)."""
    import jax
    import jax.numpy as jnp
    from ..data.audio import AudioWindows, load_wav
    from ..models.nets import AudioEncoder

    wpath = os.environ.get("INSTAG_AVE_WEIGHTS", "weights/ave_encoder.npz")
    wav = load_wav(wav_path, 16000)
    ds = AudioWindows(wav)
    enc = AudioEncoder()

    def to_nhwc(crop):
        # crop [1, 80, 16] -> [1, 80, 16, 1]
        return jnp.asarray(crop)[..., None]

    variables = enc.init(jax.random.key(0), to_nhwc(ds[0]))
    if os.path.exists(wpath):
        import flax
        data = np.load(wpath)
        flat = flax.traverse_util.flatten_dict(
            flax.core.unfreeze(variables), sep="/")
        for k in list(flat.keys()):
            if k in data:
                flat[k] = jnp.asarray(data[k])
        variables = flax.traverse_util.unflatten_dict(flat, sep="/")
    else:
        print(f"[WARN] AVE weights not found at {wpath}; using random "
              "init — features will not match SyncTalk's")

    outs = []
    apply = jax.jit(lambda m: enc.apply(variables, m))
    for i in range(len(ds)):
        outs.append(np.asarray(apply(to_nhwc(ds[i]))))
    outs = np.concatenate(outs, 0)                   # [T, 512]
    first, last = outs[:1], outs[-1:]
    padded = np.concatenate([np.repeat(first, 2, 0), outs,
                             np.repeat(last, 2, 0)], 0)
    np.save(out_path, padded[:, :, None].astype(np.float32))  # [T+4, 512, 1]


def extract_deepspeech(wav_path: str, out_path: str):
    raise RuntimeError(
        "DeepSpeech features need the TF1 frozen graph "
        "(deepspeech-0.1.0 pb), which is not present in this image. Use "
        "--asr esperanto/hubert/ave, or copy an aud_ds.npy produced by the "
        "reference pipeline.")


def extract_features(wav_path: str, mode: str = "deepspeech") -> None:
    base = os.path.dirname(wav_path)
    if mode in ("wav2vec", "esperanto"):
        extract_wav2vec(wav_path, os.path.join(base, "aud_eo.npy"))
    elif mode == "hubert":
        extract_hubert(wav_path, os.path.join(base, "aud_hu.npy"))
    elif mode == "ave":
        extract_ave(wav_path, os.path.join(base, "aud_ave.npy"))
    else:
        extract_deepspeech(wav_path, os.path.join(base, "aud_ds.npy"))
