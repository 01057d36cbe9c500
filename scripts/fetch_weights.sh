#!/usr/bin/env bash
# External model weights the reference pipeline depends on (README
# "Preparation" + scripts/prepare.sh + scripts/prepare_sapiens.sh), mapped
# to this repo's loaders. Run on a machine WITH network egress; this image
# has none, which is why every loader ships a documented fallback.
#
# Integrity: sha256 sums are recorded into weights/MANIFEST.sha256 on first
# fetch (trust-on-first-use) and VERIFIED against it on every later run —
# so a manifest produced on a trusted machine pins all future fetches.
#
# After fetching, the gated test suite exercises every real-weights branch:
#   python -m pytest tests/test_real_weights.py -m realweights -v
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p weights
MANIFEST=weights/MANIFEST.sha256

fetch() { # fetch <url> <dest>
    local url=$1 dest=$2
    if [[ ! -f "$dest" ]]; then
        echo "[fetch] $dest"
        wget -q "$url" -O "$dest"
    fi
    if grep -q " $dest\$" "$MANIFEST" 2>/dev/null; then
        grep " $dest\$" "$MANIFEST" | sha256sum -c -
    else
        sha256sum "$dest" >> "$MANIFEST"
        echo "[manifest] recorded $(basename "$dest")"
    fi
}

# 1. BiSeNet face parsing (AD-NeRF redistribution; reference prepare.sh:2)
#    -> data_utils/face_parsing.py (INSTAG_BISENET_WEIGHTS)
fetch "https://github.com/YudongGuo/AD-NeRF/blob/master/data_util/face_parsing/79999_iter.pth?raw=true" \
      weights/79999_iter.pth

# 2. 3DMM auxiliary files (AD-NeRF; reference prepare.sh:5-14) + the BFM
#    2009 basis (LICENSE-GATED: register at
#    https://faces.dmi.unibas.ch/bfm/ and place 01_MorphableModel.mat into
#    weights/3DMM/ yourself) -> data_utils/face_model.convert_bfm_info
mkdir -p weights/3DMM
for f in exp_info.npy keys_info.npy sub_mesh.obj topology_info.npy; do
    fetch "https://github.com/YudongGuo/AD-NeRF/blob/master/data_util/face_tracking/3DMM/$f?raw=true" \
          "weights/3DMM/$f"
done
if [[ -f weights/3DMM/01_MorphableModel.mat ]]; then
    python - <<'PY'
from instag_tpu.data_utils.face_model import convert_bfm_mat, convert_bfm_info
convert_bfm_mat("weights/3DMM")                  # -> 3DMM_info.npy
convert_bfm_info("weights/3DMM", "weights/bfm2009.npz")
print("[convert] weights/bfm2009.npz")
PY
else
    echo "[skip] BFM basis: place 01_MorphableModel.mat in weights/3DMM/ (license-gated)"
fi

# 3. SyncTalk audio-visual encoder (reference prepare.sh:16)
#    -> data_utils/audio_features.extract_ave (INSTAG_AVE_WEIGHTS)
fetch "https://github.com/ZiqiaoPeng/SyncTalk/blob/main/nerf_triplane/checkpoints/audio_visual_encoder.pth?raw=true" \
      weights/audio_visual_encoder.pth
python - <<'PY'
import torch
from instag_tpu.io.reference_convert import convert_ave_encoder
sd = torch.load("weights/audio_visual_encoder.pth", map_location="cpu")
convert_ave_encoder(sd, "weights/ave_encoder.npz")
print("[convert] weights/ave_encoder.npz")
PY

# 4. DeepSpeech 0.1.0 frozen graph (reference data_utils/deepspeech_features)
#    -> data_utils/audio_features.extract_deepspeech (DEEPSPEECH_PB)
if [[ ! -f weights/deepspeech-0.1.0/output_graph.pb ]]; then
    fetch "https://github.com/mozilla/DeepSpeech/releases/download/v0.1.0/deepspeech-0.1.0-models.tar.gz" \
          weights/deepspeech-0.1.0-models.tar.gz
    mkdir -p weights/deepspeech-0.1.0
    tar -xzf weights/deepspeech-0.1.0-models.tar.gz -C weights/deepspeech-0.1.0 --strip-components=1
fi

# 5. EasyPortrait FPN teeth/portrait segmenter (reference README:49)
#    -> loads directly into the from-scratch key-compatible arch
#       (data_utils/easyportrait_fpn.py, no mmseg/mmcv needed)
fetch "https://rndml-team-cv.obs.ru-moscow-1.hc.sbercloud.ru/datasets/easyportrait/experiments/models/fpn-fp-512.pth" \
      weights/fpn-fp-512.pth

# 6. sapiens 0.3b depth + normal torchscript (reference prepare_sapiens.sh)
#    -> data_utils/priors.py (INSTAG_SAPIENS_DEPTH / INSTAG_SAPIENS_NORMAL)
for kind in depth normal; do
    fetch "https://huggingface.co/facebook/sapiens-${kind}-0.3b-torchscript/resolve/main/sapiens_0.3b_${kind}_render_people_epoch_100_torchscript.pt2" \
          "weights/sapiens_0.3b_${kind}.pt2"
done

# 7. 2DFAN-4 landmark network (task 7; face_alignment's released weights,
#    TorchScript archive) -> data_utils/landmarks.py (INSTAG_FAN_WEIGHTS)
fetch "https://www.adrianbulat.com/downloads/python-fan/2DFAN4-cd938726ad.zip" \
      weights/2DFAN4-cd938726ad.zip

# 8. LPIPS AlexNet (pip `lpips` bundles the linear heads; backbone from
#    torchvision) -> models/lpips.py (INSTAG_LPIPS_WEIGHTS)
python - <<'PY'
try:
    from instag_tpu.models.lpips import convert_torch_lpips
    convert_torch_lpips("weights/lpips_alex.npz")
    print("[convert] weights/lpips_alex.npz")
except ImportError:
    print("[skip] LPIPS: `pip install lpips` first (needs torchvision download)")
PY

echo "[done] export these to activate the real-weights branches:"
cat <<'ENV'
  export INSTAG_BISENET_WEIGHTS=$PWD/weights/79999_iter.pth
  export INSTAG_AVE_WEIGHTS=$PWD/weights/ave_encoder.npz
  export INSTAG_LPIPS_WEIGHTS=$PWD/weights/lpips_alex.npz
  export DEEPSPEECH_PB=$PWD/weights/deepspeech-0.1.0/output_graph.pb
  export INSTAG_SAPIENS_DEPTH=$PWD/weights/sapiens_0.3b_depth.pt2
  export INSTAG_SAPIENS_NORMAL=$PWD/weights/sapiens_0.3b_normal.pt2
  export INSTAG_EASYPORTRAIT_FPN=$PWD/weights/fpn-fp-512.pth
  export INSTAG_FAN_WEIGHTS=$PWD/weights/2DFAN4-cd938726ad.zip
ENV
