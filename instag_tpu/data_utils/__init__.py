"""Offline per-video preprocessing (reference data_utils/, SURVEY.md §2.3).

Host-side CPU pipeline producing the on-disk dataset contract consumed by
``instag_tpu.data.dataset``. Tasks that only need numpy/scipy/cv2 are
implemented natively (frames, background inpaint, torso/gt composition,
landmark-based pose tracking, transforms.json, train/val splits, mel/AVE
audio). Tasks that require external pretrained models (BiSeNet parsing,
DeepSpeech/Wav2Vec/HuBERT features, face-alignment landmarks, EasyPortrait
teeth masks, sapiens geometry priors) are wrapped behind the same task
numbers and activate when their weights/packages are present — this image
has no network egress, so they raise informative errors otherwise.
"""
