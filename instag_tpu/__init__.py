"""instag_tpu — TPU-native few-shot personalized 3D talking-head synthesis.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of InsTaG (CVPR 2025,
reference at /root/reference): audio-driven 3D Gaussian Splatting talking heads
with a Universal Motion Field (UMF) pre-trained across identities and a
Personalized Motion Field (PMF) adapted from a few seconds of video.

Layering (bottom-up, mirrors SURVEY.md §1 but TPU-native):

  ops/        Pallas + pure-JAX compute kernels: differentiable Gaussian
              rasterizer, multiresolution hash-grid encoder, spherical
              harmonics, kNN init.
  models/     Gaussian point-cloud state (fixed-capacity pytree) and the
              flax motion-field / audio networks.
  data/       Dataset readers producing per-frame cameras + talking features.
  render.py   The three render paths (static / face motion / mouth motion).
  train/      Trainers: pretrain_face, pretrain_mouth, train_face,
              train_mouth, train_fuse, synthesize.
  parallel/   Mesh/sharding utilities for multi-chip data- and
              identity-parallel training (a new capability — the reference
              is single-GPU only, SURVEY.md §2.5).
"""

__version__ = "0.1.0"
