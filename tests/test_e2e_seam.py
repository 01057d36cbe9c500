"""The video -> preprocess -> train seam as ONE chain (VERDICT r4 item 3).

A raw mp4 (rendered by data/synthetic_hard.render_hard_video, i.e. what a
user's camera produces) goes through the REAL data_utils/process.py
pipeline — audio features, frame extraction, background plate, torso/gt
split, head tracking, transforms — with only the weights-gated tasks
(parsing/landmarks/teeth/AU) satisfied from the generator's GT stub, then
the produced directory trains through the real trainer. This validates
the on-disk contract between the two halves of the repo by EXECUTION, not
by construction. Full-size version: scripts/e2e_from_video.sh.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.e2e  # compile-heavy; quick suite: -m 'not e2e'


@pytest.fixture(scope="module")
def processed_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e_video"))
    from instag_tpu.data.synthetic_hard import render_hard_video
    video, stub = render_hard_video(root, n_frames=10, size=96, seed=4,
                                    n_val=2, supersample=1)
    from instag_tpu.data_utils.process import main as process_main
    process_main([video, "--task", "-1", "--synthetic_gt", stub])
    return os.path.dirname(video)


def test_pipeline_writes_full_contract(processed_dir):
    for f in ["aud.wav", "aud_ds.npy", "bc.jpg", "au.csv",
              "transforms_train.json", "transforms_val.json",
              "track_params.npz"]:
        assert os.path.exists(os.path.join(processed_dir, f)), f
    for d in ["ori_imgs", "gt_imgs", "torso_imgs", "parsing", "teeth_mask"]:
        assert os.path.isdir(os.path.join(processed_dir, d)), d
    aud = np.load(os.path.join(processed_dir, "aud_ds.npy"))
    assert aud.shape == (12, 16, 29)


def test_reader_consumes_pipeline_output(processed_dir):
    from instag_tpu.data.dataset import load_frames
    recs = load_frames(processed_dir, split="train",
                       audio_extractor="deepspeech")
    assert len(recs) >= 8
    r = recs[0]
    assert r.face_mask.sum() > 200
    assert np.isfinite(np.asarray(r.full_proj_transform)).all()


def test_train_on_pipeline_output(processed_dir):
    from instag_tpu.config import ModelConfig, OptimizationConfig
    from instag_tpu.train.face import train_face
    mc = ModelConfig(source_path=processed_dir, init_num=200, capacity=1024,
                     max_per_tile=64)
    oc = OptimizationConfig(iterations=60, densify_from_iter=20,
                            densification_interval=25,
                            opacity_reset_interval=100000,
                            position_lr_max_steps=60)
    res = train_face(mc, oc, warm_step=20, log_every=30,
                     lpips_enabled=False)
    losses = res["losses"]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
