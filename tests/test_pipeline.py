"""End-to-end adaptation pipeline on the synthetic scene:
train_face -> train_mouth -> train_fuse -> synthesize (tiny budgets).
Mirrors scripts/train_xx_few.sh at miniature scale (SURVEY.md §2.2)."""

import numpy as np
import pytest

pytestmark = pytest.mark.e2e  # compile-heavy; quick suite: -m 'not e2e'

import jax

from instag_tpu.config import ModelConfig, OptimizationConfig
from instag_tpu.data.synthetic import generate_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pipeline_scene"))
    generate_scene(d, n_frames=8, size=64, n_val=2)
    return d


@pytest.fixture(scope="module")
def model_cfg(scene_dir):
    return ModelConfig(source_path=scene_dir, init_num=200, capacity=1024,
                       max_per_tile=64)


@pytest.fixture(scope="module")
def face_result(model_cfg):
    from instag_tpu.train.face import train_face
    oc = OptimizationConfig(iterations=60, densify_from_iter=20,
                            densification_interval=25,
                            opacity_reset_interval=100000,
                            position_lr_max_steps=60)
    return train_face(model_cfg, oc, warm_step=20, log_every=30,
                      lpips_enabled=False)


def test_face_training_progresses(face_result):
    losses = face_result["losses"]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    assert int(face_result["state"].num_alive()) > 0


@pytest.fixture(scope="module")
def mouth_result(model_cfg, face_result):
    from instag_tpu.train.mouth import train_mouth
    oc = OptimizationConfig(iterations=50, densify_from_iter=20,
                            densification_interval=25,
                            opacity_reset_interval=100000,
                            position_lr_max_steps=50)
    return train_mouth(model_cfg, oc, face_bundle=face_result,
                       warm_step=15, log_every=25)


def test_mouth_training_runs(mouth_result):
    assert np.isfinite(mouth_result["losses"]).all()
    assert int(mouth_result["state"].num_alive()) > 0


@pytest.fixture(scope="module")
def fuse_result(model_cfg, face_result, mouth_result):
    from instag_tpu.train.fuse import train_fuse
    oc = OptimizationConfig(iterations=30)
    return train_fuse(model_cfg, oc, face_result, mouth_result, log_every=15,
                      lpips_enabled=False)


def test_fuse_freezes_geometry(model_cfg, face_result, mouth_result,
                               fuse_result):
    # geometry untouched, appearance may move
    np.testing.assert_array_equal(
        np.asarray(fuse_result["face_state"].params.xyz),
        np.asarray(face_result["state"].params.xyz))
    np.testing.assert_array_equal(
        np.asarray(fuse_result["mouth_state"].params.rotation),
        np.asarray(mouth_result["state"].params.rotation))
    assert np.isfinite(fuse_result["losses"]).all()


def test_synthesize_produces_video(model_cfg, fuse_result, tmp_path):
    from instag_tpu.synthesize import synthesize
    video, fps = synthesize(model_cfg, fuse_result, split="val",
                            out_path=None)
    assert video.shape == (2, 64, 64, 3)
    assert video.dtype == np.uint8
    # the renders are not empty or saturated
    assert 5 < video.mean() < 250


def test_synthesize_select_auto_matches_exact(model_cfg, fuse_result):
    """The guarded serving mode through the PRODUCTION synthesize() driver
    (boot/step compile, carry threading across dispatches, refresh-rate
    report): on the val clip (sub-threshold per-frame camera drift) the
    output must be visually identical to per-frame-exact selection."""
    from instag_tpu.synthesize import synthesize
    exact, _ = synthesize(model_cfg, fuse_result, split="val",
                          out_path=None)
    auto, _ = synthesize(model_cfg, fuse_result, split="val",
                         out_path=None, select_auto=4.0)
    assert auto.shape == exact.shape and auto.dtype == np.uint8
    err = (auto.astype(np.float32) - exact.astype(np.float32)) / 255.0
    p_db = -10.0 * np.log10(np.mean(err ** 2) + 1e-12)
    assert p_db > 50.0, p_db


def test_checkpoint_roundtrip(model_cfg, face_result, tmp_path):
    from instag_tpu.io.checkpoints import (load_bundle, load_gaussian_ply,
                                           save_bundle, save_gaussian_ply)
    p = str(tmp_path / "face.ply")
    save_gaussian_ply(p, face_result["state"])
    state2 = load_gaussian_ply(p, capacity=1024,
                               max_sh_degree=face_result["max_sh_degree"])
    alive = np.asarray(face_result["state"].alive)
    np.testing.assert_allclose(
        np.asarray(state2.params.xyz[: alive.sum()]),
        np.asarray(face_result["state"].params.xyz)[alive], rtol=1e-6)

    b = str(tmp_path / "face_bundle.pkl")
    save_bundle(b, dict(umf_params=face_result["umf_params"],
                        pmf_params=face_result["pmf_params"]))
    loaded = load_bundle(b)
    leaves1 = jax.tree.leaves(face_result["umf_params"])
    leaves2 = jax.tree.leaves(loaded["umf_params"])
    assert len(leaves1) == len(leaves2)
    np.testing.assert_allclose(np.asarray(leaves1[0]), leaves2[0], rtol=1e-6)


def test_train_face_data_parallel_on_mesh(model_cfg):
    """The user-facing --data_parallel path: train_face(data_parallel=4,
    dp_mesh) runs the FULL trainer loop (curriculum, padded blocks, densify
    boundaries) with each step's 4-frame batch sharded over the mesh, and
    training progresses."""
    from instag_tpu.parallel import make_mesh
    from instag_tpu.train.face import train_face

    oc = OptimizationConfig(iterations=40, densify_from_iter=15,
                            densification_interval=20,
                            opacity_reset_interval=100000,
                            position_lr_max_steps=40)
    mesh = make_mesh(4)
    res = train_face(model_cfg, oc, warm_step=10, log_every=20,
                     lpips_enabled=False, data_parallel=4, dp_mesh=mesh)
    losses = np.asarray(res["losses"])
    assert losses.shape == (40,)
    assert np.isfinite(losses).all()
    # later mean-of-4-frames losses should beat the early ones
    assert losses[-10:].mean() < losses[:10].mean()
    assert np.isfinite(np.asarray(res["state"].params.xyz)).all()
