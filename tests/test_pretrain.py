"""Multi-identity pre-training smoke tests (pretrain_face -> pretrain_mouth)
at miniature scale, incl. the cross-identity contrastive machinery."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.e2e  # compile-heavy; quick suite: -m 'not e2e'

from instag_tpu.config import ModelConfig, OptimizationConfig
from instag_tpu.data.synthetic import generate_scene


@pytest.fixture(scope="module")
def pretrain_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pretrain_root"))
    for k, name in enumerate(["id_a", "id_b"]):
        generate_scene(os.path.join(root, name), n_frames=6, size=64,
                       n_val=2, seed=k)
    return root


@pytest.fixture(scope="module")
def face_pretrain(pretrain_root):
    from instag_tpu.train.pretrain import pretrain_face
    mc = ModelConfig(source_path=pretrain_root, init_num=150, capacity=512,
                     max_per_tile=48)
    oc = OptimizationConfig(iterations=30, densify_from_iter=10,
                            densification_interval=20,
                            opacity_reset_interval=100000,
                            position_lr_max_steps=60)
    return pretrain_face(mc, oc, ["id_a", "id_b"], log_every=20,
                         warm_per_id=5)


def test_pretrain_face_runs(face_pretrain):
    assert np.isfinite(face_pretrain["losses"]).all()
    assert len(face_pretrain["states"]) == 2
    # EMA tracks but lags the live params
    import jax
    live = jax.tree.leaves(face_pretrain["umf_params"])
    ema = jax.tree.leaves(face_pretrain["ema_params"])
    assert len(live) == len(ema)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).sum())
             for a, b in zip(live, ema)]
    assert sum(diffs) > 0  # they differ (EMA lag)
    # pmf stack has leading identity axis
    leaf = jax.tree.leaves(face_pretrain["pmf_stack"])[0]
    assert leaf.shape[0] == 2


def test_pretrain_mouth_runs(pretrain_root, face_pretrain):
    from instag_tpu.train.pretrain import pretrain_mouth
    mc = ModelConfig(source_path=pretrain_root, init_num=150, capacity=512,
                     max_per_tile=48, type="mouth")
    oc = OptimizationConfig(iterations=25, densify_from_iter=10,
                            densification_interval=20,
                            opacity_reset_interval=100000,
                            position_lr_max_steps=50)
    res = pretrain_mouth(mc, oc, ["id_a", "id_b"], face_pretrain,
                         log_every=20, warm_per_id=4)
    assert np.isfinite(res["losses"]).all()
    assert len(res["states"]) == 2
