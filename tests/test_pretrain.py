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


def test_share_audio_net(pretrain_root):
    """--share_audio_net (reference pretrain_face.py:79,124-126): with the
    flag on, the loss is invariant to the PMF's own audio params (they are
    substituted by the UMF's) and the returned PMF stack carries the UMF's
    audio tensors."""
    import jax
    import jax.numpy as jnp
    from instag_tpu.train.pretrain import pretrain_face, tie_audio_params

    mc = ModelConfig(source_path=pretrain_root, init_num=120, capacity=256,
                     max_per_tile=48)
    oc = OptimizationConfig(iterations=12, densify_from_iter=1000,
                            densification_interval=1000,
                            opacity_reset_interval=100000,
                            position_lr_max_steps=24)
    res = pretrain_face(mc, oc, ["id_a", "id_b"], log_every=50,
                        warm_per_id=1, share_audio_net=True)
    assert np.isfinite(res["losses"]).all()
    # returned PMF stack audio == final UMF audio, broadcast per identity
    umf_aud = res["umf_params"]["params"]["audio"]
    pmf_aud = res["pmf_stack"]["params"]["audio"]
    for a, b in zip(jax.tree.leaves(umf_aud), jax.tree.leaves(pmf_aud)):
        assert b.shape == (2,) + a.shape
        np.testing.assert_array_equal(np.asarray(b[0]), np.asarray(a))
        np.testing.assert_array_equal(np.asarray(b[1]), np.asarray(a))

    # tie helper: perturbing the PMF's own audio subtree cannot change the
    # tied tree; perturbing the UMF's does
    pmf_one = jax.tree.map(lambda x: x[0], res["pmf_stack"])
    tied = tie_audio_params(pmf_one, res["umf_params"])
    pmf_perturbed = {"params": {
        **pmf_one["params"],
        "audio": jax.tree.map(lambda x: x + 1.0,
                              pmf_one["params"]["audio"])}}
    tied2 = tie_audio_params(pmf_perturbed, res["umf_params"])
    for a, b in zip(jax.tree.leaves(tied), jax.tree.leaves(tied2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_streaming_matches_preloaded(pretrain_root):
    """VERDICT r1 item 7: host-RAM streaming sub-batches must be a pure
    execution-strategy change — identical losses to the preloaded path."""
    from instag_tpu.train.pretrain import pretrain_face

    mc = ModelConfig(source_path=pretrain_root, init_num=100, capacity=256,
                     max_per_tile=48)
    oc = OptimizationConfig(iterations=10, densify_from_iter=4,
                            densification_interval=6,
                            opacity_reset_interval=100000,
                            position_lr_max_steps=20)
    res_pre = pretrain_face(mc, oc, ["id_a", "id_b"], log_every=50,
                            warm_per_id=2, seed=3, stream=False)
    res_str = pretrain_face(mc, oc, ["id_a", "id_b"], log_every=50,
                            warm_per_id=2, seed=3, stream=True)
    np.testing.assert_allclose(np.asarray(res_str["losses"]),
                               np.asarray(res_pre["losses"]),
                               rtol=1e-4, atol=1e-5)


def test_pretrain_face_identity_parallel(pretrain_root):
    """pretrain_face(identity_parallel=True): the idp path runs end-to-end
    on the virtual device mesh (warmup, stacked motion phase, densify,
    unstacked return contract)."""
    from instag_tpu.train.pretrain import pretrain_face

    mc = ModelConfig(source_path=pretrain_root, init_num=100, capacity=256,
                     max_per_tile=48)
    oc = OptimizationConfig(iterations=8, densify_from_iter=2,
                            densification_interval=4,
                            opacity_reset_interval=100000,
                            position_lr_max_steps=16)
    res = pretrain_face(mc, oc, ["id_a", "id_b"], log_every=4,
                        warm_per_id=2, identity_parallel=True,
                        share_audio_net=True)
    assert np.isfinite(res["losses"]).all()
    assert len(res["losses"]) == 8          # per-identity iterations
    assert len(res["states"]) == 2
    import jax
    leaf = jax.tree.leaves(res["pmf_stack"])[0]
    assert leaf.shape[0] == 2
    for st in res["states"]:
        assert int(np.asarray(st.num_alive())) > 0


def test_pretrain_mouth_identity_parallel(pretrain_root, face_pretrain):
    """pretrain_mouth(identity_parallel=True) runs end-to-end on the
    virtual mesh with the stacked face clouds + replicated face UMF."""
    from instag_tpu.train.pretrain import pretrain_mouth

    mc = ModelConfig(source_path=pretrain_root, init_num=120, capacity=512,
                     max_per_tile=48, type="mouth")
    oc = OptimizationConfig(iterations=8, densify_from_iter=2,
                            densification_interval=4,
                            opacity_reset_interval=100000,
                            position_lr_max_steps=16)
    res = pretrain_mouth(mc, oc, ["id_a", "id_b"], face_pretrain,
                         log_every=4, warm_per_id=2, identity_parallel=True)
    assert np.isfinite(res["losses"]).all()
    assert len(res["losses"]) == 8
    assert len(res["states"]) == 2


def test_pretrain_mouth_streaming_matches_preloaded(pretrain_root,
                                                    face_pretrain):
    """VERDICT r2 item 7: pretrain_mouth host-RAM streaming must be a pure
    execution-strategy change — identical losses to the preloaded path."""
    from instag_tpu.train.pretrain import pretrain_mouth

    mc = ModelConfig(source_path=pretrain_root, init_num=100, capacity=256,
                     max_per_tile=48, type="mouth")
    oc = OptimizationConfig(iterations=10, densify_from_iter=4,
                            densification_interval=6,
                            opacity_reset_interval=100000,
                            position_lr_max_steps=20)
    res_pre = pretrain_mouth(mc, oc, ["id_a", "id_b"], face_pretrain,
                             log_every=50, warm_per_id=2, seed=3,
                             stream=False)
    res_str = pretrain_mouth(mc, oc, ["id_a", "id_b"], face_pretrain,
                             log_every=50, warm_per_id=2, seed=3,
                             stream=True)
    np.testing.assert_allclose(np.asarray(res_str["losses"]),
                               np.asarray(res_pre["losses"]),
                               rtol=1e-4, atol=1e-5)


def test_adaptive_resize_wiring():
    """Pretrain's per-identity adaptive capacity (_adaptive_resize): grow on
    occupancy, grow on capacity-dropped children, shrink on the sparse
    cadence — mirroring train/face.py's measured policy."""
    import jax.numpy as jnp
    from instag_tpu.models import gaussians as G
    from instag_tpu.train.pretrain import _adaptive_resize

    def mk(cap):
        xyz = np.random.default_rng(0).normal(size=(150, 3)) * 0.05
        st = G.create_from_points(jnp.asarray(xyz, jnp.float32),
                                  jnp.full((150, 3), 0.5, jnp.float32),
                                  cap, 2, 1.0)
        return st, G.adam_init(st.params)

    st, opt = mk(8192)
    states, gopts, seen = [st], [opt], [0]

    # occupancy-driven growth (fabricated alive count past 70%)
    states, gopts = _adaptive_resize(states, gopts, [7000], [0], seen,
                                     cap_max=16384, allow_shrink=False,
                                     tag="t")
    assert states[0].capacity == 16384

    # shrink back on the sparse cadence (alive 100 -> pow2(4*100) -> 4096)
    states, gopts = _adaptive_resize(states, gopts, [100], [0], seen,
                                     cap_max=16384, allow_shrink=True,
                                     tag="t")
    assert states[0].capacity == 4096

    # capacity-dropped children force a grow even at low occupancy,
    # and the cumulative counter only fires once per increase
    states, gopts = _adaptive_resize(states, gopts, [100], [3], seen,
                                     cap_max=16384, allow_shrink=False,
                                     tag="t")
    assert states[0].capacity == 8192 and seen[0] == 3
    states, gopts = _adaptive_resize(states, gopts, [100], [3], seen,
                                     cap_max=16384, allow_shrink=False,
                                     tag="t")
    assert states[0].capacity == 8192  # same counter: no second grow

    # the 150 real splats survived every resize
    assert int(states[0].num_alive()) == 150


def test_cli_pretrain_chain(pretrain_root, tmp_path):
    """Single-process pre-training chain CLI (cli/pretrain): face -> mouth
    in one process, saving the same artifacts as the per-stage CLIs."""
    from instag_tpu.cli.pretrain import main as pretrain_main
    from instag_tpu.io.checkpoints import bundle_list, load_bundle

    out = str(tmp_path / "pre_out")
    pretrain_main(["--source_path", pretrain_root, "--model_path", out,
                   "--init_num", "120", "--mouth_init_num", "120",
                   "--capacity", "512", "--max_per_tile", "48",
                   "--iterations", "10", "--densify_from_iter", "4",
                   "--densification_interval", "6",
                   "--opacity_reset_interval", "100000",
                   "--position_lr_max_steps", "20"])

    for fname in ["chkpnt_face_latest.pkl", "chkpnt_ema_face_latest.pkl",
                  "chkpnt_mouth_latest.pkl", "chkpnt_ema_mouth_latest.pkl",
                  "id_a_face_latest.pkl", "id_b_face_latest.pkl"]:
        assert os.path.exists(os.path.join(out, fname)), fname
    face = load_bundle(os.path.join(out, "chkpnt_face_latest.pkl"))
    # flax msgpack round-trips lists as {'0':...} dicts — bundle_list decodes
    assert bundle_list(face["data_list"]) == ["id_a", "id_b"]
    mouth = load_bundle(os.path.join(out, "chkpnt_ema_mouth_latest.pkl"))
    assert "ema_params" in mouth
