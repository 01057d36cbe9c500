import numpy as np
import jax
import jax.numpy as jnp

from instag_tpu.render import (Camera, _sh_degree_mask, composite_fuse,
                               dilate_alpha, render_motion_mouth)
from instag_tpu.ops.rasterize import RasterizeConfig


def test_sh_degree_mask():
    m0 = np.asarray(_sh_degree_mask(0, 2))
    m1 = np.asarray(_sh_degree_mask(1, 2))
    m2 = np.asarray(_sh_degree_mask(2, 2))
    np.testing.assert_array_equal(m0, [1] + [0] * 8)
    np.testing.assert_array_equal(m1, [1] * 4 + [0] * 5)
    np.testing.assert_array_equal(m2, [1] * 9)


def test_dilate_alpha_maxpool():
    a = jnp.zeros((1, 21, 21)).at[0, 10, 10].set(0.8)
    d = np.asarray(dilate_alpha(a, 13))
    assert d[0, 10, 10] == np.float32(0.8)
    assert d[0, 10 + 6, 10] == np.float32(0.8)   # within 13//2 reach
    assert d[0, 10 + 7, 10] == 0.0               # outside


def test_composite_fuse_formula():
    """image = face - green(1-αf) + [mouth - green(1-αm) + torso(1-αm)](1-αf)
    (reference train_fuse_con.py:125-144)."""
    rng = np.random.default_rng(0)
    H = W = 8
    f = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))
    m = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))
    af = jnp.asarray(rng.uniform(size=(1, H, W)).astype(np.float32))
    am = jnp.asarray(rng.uniform(size=(1, H, W)).astype(np.float32))
    bg = jnp.array([0.0, 1.0, 0.0])
    torso = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))

    got = np.asarray(composite_fuse(f, af, m, am, bg, torso))
    mouth_full = m - bg[:, None, None] * (1 - am) + torso * (1 - am)
    want = f - bg[:, None, None] * (1 - af) + mouth_full * (1 - af)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5)


def test_mouth_move_feature_semantics():
    """move = [kth-largest, kth-smallest, range] of the face d_xyz.y x 100,
    masked to alive face slots (gaussian_renderer/__init__.py:366-374)."""
    from instag_tpu.models.gaussians import create_from_points
    n_face = 32
    rng = np.random.default_rng(1)
    dy = rng.normal(size=n_face).astype(np.float32)

    pts = jnp.asarray(rng.uniform(-0.05, 0.05, (8, 3)).astype(np.float32))
    cols = jnp.ones((8, 3)) * 0.5
    mouth_state = create_from_points(pts, cols, 16, 1, 1.0)
    face_state = create_from_points(
        jnp.asarray(rng.uniform(-0.05, 0.05, (n_face, 3)).astype(np.float32)),
        jnp.ones((n_face, 3)) * 0.5, n_face, 1, 1.0)

    captured = {}

    def mouth_umf(x, a, move):
        captured["move"] = move
        return {"d_xyz": jnp.zeros_like(x), "d_rot": jnp.zeros((x.shape[0], 4))}

    face_cache = {"d_xyz": jnp.stack(
        [jnp.zeros(n_face), jnp.asarray(dy), jnp.zeros(n_face)], -1)}

    cfg = RasterizeConfig(16, 16, max_per_tile=16, tile_chunk=1)
    cam = Camera(jnp.eye(4), jnp.eye(4), jnp.zeros(3) - jnp.array([0, 0, 2.0]),
                 jnp.float32(0.35), jnp.float32(0.35))
    k = 5
    render_motion_mouth(cfg, cam, mouth_state, mouth_umf, face_state,
                        None, jnp.zeros((8, 29, 16)), jnp.zeros(3),
                        personalized=False, align=False, k=k,
                        face_motion_cache=face_cache)
    move = np.asarray(captured["move"])[0]
    srt = np.sort(dy)[::-1]
    want_hi = srt[k - 1] * 100
    want_lo = np.sort(dy)[k - 1] * 100
    np.testing.assert_allclose(move[0], want_hi, rtol=1e-4)
    np.testing.assert_allclose(move[1], want_lo, rtol=1e-4)
    np.testing.assert_allclose(move[2], want_hi - want_lo, rtol=1e-4)


def test_mouth_move_feature_survives_tiny_face_cloud():
    """A face cloud with fewer alive splats than k_max must not poison the
    mouth branch with -inf/NaN through the top-k move feature (regression:
    heavy green/depth pruning at 512px left <50 alive face points)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from instag_tpu.models import gaussians as G
    from instag_tpu.ops.rasterize import RasterizeConfig
    from instag_tpu.render import render_motion_mouth
    from instag_tpu.models.motion import (MotionNetwork, MouthMotionNetwork,
                                          PersonalizedMotionNetwork)

    cfg = RasterizeConfig(32, 32, max_per_tile=32, tile_chunk=4)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-0.1, 0.1, (60, 3)).astype(np.float32))
    cols = jnp.full((60, 3), 0.5)
    face_state = G.create_from_points(pts, cols, 128, 1, 1.0)
    # kill all but 7 face splats (< k_max=50, < any drawn k)
    face_state = face_state.replace(alive=face_state.alive
                                    & (jnp.arange(128) < 7))
    mouth_state = G.create_from_points(pts * 0.5, cols, 128, 1, 1.0)

    mouth_net = MouthMotionNetwork("deepspeech")
    pmf_net = PersonalizedMotionNetwork("mouth", "deepspeech")
    face_net = MotionNetwork("deepspeech")
    aud = jnp.asarray(rng.normal(size=(8, 29, 16)).astype(np.float32))
    x0 = pts[:4]
    mouth_umf = mouth_net.init(jax.random.key(0), x0, aud, jnp.zeros((1, 3)))
    pmf = pmf_net.init(jax.random.key(1), x0, aud)
    face_umf = face_net.init(jax.random.key(2), x0, aud, jnp.zeros((6,)))

    from tests.test_rasterize import make_camera
    view, full, campos, tanfov = make_camera(32, 32)
    from instag_tpu.render import Camera
    cam = Camera(view, full, campos, jnp.float32(tanfov), jnp.float32(tanfov))

    mr = jax.jit(lambda: render_motion_mouth(
        cfg, cam, mouth_state,
        mouth_umf=lambda x, a, m: mouth_net.apply(mouth_umf, x, a, m),
        face_state=face_state,
        face_umf=lambda x, a, e: face_net.apply(face_umf, x, a, e),
        aud=aud, bg=jnp.zeros(3),
        pmf=lambda x, a: pmf_net.apply(pmf, x, a),
        personalized=True, align=False, k=jnp.int32(37)))()
    assert np.isfinite(np.asarray(mr.out.image)).all()
    # even a fully-dead face cloud stays finite (move features zero)
    dead = face_state.replace(alive=jnp.zeros((128,), bool))
    mr2 = jax.jit(lambda: render_motion_mouth(
        cfg, cam, mouth_state,
        mouth_umf=lambda x, a, m: mouth_net.apply(mouth_umf, x, a, m),
        face_state=dead,
        face_umf=lambda x, a, e: face_net.apply(face_umf, x, a, e),
        aud=aud, bg=jnp.zeros(3),
        pmf=lambda x, a: pmf_net.apply(pmf, x, a),
        personalized=True, align=False, k=jnp.int32(10)))()
    assert np.isfinite(np.asarray(mr2.out.image)).all()


def test_face_val_reporter_panels(tmp_path):
    """Reporter logs the reference panel set (training_report:814-883):
    L1/PSNR scalars, iter_time, val tile-saturation max, opacity histogram,
    and an 8-column panel PNG."""
    import json
    import os
    import numpy as np
    import jax.numpy as jnp
    from instag_tpu.bench_utils import (synthetic_frame_batch,
                                        synthetic_motion_params,
                                        synthetic_state)
    from instag_tpu.ops.rasterize import RasterizeConfig
    from instag_tpu.train.report import FaceValReporter

    size = 32
    cfg = RasterizeConfig(size, size, max_per_tile=32, tile_chunk=4)
    nets = synthetic_motion_params(onehot=True)
    state = synthetic_state(64, 128)
    batch = synthetic_frame_batch(size, n_frames=4)
    rep = FaceValReporter(cfg, nets["face_net"], nets["face_pmf_net"],
                          batch, batch, str(tmp_path), num_val=2,
                          num_train=2)
    r1 = rep(10, state, nets["face_umf_params"], nets["face_pmf_params"])
    r2 = rep(20, state, nets["face_umf_params"], nets["face_pmf_params"])
    for k in ("val_l1", "val_psnr", "train_l1", "train_psnr",
              "val_tile_sat_max"):
        assert k in r1 and np.isfinite(r1[k])
    tags = [json.loads(l)["tag"] for l in
            open(tmp_path / "metrics.jsonl")]
    assert "scene/opacity_histogram" in tags
    assert "val/tile_sat_max" in tags
    assert "iter_time_ms" in tags          # second call logs the rate
    pngs = os.listdir(tmp_path / "val_renders")
    assert any(p.startswith("val_") for p in pngs)
    # 8 columns wide
    from PIL import Image
    img = Image.open(tmp_path / "val_renders" / sorted(pngs)[0])
    assert img.size[0] == 8 * size


# ---------------------------------------------------------------------------
# selection reuse (synthesis temporal coherence — ops.rasterize.prepare
# selection=..., render_motion selection=..., --select_every)
# ---------------------------------------------------------------------------

def _motion_setup(size=32, n=64):
    from instag_tpu.bench_utils import (synthetic_camera,
                                        synthetic_motion_params,
                                        synthetic_state)
    cfg = RasterizeConfig(size, size, max_per_tile=64, tile_chunk=4)
    state = synthetic_state(n, n, seed=0, scale=0.01)
    nets = synthetic_motion_params()
    cam = synthetic_camera(size)
    return cfg, state, nets, cam


def test_selection_reuse_identical_frame_is_exact():
    """Reusing a frame's own selection must reproduce it bit-for-bit (the
    reuse path changes WHERE ids come from, nothing else)."""
    from instag_tpu.render import render_motion

    cfg, state, nets, cam = _motion_setup()
    bg = jnp.array([0.0, 1.0, 0.0], jnp.float32)

    def run(selection):
        return render_motion(
            cfg, cam, state,
            umf=lambda x, a, e: nets["face_net"].apply(
                nets["face_umf_params"], x, a, e),
            aud=nets["aud"], exp=nets["exp"], bg=bg,
            pmf=lambda x, a, e: nets["face_pmf_net"].apply(
                nets["face_pmf_params"], x, a, e),
            personalized=True, align=True, selection=selection)

    fresh = jax.jit(lambda: run(None))()
    reused = jax.jit(lambda s: run(s))(fresh.selection)
    np.testing.assert_array_equal(np.asarray(fresh.out.image),
                                  np.asarray(reused.out.image))
    np.testing.assert_array_equal(np.asarray(fresh.out.alpha),
                                  np.asarray(reused.out.alpha))
    np.testing.assert_array_equal(np.asarray(fresh.selection[0]),
                                  np.asarray(reused.selection[0]))


def test_selection_reuse_small_motion_stays_close():
    """A frames-old selection against new audio (new deformation) must stay
    visually indistinguishable — talking-scale motion barely changes tile
    membership."""
    from instag_tpu.render import render_motion
    from instag_tpu.utils.losses import psnr

    cfg, state, nets, cam = _motion_setup()
    bg = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    aud2 = nets["aud"] + 0.5 * jax.random.normal(jax.random.key(7),
                                                 nets["aud"].shape)

    def run(aud, selection):
        return render_motion(
            cfg, cam, state,
            umf=lambda x, a, e: nets["face_net"].apply(
                nets["face_umf_params"], x, a, e),
            aud=aud, exp=nets["exp"], bg=bg,
            pmf=lambda x, a, e: nets["face_pmf_net"].apply(
                nets["face_pmf_params"], x, a, e),
            personalized=True, align=True, selection=selection)

    f = jax.jit(run, static_argnums=())
    frame1 = jax.jit(lambda a: run(a, None))(nets["aud"])
    fresh2 = jax.jit(lambda a: run(a, None))(aud2)
    stale2 = jax.jit(lambda a, s: run(a, s))(aud2, frame1.selection)
    p = float(psnr(jnp.clip(stale2.out.image, 0, 1),
                   jnp.clip(fresh2.out.image, 0, 1)))
    assert p > 40.0, p


def test_selection_reuse_masks_culled_splats():
    """A stale selection may reference splats the current frustum culls;
    composite_prepared(mask_invisible=True) must zero them instead of
    compositing garbage."""
    from instag_tpu.ops.rasterize import composite_prepared, prepare

    size = 32
    cfg = RasterizeConfig(size, size, max_per_tile=16, tile_chunk=4)
    from instag_tpu.bench_utils import synthetic_camera
    cam = synthetic_camera(size)
    n = 8
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.uniform(-0.05, 0.05, (n, 3)).astype(np.float32))
    scales = jnp.full((n, 3), 0.02)
    rots = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    opac = jnp.full((n, 1), 0.9)
    colors = jnp.full((n, 3), 0.5)
    bg = jnp.zeros(3)

    args = (cfg, means, scales, rots, cam.view_transform,
            cam.full_proj_transform, cam.camera_center, cam.tanfovx,
            cam.tanfovy)
    prep1 = prepare(*args)
    sel = (prep1.ids, prep1.valid)

    # move every splat behind the camera (the synthetic camera sits at
    # world z=-10/3 looking toward +z: view-space tz = z + 10/3, so
    # z = -100 puts them far behind): current projection culls all
    behind = means + jnp.array([0.0, 0.0, -100.0])
    prep2 = prepare(cfg, behind, scales, rots, cam.view_transform,
                    cam.full_proj_transform, cam.camera_center, cam.tanfovx,
                    cam.tanfovy, selection=sel)
    assert not bool(np.asarray(prep2.proj.visible).any())
    out = composite_prepared(cfg, prep2, opac, colors, bg,
                             mask_invisible=True)
    np.testing.assert_allclose(np.asarray(out.alpha), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.image), 0.0, atol=1e-6)


def test_synthesis_chunk_select_every_matches_on_static_frames():
    """With identical frames in the batch, --select_every k must reproduce
    per-frame selection bit-for-bit (same selection recomputed or reused)."""
    from instag_tpu.bench_utils import (synthetic_frame_batch,
                                        synthetic_motion_params,
                                        synthetic_state)
    from instag_tpu.config import ModelConfig
    from instag_tpu.synthesize import make_synthesis_chunk_fn

    size = 32
    cfg = RasterizeConfig(size, size, max_per_tile=32, tile_chunk=4)
    mc = ModelConfig(audio_extractor="deepspeech")
    face_state = synthetic_state(48, 64, seed=0, scale=0.01)
    mouth_state = synthetic_state(24, 32, seed=1, scale=0.01)
    nets = synthetic_motion_params()
    batch = synthetic_frame_batch(size, n_frames=4)

    args = (face_state, mouth_state, nets["face_umf_params"],
            nets["mouth_umf_params"], nets["face_pmf_params"],
            nets["mouth_pmf_params"], batch,
            jnp.zeros((4,), jnp.int32))          # same frame 4x

    f1 = make_synthesis_chunk_fn(cfg, mc, select_every=1)
    f2 = make_synthesis_chunk_fn(cfg, mc, select_every=2)
    np.testing.assert_array_equal(np.asarray(f1(*args)),
                                  np.asarray(f2(*args)))


def test_synthesis_chunk_select_every_rejects_nonpositive():
    """select_every < 1 must raise up front (CLI-exposed value 0 used to hit
    ZeroDivisionError; negatives passed the modulo check then failed deep in
    reshape) — ADVICE r4."""
    import pytest

    from instag_tpu.config import ModelConfig
    from instag_tpu.synthesize import make_synthesis_chunk_fn

    cfg = RasterizeConfig(32, 32, max_per_tile=32, tile_chunk=4)
    mc = ModelConfig(audio_extractor="deepspeech")
    for bad in (0, -2):
        with pytest.raises(ValueError, match="select_every"):
            make_synthesis_chunk_fn(cfg, mc, select_every=bad)


def test_synthesis_auto_static_is_exact_and_refreshes_once():
    """--select_auto on static frames: zero staleness -> boot refresh only,
    and the images match reference-exact per-frame selection bit-for-bit."""
    from instag_tpu.bench_utils import (synthetic_frame_batch,
                                        synthetic_motion_params,
                                        synthetic_state)
    from instag_tpu.config import ModelConfig
    from instag_tpu.synthesize import (make_synthesis_chunk_auto_fn,
                                       make_synthesis_chunk_fn)

    size = 32
    cfg = RasterizeConfig(size, size, max_per_tile=32, tile_chunk=4)
    mc = ModelConfig(audio_extractor="deepspeech")
    face_state = synthetic_state(48, 64, seed=0, scale=0.01)
    mouth_state = synthetic_state(24, 32, seed=1, scale=0.01)
    nets = synthetic_motion_params()
    batch = synthetic_frame_batch(size, n_frames=4)
    margs = (face_state, mouth_state, nets["face_umf_params"],
             nets["mouth_umf_params"], nets["face_pmf_params"],
             nets["mouth_pmf_params"], batch)
    ivec = jnp.zeros((4,), jnp.int32)            # same frame 4x

    exact = make_synthesis_chunk_fn(cfg, mc, select_every=1)(*margs, ivec)
    boot, step = make_synthesis_chunk_auto_fn(cfg, mc, thresh_px=4.0)
    imgs1, carry = boot(*margs, ivec)
    imgs2, carry = step(*margs, ivec, carry)
    np.testing.assert_array_equal(np.asarray(imgs1), np.asarray(exact))
    np.testing.assert_array_equal(np.asarray(imgs2), np.asarray(exact))
    assert np.asarray(carry[-1]).tolist() == [1, 1]   # boot refresh only


def test_synthesis_auto_refreshes_on_fast_head_turn():
    """--select_auto under an adversarial pose jump: the displacement guard
    fires (refresh count grows) and the post-jump frame is rendered from a
    refreshed selection (matches exact), where fixed-cadence reuse would
    keep compositing pre-jump tile lists."""
    from instag_tpu.bench_utils import (synthetic_camera,
                                        synthetic_frame_batch,
                                        synthetic_motion_params,
                                        synthetic_state)
    from instag_tpu.config import ModelConfig
    from instag_tpu.synthesize import (make_synthesis_chunk_auto_fn,
                                       make_synthesis_chunk_fn)
    from instag_tpu.utils.graphics import projection_matrix, world_to_view
    from instag_tpu.utils.losses import psnr

    size = 64
    cfg = RasterizeConfig(size, size, max_per_tile=32, tile_chunk=4)
    mc = ModelConfig(audio_extractor="deepspeech")
    face_state = synthetic_state(48, 64, seed=0, scale=0.01)
    mouth_state = synthetic_state(24, 32, seed=1, scale=0.01)
    nets = synthetic_motion_params()
    batch = synthetic_frame_batch(size, n_frames=4)

    # frames 2-3: a fast head move (diagonal lateral shift — ~21 px of
    # uniform projected displacement, landing the cloud in tiles whose
    # stale lists never saw it: the worst case fixed-cadence reuse cannot
    # detect)
    proj = projection_matrix(0.01, 100.0, 0.5, 0.5)
    R = np.eye(3, dtype=np.float32)
    w2c = world_to_view(R, np.array([0.55, 0.55, 10.0 / 3.0], np.float32))
    vt = np.asarray(batch.view_transform).copy()
    ft = np.asarray(batch.full_proj_transform).copy()
    cc = np.asarray(batch.camera_center).copy()
    vt[2:] = w2c.T
    ft[2:] = (proj @ w2c).T
    cc[2:] = np.linalg.inv(w2c)[:3, 3]
    batch = batch.replace(view_transform=jnp.asarray(vt),
                          full_proj_transform=jnp.asarray(ft),
                          camera_center=jnp.asarray(cc))

    margs = (face_state, mouth_state, nets["face_umf_params"],
             nets["mouth_umf_params"], nets["face_pmf_params"],
             nets["mouth_pmf_params"], batch)
    ivec = jnp.arange(4, dtype=jnp.int32)

    exact = make_synthesis_chunk_fn(cfg, mc, select_every=1)(*margs, ivec)
    stale = make_synthesis_chunk_fn(cfg, mc, select_every=4)(*margs, ivec)
    boot, step = make_synthesis_chunk_auto_fn(cfg, mc, thresh_px=4.0)
    auto, carry = boot(*margs, ivec)
    assert int(np.asarray(carry[-1]).max()) >= 2   # boot + jump-triggered

    def p(a, b):
        return float(psnr(jnp.asarray(a, jnp.float32) / 255.0,
                          jnp.asarray(b, jnp.float32) / 255.0))

    # frame 3 (one frame after the jump): auto has refreshed, fixed-cadence
    # has not — auto must be strictly better and near-exact
    p_auto, p_stale = p(auto[3], exact[3]), p(stale[3], exact[3])
    assert p_auto > p_stale + 3.0, (p_auto, p_stale)
    assert p_auto > 45.0, p_auto
