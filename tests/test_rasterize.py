import numpy as np
import jax
import jax.numpy as jnp
import pytest

from instag_tpu.ops.rasterize import RasterizeConfig, project_gaussians, rasterize
from instag_tpu.ops.reference_splat import splat_reference
from instag_tpu.utils.graphics import projection_matrix, world_to_view


def make_camera(H=64, W=64, fov=0.7):
    R = np.eye(3)
    t = np.array([0.0, 0.0, 2.0])  # camera looking down +z at origin cloud
    w2c = world_to_view(R, t)
    proj = projection_matrix(0.01, 100.0, fov, fov)
    view_T = jnp.asarray(w2c.T)
    full_T = jnp.asarray((proj @ w2c).T)
    campos = jnp.asarray(np.linalg.inv(w2c)[:3, 3].astype(np.float32))
    tanfov = float(np.tan(fov / 2))
    return view_T, full_T, campos, tanfov


def make_scene(n=120, seed=0, sh_deg=1):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    scales = (0.02 + 0.03 * rng.uniform(size=(n, 3))).astype(np.float32)
    rots = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, (n, 1)).astype(np.float32)
    k = (sh_deg + 1) ** 2
    shs = (0.3 * rng.normal(size=(n, k, 3))).astype(np.float32)
    return tuple(map(jnp.asarray, (means, opac, scales, rots, shs)))


@pytest.mark.parametrize("sh_deg", [0, 1, 2])
def test_matches_bruteforce_oracle(sh_deg):
    H = W = 64
    cfg = RasterizeConfig(H, W, max_per_tile=160, tile_chunk=8, approx_topk=False)
    view, full, campos, tanfov = make_camera(H, W)
    means, opac, scales, rots, shs = make_scene(n=120, sh_deg=sh_deg)
    bg = jnp.array([0.1, 0.2, 0.3], jnp.float32)

    out = jax.jit(lambda *a: rasterize(cfg, *a, shs=shs, sh_degree=sh_deg))(
        means, opac, scales, rots, view, full, campos, tanfov, tanfov, bg)
    img_ref, dep_ref, nrm_ref, alp_ref = splat_reference(
        cfg, means, opac, scales, rots, view, full, campos, tanfov, tanfov,
        bg, shs=shs, sh_degree=sh_deg)

    np.testing.assert_allclose(np.asarray(out.image), img_ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.alpha), alp_ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.depth), dep_ref, atol=2e-2)
    np.testing.assert_allclose(np.asarray(out.normal), nrm_ref, atol=5e-3)


def test_oracle_bbox_sigma_is_exact():
    """The bbox-accelerated oracle sweep (scripts/parity_fullframe.py)
    must reproduce the full-frame sweep bit-for-bit: a 4-sigma pixel box
    only excludes pixels the alpha < 1/255 floor already skips."""
    H = W = 64
    cfg = RasterizeConfig(H, W, max_per_tile=160, tile_chunk=8,
                          approx_topk=False)
    view, full, campos, tanfov = make_camera(H, W)
    means, opac, scales, rots, shs = make_scene(n=120, sh_deg=1)
    bg = jnp.array([0.1, 0.2, 0.3], jnp.float32)
    args = (cfg, means, opac, scales, rots, view, full, campos, tanfov,
            tanfov, bg)
    full_sweep = splat_reference(*args, shs=shs, sh_degree=1)
    boxed = splat_reference(*args, shs=shs, sh_degree=1, bbox_sigma=4.0)
    for a, b in zip(full_sweep, boxed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_colors_precomp_path():
    H = W = 32
    cfg = RasterizeConfig(H, W, max_per_tile=64, tile_chunk=4, approx_topk=False)
    view, full, campos, tanfov = make_camera(H, W)
    means, opac, scales, rots, _ = make_scene(n=40)
    colors = jnp.asarray(np.random.default_rng(1).uniform(size=(40, 3)).astype(np.float32))
    bg = jnp.zeros(3)
    out = jax.jit(lambda *a: rasterize(cfg, *a, colors_precomp=colors))(
        means, opac, scales, rots, view, full, campos, tanfov, tanfov, bg)
    img_ref, *_ = splat_reference(cfg, means, opac, scales, rots, view, full,
                                  campos, tanfov, tanfov, bg, colors_precomp=colors)
    np.testing.assert_allclose(np.asarray(out.image), img_ref, atol=2e-3)


def test_radii_and_visibility():
    H = W = 32
    cfg = RasterizeConfig(H, W, max_per_tile=32, tile_chunk=4)
    view, full, campos, tanfov = make_camera(H, W)
    means, opac, scales, rots, shs = make_scene(n=20)
    # put one gaussian behind the camera -> culled
    means = means.at[0, 2].set(10.0)  # camera at z=-2 looking +z... behind far? keep in front
    means = means.at[1].set(jnp.array([0.0, 0.0, -5.0]))  # behind camera
    bg = jnp.zeros(3)
    out = jax.jit(lambda *a: rasterize(cfg, *a, shs=shs, sh_degree=1))(
        means, opac, scales, rots, view, full, campos, tanfov, tanfov, bg)
    radii = np.asarray(out.radii)
    assert radii[1] == 0
    assert (radii >= 0).all()
    assert radii.max() > 0


def test_active_mask_hides_gaussians():
    H = W = 32
    cfg = RasterizeConfig(H, W, max_per_tile=64, tile_chunk=4)
    view, full, campos, tanfov = make_camera(H, W)
    means, opac, scales, rots, shs = make_scene(n=30)
    bg = jnp.zeros(3)
    active = jnp.zeros((30,), bool).at[:10].set(True)
    run = jax.jit(lambda m, o, s, r, sh, act: rasterize(
        cfg, m, o, s, r, view, full, campos, tanfov, tanfov, bg,
        shs=sh, sh_degree=1, active=act))
    out_masked = run(means, opac, scales, rots, shs, active)
    out_subset = run(means[:10], opac[:10], scales[:10], rots[:10], shs[:10],
                     jnp.ones((10,), bool))
    np.testing.assert_allclose(np.asarray(out_masked.image),
                               np.asarray(out_subset.image), atol=1e-5)
    assert (np.asarray(out_masked.radii[10:]) == 0).all()


def test_gradients_finite_difference():
    H = W = 32
    cfg = RasterizeConfig(H, W, max_per_tile=32, tile_chunk=4)
    view, full, campos, tanfov = make_camera(H, W)
    means, opac, scales, rots, shs = make_scene(n=8, seed=3)
    bg = jnp.array([0.5, 0.5, 0.5])
    target = jnp.zeros((3, H, W))

    @jax.jit
    def loss(m, o, s):
        out = rasterize(cfg, m, o, s, rots, view, full, campos,
                        tanfov, tanfov, bg, shs=shs, sh_degree=1)
        return jnp.mean((out.image - target) ** 2)

    g_m, g_o, g_s = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(means, opac, scales)
    assert np.isfinite(np.asarray(g_m)).all()
    assert float(jnp.abs(g_o).sum()) > 0

    eps = 1e-3
    for (arr, g, idx, name) in [
        (means, g_m, (2, 0), "means.x"),
        (means, g_m, (4, 2), "means.z"),
        (opac, g_o, (1, 0), "opacity"),
        (scales, g_s, (3, 1), "scale.y"),
    ]:
        f0 = float(loss(*(a if a is not arr else arr.at[idx].add(-eps)
                          for a in (means, opac, scales))))
        f1 = float(loss(*(a if a is not arr else arr.at[idx].add(eps)
                          for a in (means, opac, scales))))
        fd = (f1 - f0) / (2 * eps)
        an = float(g[idx])
        assert abs(fd - an) < 5e-3 * max(1.0, abs(fd), abs(an)) + 1e-6, (
            f"{name}: fd={fd} analytic={an}")


def test_means2d_offset_gradient():
    """The densification-stats hook: grads w.r.t. the zero pixel-space offset
    (reference screenspace_points trick, gaussian_renderer/__init__.py:47-52)."""
    H = W = 32
    cfg = RasterizeConfig(H, W, max_per_tile=32, tile_chunk=4)
    view, full, campos, tanfov = make_camera(H, W)
    means, opac, scales, rots, shs = make_scene(n=8, seed=4)
    bg = jnp.zeros(3)
    offset = jnp.zeros((8, 2))

    @jax.jit
    def loss(off):
        out = rasterize(cfg, means, opac, scales, rots, view, full, campos,
                        tanfov, tanfov, bg, shs=shs, sh_degree=1,
                        means2d_offset=off)
        return jnp.mean(out.image ** 2)

    g = jax.jit(jax.grad(loss))(offset)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
    eps = 1e-3
    fd = (float(loss(offset.at[0, 0].add(eps))) -
          float(loss(offset.at[0, 0].add(-eps)))) / (2 * eps)
    np.testing.assert_allclose(fd, float(g[0, 0]), rtol=5e-2, atol=1e-7)


def test_jit_compiles_and_caches():
    H = W = 64
    cfg = RasterizeConfig(H, W, max_per_tile=64, tile_chunk=8)
    view, full, campos, tanfov = make_camera(H, W)
    means, opac, scales, rots, shs = make_scene(n=50)
    bg = jnp.zeros(3)

    @jax.jit
    def run(m):
        return rasterize(cfg, m, opac, scales, rots, view, full, campos,
                         tanfov, tanfov, bg, shs=shs, sh_degree=1).image

    a = run(means)
    b = run(means + 0.001)
    assert a.shape == (3, H, W)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_nondivisible_image_size():
    H, W = 50, 70  # not multiples of 16
    cfg = RasterizeConfig(H, W, max_per_tile=32, tile_chunk=4)
    view, full, campos, tanfov = make_camera(H, W)
    means, opac, scales, rots, shs = make_scene(n=30)
    bg = jnp.array([1.0, 0.0, 0.0])
    out = jax.jit(lambda *a: rasterize(cfg, *a, shs=shs, sh_degree=1))(
        means, opac, scales, rots, view, full, campos, tanfov, tanfov, bg)
    assert out.image.shape == (3, H, W)
    assert out.alpha.shape == (1, H, W)


def test_approx_topk_close_to_exact():
    """approx_max_k selection must stay visually equivalent to exact."""
    H = W = 64
    view, full, campos, tanfov = make_camera(H, W)
    means, opac, scales, rots, shs = make_scene(n=300, seed=7)
    bg = jnp.array([0.1, 0.2, 0.3])
    imgs = {}
    for approx in (False, True):
        cfg = RasterizeConfig(H, W, max_per_tile=128, tile_chunk=8,
                              approx_topk=approx)
        imgs[approx] = np.asarray(jax.jit(
            lambda *a: rasterize(cfg, *a, shs=shs, sh_degree=1))(
            means, opac, scales, rots, view, full, campos, tanfov, tanfov,
            bg).image)
    err = np.abs(imgs[True] - imgs[False]).mean()
    assert err < 5e-3, f"approx selection deviates: mean |err|={err}"


def test_camera_plane_crossing_grads_finite():
    """A splat exactly ON the camera plane (view z = 0, phw ~ 0) must not
    poison gradients: at tz -> 0 the EWA focal/tz^2 terms overflow f32
    (det = inf - inf = NaN) and the NaN leaks through zero cotangents of
    the COMPILED backward (0 * NaN = NaN) into every parameter — observed
    live as a whole-run NaN in pre-training. The fix clamps the EWA tz at
    the CUDA cull depth (forward.cu evaluates no cov for p_view.z <= 0.2),
    bit-identical for every visible splat."""
    H = W = 32
    cfg = RasterizeConfig(H, W, max_per_tile=32, tile_chunk=4)
    view, full, campos, tanfov = make_camera(H, W)
    means, opac, scales, rots, shs = make_scene(n=16)
    bg = jnp.zeros(3)

    def loss(m):
        out = rasterize(cfg, m, opac, scales, rots, view, full, campos,
                        tanfov, tanfov, bg, shs=shs, sh_degree=1)
        return jnp.mean(out.image ** 2)

    gfn = jax.jit(jax.value_and_grad(loss))
    # camera sits at view z=0 plane <-> world z = -2 for this camera
    for z in (-2.0, -2.0000001, -1.9999999, -1.99):
        m2 = means.at[0].set(jnp.array([0.05, 0.05, z]))
        l, g = gfn(m2)
        assert np.isfinite(float(l))
        assert np.isfinite(np.asarray(g)).all(), f"NaN grad at z={z}"


def test_cov3d_precomp_matches_scales_rotations():
    """The diff_gauss cov3Ds_precomp input (SURVEY.md §2.4; reference
    scene/gaussian_model.py:33-41 upper-triangular layout) must reproduce
    the scales+rotations path exactly when fed the equivalent R S^2 R^T."""
    H = W = 32
    cfg = RasterizeConfig(H, W, max_per_tile=64, tile_chunk=4,
                          approx_topk=False)
    view, full, campos, tanfov = make_camera(H, W)
    means, opac, scales, rots, shs = make_scene(n=60)
    bg = jnp.array([0.05, 0.1, 0.15], jnp.float32)

    # build Sigma = R S^2 R^T in the reference's (c00,c01,c02,c11,c12,c22)
    from instag_tpu.utils.general import quat_to_rotmat, safe_normalize
    R = np.asarray(quat_to_rotmat(safe_normalize(rots)))       # [N, 3, 3]
    S2 = np.asarray(scales) ** 2
    Sig = np.einsum("nij,nj,nkj->nik", R, S2, R)
    cov6 = jnp.asarray(np.stack([Sig[:, 0, 0], Sig[:, 0, 1], Sig[:, 0, 2],
                                 Sig[:, 1, 1], Sig[:, 1, 2], Sig[:, 2, 2]],
                                axis=1).astype(np.float32))

    out_sr = jax.jit(lambda *a: rasterize(cfg, *a, shs=shs, sh_degree=1))(
        means, opac, scales, rots, view, full, campos, tanfov, tanfov, bg)
    out_cv = jax.jit(lambda *a: rasterize(
        cfg, *a, shs=shs, sh_degree=1, cov3d_precomp=cov6))(
        means, opac, scales, rots, view, full, campos, tanfov, tanfov, bg)
    np.testing.assert_allclose(np.asarray(out_cv.image),
                               np.asarray(out_sr.image), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_cv.radii),
                                  np.asarray(out_sr.radii))


def test_two_stage_select_matches_single_stage():
    """Row-prefiltered selection must reproduce the single-stage selection
    exactly when rows don't overflow M (exact top-k both stages)."""
    H = W = 64
    view, full, campos, tanfov = make_camera(H, W)
    means, opac, scales, rots, shs = make_scene(n=600, seed=3)
    bg = jnp.array([0.1, 0.2, 0.3])
    imgs = {}
    for two_stage in (False, True):
        cfg = RasterizeConfig(H, W, max_per_tile=128, tile_chunk=8,
                              approx_topk=False, two_stage_select=two_stage,
                              row_select_m=512)  # < n -> path taken
        imgs[two_stage] = np.asarray(jax.jit(
            lambda *a: rasterize(cfg, *a, shs=shs, sh_degree=1))(
            means, opac, scales, rots, view, full, campos, tanfov, tanfov,
            bg).image)
    err = np.abs(imgs[True] - imgs[False]).max()
    assert err < 1e-5, f"two-stage selection deviates: max |err|={err}"


def test_two_stage_select_gradients_match():
    """Gradients through the two-stage-selected composite equal the
    single-stage ones (selection is index-only; same splats selected)."""
    H = W = 48
    view, full, campos, tanfov = make_camera(H, W)
    means, opac, scales, rots, shs = make_scene(n=400, seed=5)
    bg = jnp.array([0.0, 0.0, 0.0])
    grads = {}
    for two_stage in (False, True):
        cfg = RasterizeConfig(H, W, max_per_tile=96, tile_chunk=8,
                              approx_topk=False, two_stage_select=two_stage,
                              row_select_m=360)

        def loss(m, o):
            out = rasterize(cfg, m, o, scales, rots, view, full, campos,
                            tanfov, tanfov, bg, shs=shs, sh_degree=1)
            return jnp.mean(out.image ** 2) + jnp.mean(out.alpha)

        grads[two_stage] = jax.jit(jax.grad(loss, argnums=(0, 1)))(means, opac)
    for ga, gb in zip(grads[False], grads[True]):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   atol=1e-6, rtol=1e-5)


def test_select_key_dtype_bf16_rebased_matches_f32():
    """bfloat16 selection keys (select_key_dtype knob): after rebasing
    depths to the nearest visible depth (bf16 precision is relative —
    without it a head at depth ~3.3 loses whole 13-mm slabs to ordering
    ties), tile membership and front ordering match f32 keys exactly at
    talking-head depth spreads."""
    import numpy as np
    from instag_tpu.bench_utils import synthetic_camera, synthetic_state
    from instag_tpu.ops.rasterize import RasterizeConfig, prepare

    size = 128
    st = synthetic_state(2000, 2048, seed=0, scale=0.01)
    cam = synthetic_camera(size)

    def sel(dtype):
        cfg = RasterizeConfig(size, size, max_per_tile=64, tile_chunk=8,
                              approx_topk=False, select_key_dtype=dtype)
        p = prepare(cfg, st.params.xyz, st.get_scaling(),
                    st.get_rotation(), cam.view_transform,
                    cam.full_proj_transform, cam.camera_center,
                    cam.tanfovx, cam.tanfovy, active=st.alive)
        return np.asarray(p.ids), np.asarray(p.valid)

    i32, v32 = sel("float32")
    i16, v16 = sel("bfloat16")
    np.testing.assert_array_equal(v32, v16)
    for t in range(i32.shape[0]):
        # identical MEMBERSHIP; ordering may swap only within exact bf16
        # depth ties (the documented accepted cost), so pin the set and
        # the front-most splat, not the full order
        np.testing.assert_array_equal(np.sort(i32[t][v32[t]]),
                                      np.sort(i16[t][v16[t]]))
        if v32[t].any():
            assert i32[t][0] == i16[t][0]
