import numpy as np
import jax
import jax.numpy as jnp

from instag_tpu.utils import sh as shmod
from instag_tpu.utils.general import (
    covariance_from_scaling_rotation, expon_lr, quat_normalize, quat_to_rotmat)
from instag_tpu.utils.graphics import (
    focal2fov, fov2focal, projection_matrix, world_to_view)
from instag_tpu.utils.losses import l1_loss, patchify, psnr, ssim
import pytest

pytestmark = pytest.mark.smoke  # fast contract tier: pytest -m smoke < 5 min


def _eval_sh_numpy(deg, sh, dirs):
    """Direct transcription of the PlenOctree polynomial (reference
    utils/sh_utils.py:57-117) as an independent oracle."""
    C0, C1 = shmod.C0, shmod.C1
    C2, C3, C4 = shmod.C2, shmod.C3, shmod.C4
    result = C0 * sh[..., 0]
    if deg > 0:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = result - C1 * y * sh[..., 1] + C1 * z * sh[..., 2] - C1 * x * sh[..., 3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result + C2[0] * xy * sh[..., 4] + C2[1] * yz * sh[..., 5]
                      + C2[2] * (2 * zz - xx - yy) * sh[..., 6]
                      + C2[3] * xz * sh[..., 7] + C2[4] * (xx - yy) * sh[..., 8])
            if deg > 2:
                result = (result + C3[0] * y * (3 * xx - yy) * sh[..., 9]
                          + C3[1] * xy * z * sh[..., 10]
                          + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11]
                          + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12]
                          + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13]
                          + C3[5] * z * (xx - yy) * sh[..., 14]
                          + C3[6] * x * (xx - 3 * yy) * sh[..., 15])
                if deg > 3:
                    result = (result + C4[0] * xy * (xx - yy) * sh[..., 16]
                              + C4[1] * yz * (3 * xx - yy) * sh[..., 17]
                              + C4[2] * xy * (7 * zz - 1) * sh[..., 18]
                              + C4[3] * yz * (7 * zz - 3) * sh[..., 19]
                              + C4[4] * (zz * (35 * zz - 30) + 3) * sh[..., 20]
                              + C4[5] * xz * (7 * zz - 3) * sh[..., 21]
                              + C4[6] * (xx - yy) * (7 * zz - 1) * sh[..., 22]
                              + C4[7] * xz * (xx - 3 * yy) * sh[..., 23]
                              + C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)) * sh[..., 24])
    return result


def test_eval_sh_matches_reference_polynomials():
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(64, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    for deg in range(5):
        k = (deg + 1) ** 2
        coeffs = rng.normal(size=(64, 1, k)).astype(np.float32)
        got = shmod.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(dirs.astype(np.float32)))
        # oracle follows the reference broadcasting: sh [..., C, K], dirs [..., 3]
        want = _eval_sh_numpy(deg, coeffs, dirs.astype(np.float32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want).reshape(64, 1),
                                   rtol=2e-4, atol=2e-5)


def test_rgb_sh_roundtrip():
    x = jnp.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(shmod.sh2rgb(shmod.rgb2sh(x)), x, rtol=1e-6)


def test_world_to_view_inverse_roundtrip():
    rng = np.random.default_rng(1)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.normal(size=3)
    w2c = world_to_view(q, t)
    c2w = np.linalg.inv(w2c)
    cam_center = c2w[:3, 3]
    # transforming cam_center to view space lands at origin
    p = w2c @ np.append(cam_center, 1.0)
    np.testing.assert_allclose(p[:3], 0, atol=1e-5)


def test_projection_matrix_corners():
    znear, zfar = 0.01, 100.0
    fov = focal2fov(1200.0, 512)
    P = projection_matrix(znear, zfar, fov, fov)
    # a point on the near-plane frustum corner maps to ndc x == 1
    x = np.tan(fov / 2) * znear
    v = P @ np.array([x, 0, znear, 1.0])
    np.testing.assert_allclose(v[0] / v[3], 1.0, rtol=1e-5)
    # far plane maps to ndc z == 1
    v = P @ np.array([0, 0, zfar, 1.0])
    np.testing.assert_allclose(v[2] / v[3], 1.0, rtol=1e-5)
    assert abs(fov2focal(fov, 512) - 1200.0) < 1e-3


def test_expon_lr_schedule():
    # endpoint + monotone interpolation (reference utils/general_utils.py:36-68)
    f0 = float(expon_lr(0, 1.6e-4, 1.6e-6, max_steps=30000))
    fN = float(expon_lr(30000, 1.6e-4, 1.6e-6, max_steps=30000))
    assert abs(f0 - 1.6e-4) < 1e-9
    assert abs(fN - 1.6e-6) < 1e-10
    mid = float(expon_lr(15000, 1.6e-4, 1.6e-6, max_steps=30000))
    assert fN < mid < f0
    assert float(expon_lr(10, 0.0, 0.0, max_steps=100)) == 0.0


def test_quat_rotation_orthonormal():
    rng = np.random.default_rng(2)
    q = quat_normalize(jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32)))
    R = quat_to_rotmat(q)
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    dets = np.linalg.det(np.asarray(R))
    np.testing.assert_allclose(dets, 1.0, atol=1e-5)


def test_covariance_psd():
    rng = np.random.default_rng(3)
    s = jnp.asarray(np.abs(rng.normal(size=(8, 3))).astype(np.float32)) + 0.1
    q = quat_normalize(jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32)))
    cov = covariance_from_scaling_rotation(s, q)
    eigs = np.linalg.eigvalsh(np.asarray(cov))
    assert (eigs > 0).all()
    # eigenvalues are the squared scales
    np.testing.assert_allclose(np.sort(eigs, -1), np.sort(np.asarray(s) ** 2, -1), rtol=1e-4)


def test_ssim_and_psnr_basic():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(size=(3, 32, 32)).astype(np.float32))
    assert float(ssim(img, img)) > 0.9999
    assert float(psnr(img, img)) > 80
    noisy = img + 0.1
    assert float(ssim(img, noisy)) < 0.9999


def test_patchify_shapes():
    x = jnp.arange(3 * 64 * 64, dtype=jnp.float32).reshape(3, 64, 64)
    p = patchify(x, 16)
    assert p.shape == (16, 3, 16, 16)
    np.testing.assert_allclose(np.asarray(p[0]), np.asarray(x[:, :16, :16]))


def test_l1():
    a = jnp.zeros((2, 2))
    b = jnp.ones((2, 2))
    assert float(l1_loss(a, b)) == 1.0


def test_sh_recurrence_matches_hardcoded():
    """Degrees 5-8 come from the Legendre recurrence; the same code path at
    deg<=4 must reproduce the reference's hard-coded polynomials exactly."""
    from instag_tpu.utils.sh import _sh_basis_recurrence, sh_basis
    rng = np.random.default_rng(0)
    d = rng.normal(size=(200, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    for deg in (1, 2, 3, 4):
        got = np.asarray(_sh_basis_recurrence(deg, d))
        want = np.asarray(sh_basis(deg, d))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_sh_degrees_5_to_8_orthonormal():
    """Monte-Carlo orthonormality on the sphere: E[Y_i Y_j] = d_ij / 4pi."""
    from instag_tpu.utils.sh import sh_basis
    rng = np.random.default_rng(1)
    d = rng.normal(size=(200000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    basis = np.asarray(sh_basis(8, jnp.asarray(d.astype(np.float32))))
    assert basis.shape == (200000, 81)
    gram = 4 * np.pi * (basis.T @ basis) / basis.shape[0]
    np.testing.assert_allclose(gram, np.eye(81), atol=0.12)
