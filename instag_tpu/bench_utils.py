"""In-memory synthetic model/camera builders for benchmarks and entry checks
(no dataset files needed)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .models import gaussians as G
from .models.motion import (MotionNetwork, MouthMotionNetwork,
                            PersonalizedMotionNetwork)
from .render import Camera
from .utils.graphics import projection_matrix, world_to_view


def synthetic_camera(size: int, fov: float = 0.5) -> Camera:
    w2c = world_to_view(np.eye(3), np.array([0.0, 0.0, 10.0 / 3.0]))
    proj = projection_matrix(0.01, 100.0, fov, fov)
    return Camera(
        view_transform=jnp.asarray(w2c.T),
        full_proj_transform=jnp.asarray((proj @ w2c).T),
        camera_center=jnp.asarray(np.linalg.inv(w2c)[:3, 3].astype(np.float32)),
        tanfovx=jnp.float32(np.tan(fov / 2)),
        tanfovy=jnp.float32(np.tan(fov / 2)))


def synthetic_state(n: int, capacity: int, seed: int = 0,
                    max_sh_degree: int = 1, spread: float = 0.1,
                    scale: float = 0.01) -> G.GaussianState:
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(-spread, spread, (n, 3)).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32))
    state = G.create_from_points(pts, cols, capacity, max_sh_degree, 1.0)
    # deterministic moderate scales/opacity for a realistic splat load
    from .models.gaussians import softplus_inverse
    from .utils.general import inverse_sigmoid
    params = state.params.replace(
        scaling=jnp.full((capacity, 3), float(softplus_inverse(jnp.float32(scale)))),
        opacity=jnp.full((capacity, 1), float(inverse_sigmoid(jnp.float32(0.7)))))
    return state.replace(params=params,
                         active_sh_degree=jnp.int32(max_sh_degree))


def synthetic_motion_params(audio_extractor: str = "deepspeech",
                            seed: int = 0, onehot: bool = False):
    """Init UMF/PMF params for both branches. onehot=False builds
    inference-mode (gather-lookup) nets; params are layout-identical."""
    face_net = MotionNetwork(audio_extractor, onehot=onehot)
    mouth_net = MouthMotionNetwork(audio_extractor, onehot=onehot)
    face_pmf = PersonalizedMotionNetwork("face", audio_extractor, onehot=onehot)
    mouth_pmf = PersonalizedMotionNetwork("mouth", audio_extractor, onehot=onehot)
    keys = jax.random.split(jax.random.key(seed), 4)
    x0 = jnp.zeros((8, 3))
    aud = jnp.zeros((8, 29, 16))
    exp = jnp.zeros((6,))
    move = jnp.zeros((1, 3))
    return dict(
        face_net=face_net, mouth_net=mouth_net,
        face_pmf_net=face_pmf, mouth_pmf_net=mouth_pmf,
        face_umf_params=jax.jit(face_net.init)(keys[0], x0, aud, exp),
        mouth_umf_params=jax.jit(mouth_net.init)(keys[1], x0, aud, move),
        face_pmf_params=jax.jit(face_pmf.init)(keys[2], x0, aud, exp),
        mouth_pmf_params=jax.jit(mouth_pmf.init)(keys[3], x0, aud),
        aud=jnp.asarray(np.random.default_rng(seed).normal(
            size=(8, 29, 16)).astype(np.float32)),
        exp=jnp.asarray(np.abs(np.random.default_rng(seed + 1).normal(
            0.3, 0.2, 6)).astype(np.float32)))


def synthetic_frame_batch(size: int, n_frames: int = 4, seed: int = 0,
                          aud_dim: int = 29):
    """A fully in-memory FrameBatch at adaptation-scale shapes (for
    training-step benchmarks; no dataset files needed)."""
    from .train.common import FrameBatch

    rng = np.random.default_rng(seed)
    cam = synthetic_camera(size)
    f = n_frames

    def tile(x):
        return jnp.tile(jnp.asarray(x)[None], (f,) + (1,) * jnp.ndim(x))

    face = np.zeros((f, size, size), bool)
    face[:, size // 4: 3 * size // 4, size // 4: 3 * size // 4] = True
    hair = np.zeros((f, size, size), bool)
    hair[:, size // 8: size // 4, size // 4: 3 * size // 4] = True
    mouth = np.zeros((f, size, size), bool)
    mouth[:, size // 2: 5 * size // 8, 3 * size // 8: 5 * size // 8] = True
    rect = np.tile(np.array([size // 2, 5 * size // 8, 3 * size // 8,
                             5 * size // 8], np.int32), (f, 1))
    return FrameBatch(
        view_transform=tile(cam.view_transform),
        full_proj_transform=tile(cam.full_proj_transform),
        camera_center=tile(cam.camera_center),
        tanfovx=jnp.full((f,), cam.tanfovx),
        tanfovy=jnp.full((f,), cam.tanfovy),
        image=jnp.asarray(rng.integers(0, 255, (f, size, size, 3)), jnp.uint8),
        bg=jnp.asarray(rng.integers(0, 255, (f, size, size, 3)), jnp.uint8),
        face_mask=jnp.asarray(face),
        hair_mask=jnp.asarray(hair),
        mouth_mask=jnp.asarray(mouth),
        auds=jnp.asarray(rng.normal(size=(f, 8, aud_dim, 16)), jnp.float32),
        blink=jnp.asarray(rng.uniform(0, 1, (f,)), jnp.float32),
        au_exp=jnp.asarray(rng.uniform(0, 1, (f, 6)), jnp.float32),
        lips_rect=jnp.asarray(rect),
        lhalf_rect=jnp.asarray(rect),
        mouth_bound=jnp.tile(jnp.asarray([0.1, 0.9, 0.5], jnp.float32),
                             (f, 1)))
