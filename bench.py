"""Benchmark: 512x512 fused talking-head synthesis FPS on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

The headline config matches BASELINE.md's target — full two-branch synthesis
(face UMF+PMF, mouth UMF+PMF conditioned on face motion, two rasterizations,
composite) at 512x512 on an adapted-model-scale cloud (30k face + 10k mouth
splats); baseline is the 25 FPS real-time bar on 1x TPU v5e.

Extra sub-benchmarks (hash+SH encode, static render, rasterizer fwd+bwd) are
reported on stderr for tracking; the driver records only the JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from instag_tpu.bench_utils import (synthetic_camera,
                                        synthetic_motion_params,
                                        synthetic_state)
    from instag_tpu.ops.rasterize import RasterizeConfig, rasterize
    from instag_tpu.render import composite_fuse, render_motion, \
        render_motion_mouth

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    size = 512
    cfg = RasterizeConfig(size, size, max_per_tile=256, tile_chunk=32)
    nets = synthetic_motion_params()
    face_state = synthetic_state(30000, 32768, seed=0, scale=0.004)
    mouth_state = synthetic_state(10000, 16384, seed=1, spread=0.05,
                                  scale=0.004)
    cam = synthetic_camera(size)
    green = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    torso_bg = jnp.zeros((3, size, size), jnp.float32)

    face_net, mouth_net = nets["face_net"], nets["mouth_net"]
    face_pmf_net, mouth_pmf_net = nets["face_pmf_net"], nets["mouth_pmf_net"]

    @jax.jit
    def synth(aud, exp):
        fr = render_motion(
            cfg, cam, face_state,
            umf=lambda x, a, e: face_net.apply(nets["face_umf_params"], x, a, e),
            aud=aud, exp=exp, bg=green,
            pmf=lambda x, a, e: face_pmf_net.apply(nets["face_pmf_params"], x, a, e),
            personalized=True, align=True)
        mr = render_motion_mouth(
            cfg, cam, mouth_state,
            mouth_umf=lambda x, a, m: mouth_net.apply(nets["mouth_umf_params"], x, a, m),
            face_state=face_state, face_umf=None, aud=aud, bg=green,
            pmf=lambda x, a: mouth_pmf_net.apply(nets["mouth_pmf_params"], x, a),
            personalized=True, align=True, face_motion_cache=fr.motion)
        img = composite_fuse(fr.out.image, fr.out.alpha, mr.out.image,
                             mr.out.alpha, green, torso_bg)
        return (jnp.clip(img, 0, 1) * 255).astype(jnp.uint8)

    aud, exp = nets["aud"], nets["exp"]
    t0 = time.time()
    synth(aud, exp).block_until_ready()
    print(f"# compile: {time.time()-t0:.1f}s", file=sys.stderr)

    # steady-state synthesis FPS (new audio every frame, like real playback)
    n_frames = 50
    auds = [jnp.asarray(np.random.default_rng(i).normal(
        size=(8, 29, 16)).astype(np.float32)) for i in range(8)]
    t0 = time.time()
    for i in range(n_frames):
        out = synth(auds[i % 8], exp)
    out.block_until_ready()
    dt = time.time() - t0
    fps = n_frames / dt
    print(f"# synthesis: {fps:.2f} FPS ({1000*dt/n_frames:.1f} ms/frame)",
          file=sys.stderr)

    # sub-benchmark: rasterizer fwd+bwd ms/frame (training-path cost)
    @jax.jit
    def raster_grad(params):
        st = face_state.replace(params=params)
        out = rasterize(cfg, st.params.xyz, st.get_opacity(),
                        st.get_scaling(), st.get_rotation(),
                        cam.view_transform, cam.full_proj_transform,
                        cam.camera_center, cam.tanfovx, cam.tanfovy, green,
                        shs=st.get_features(), sh_degree=1, active=st.alive)
        return jnp.mean(out.image ** 2)

    # scan the grad step so per-dispatch overhead (large pytree args over
    # the device tunnel) doesn't pollute the measurement
    def g_body(params, _):
        g = jax.grad(raster_grad)(params)
        return jax.tree.map(lambda p, d: p - 1e-9 * d, params, g), None

    g10 = jax.jit(lambda p: jax.lax.scan(g_body, p, None, length=10)[0])
    r = g10(face_state.params)  # compile
    jax.tree.leaves(r)[0].block_until_ready()
    t0 = time.time()
    r = g10(face_state.params)
    jax.tree.leaves(r)[0].block_until_ready()
    ms_fwdbwd = (time.time() - t0) / 10 * 1000
    print(f"# rasterizer fwd+bwd: {ms_fwdbwd:.1f} ms/frame", file=sys.stderr)

    # BASELINE.md config 2: hash-grid + SH encoding over 100k query points
    from instag_tpu.ops.hashgrid import (hashgrid_encode, init_hashgrid,
                                         triplane_configs)
    from instag_tpu.utils.sh import sh_basis
    hcfg = triplane_configs(16, 256 * 0.15)
    emb = init_hashgrid(jax.random.key(0), hcfg)
    pts = jax.random.uniform(jax.random.key(1), (100_000, 2),
                             minval=-0.15, maxval=0.15)
    dirs = jax.random.normal(jax.random.key(2), (100_000, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    def enc_body(c, _):
        out = hashgrid_encode(hcfg, emb, pts + 1e-6 * c, 0.15)
        basis = sh_basis(3, dirs + 0.0 * c)
        return c + out.sum() + basis.sum(), None

    enc10 = jax.jit(lambda: jax.lax.scan(enc_body, 0.0, None, length=10)[0])
    enc10().block_until_ready()
    t0 = time.time()
    enc10().block_until_ready()
    print(f"# hash+SH encode 100k pts: {(time.time()-t0)/10*1000:.2f} ms",
          file=sys.stderr)

    # BASELINE.md config 3: static 30k-splat render at 256x256
    cfg256 = RasterizeConfig(256, 256, max_per_tile=256, tile_chunk=16)

    @jax.jit
    def static256(xyz):
        return rasterize(cfg256, xyz, face_state.get_opacity(),
                         face_state.get_scaling(), face_state.get_rotation(),
                         cam.view_transform, cam.full_proj_transform,
                         cam.camera_center, cam.tanfovx, cam.tanfovy, green,
                         shs=face_state.get_features(), sh_degree=1,
                         active=face_state.alive).image

    x = face_state.params.xyz
    static256(x).block_until_ready()
    t0 = time.time()
    for i in range(20):
        r = static256(x)
    r.block_until_ready()
    print(f"# static render 30k @256: {(time.time()-t0)/20*1000:.2f} ms",
          file=sys.stderr)

    print(json.dumps({
        "metric": "fused_synthesis_512px_fps",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 25.0, 3),
    }))


if __name__ == "__main__":
    main()
