"""On-chip component timing for the rasterizer + motion path.

Times each stage of a synthesis frame / training step in isolation (scanned
in-jit loops, so dispatch overhead through the device tunnel doesn't pollute
sub-millisecond stages):

  projection            project_gaussians fwd
  tile_select           per-tile front-K selection (the [chunk, N] sweeps)
  gather                feats [F, N] -> [F, T, K] per-tile gather
  composite_fwd         Pallas fused composite forward
  raster_fwd            full rasterize() forward
  raster_fwdbwd         full rasterize() + grads to all splat params
  select_grad           tile_select inside a grad graph (indices: no grads,
                        but the gather's scatter-add transpose runs)
  motion_fwd            face UMF+PMF forward (30k pts)
  motion_fwdbwd         same + grads

Usage: python scripts/profile_components.py [--size 512] [--n 30000]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, *args, reps=20, scan=True):
    """Compile fn scanned ``reps`` times in one program; return ms per call
    (fetch-forced, RPC-floor-subtracted — see instag_tpu.utils.timing)."""
    from instag_tpu.utils.timing import time_scanned
    return time_scanned(fn, *args, reps=reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--n", type=int, default=30000)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from instag_tpu.config import enable_persistent_compile_cache
    from instag_tpu.bench_utils import (synthetic_camera,
                                        synthetic_motion_params,
                                        synthetic_state)
    from instag_tpu.ops import rasterize as R

    enable_persistent_compile_cache()
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    size, N = args.size, args.n
    cfg = R.RasterizeConfig(size, size, max_per_tile=256, tile_chunk=32)
    state = synthetic_state(N, -(-N // 8192) * 8192, seed=0, scale=0.004)
    cam = synthetic_camera(size)
    green = jnp.array([0.0, 1.0, 0.0], jnp.float32)

    xyz = state.params.xyz
    opac = state.get_opacity()
    scales = state.get_scaling()
    rots = state.get_rotation()
    shs = state.get_features()
    alive = state.alive

    def proj_fn(xyz):
        p = R.project_gaussians(cfg, xyz, scales, rots, cam.view_transform,
                                cam.full_proj_transform, cam.camera_center,
                                cam.tanfovx, cam.tanfovy, alive)
        return p.px + p.py + p.depth

    ms = timed(proj_fn, xyz, reps=args.reps)
    print(f"projection            {ms:7.3f} ms")

    proj = jax.jit(lambda x: R.project_gaussians(
        cfg, x, scales, rots, cam.view_transform, cam.full_proj_transform,
        cam.camera_center, cam.tanfovx, cam.tanfovy, alive))(xyz)

    def select_fn(px):
        p = proj._replace(px=px)
        ids, valid = R._tile_select(cfg, p)
        return ids.astype(jnp.float32) + valid

    ms = timed(select_fn, proj.px, reps=args.reps)
    print(f"tile_select           {ms:7.3f} ms")

    ids, valid = jax.jit(lambda p: R._tile_select(cfg, p))(proj)

    feats = jnp.stack([proj.px, proj.py] + [proj.conic[:, i] for i in range(3)]
                      + [opac.reshape(-1)] + [shs[:, 0, i] for i in range(3)]
                      + [proj.depth] + [proj.normal_cam[:, i] for i in range(3)]
                      + [jnp.ones_like(proj.px)], 0)

    def gather_fn(f):
        return f[:, ids]

    ms = timed(gather_fn, feats, reps=args.reps)
    print(f"gather [F,T,K]        {ms:7.3f} ms")

    def gather_grad_fn(f):
        return jax.grad(lambda ff: jnp.sum(ff[:, ids] ** 2))(f)

    ms = timed(gather_grad_fn, feats, reps=args.reps)
    print(f"gather + scatter bwd  {ms:7.3f} ms")

    def comp_fn(px):
        p = proj._replace(px=px)
        out = R._composite_tiles(cfg, p.px, p.py, p, opac.reshape(-1),
                                 shs[:, 0], jnp.ones_like(p.px), ids, valid,
                                 green)
        return out.image

    ms = timed(comp_fn, proj.px, reps=args.reps)
    print(f"composite fwd         {ms:7.3f} ms  (select reused)")

    def comp_grad_fn(px):
        return jax.grad(lambda x: jnp.mean(comp_fn(x) ** 2))(px)

    ms = timed(comp_grad_fn, proj.px, reps=args.reps)
    print(f"composite fwd+bwd     {ms:7.3f} ms  (select reused)")

    def raster_fn(xyz):
        out = R.rasterize(cfg, xyz, opac, scales, rots, cam.view_transform,
                          cam.full_proj_transform, cam.camera_center,
                          cam.tanfovx, cam.tanfovy, green, shs=shs,
                          sh_degree=1, active=alive)
        return out.image

    ms = timed(raster_fn, xyz, reps=args.reps)
    print(f"raster fwd            {ms:7.3f} ms")

    def raster_grad_fn(xyz):
        return jax.grad(lambda x: jnp.mean(raster_fn(x) ** 2))(xyz)

    ms = timed(raster_grad_fn, xyz, reps=args.reps)
    print(f"raster fwd+bwd        {ms:7.3f} ms")

    # ---- backward decomposition (round-4: where the fwd+bwd ms go) ----
    def proj_grad_fn(x):
        return jax.grad(lambda xx: jnp.sum(proj_fn(xx)))(x)

    ms = timed(proj_grad_fn, xyz, reps=args.reps)
    print(f"projection fwd+bwd    {ms:7.3f} ms")

    def sh_fn(x):
        return jnp.sum(R.sh_colors(x, cam.camera_center, shs, 1))

    ms = timed(lambda x: jax.grad(sh_fn)(x), xyz, reps=args.reps)
    print(f"sh_colors fwd+bwd     {ms:7.3f} ms")

    gcot = jnp.ones((feats.shape[0],) + tuple(ids.shape), jnp.float32)

    def scatter_vjp_fn(f, gc):
        # gc is a varying arg: a constant cotangent would make the whole
        # backward loop-invariant and XLA would hoist it out of the scan
        _, vjp = jax.vjp(lambda ff: R._tile_gather(ff, ids, valid), f)
        return vjp(gc)[0]

    ms = timed(scatter_vjp_fn, feats, gcot, reps=args.reps)
    print(f"tile_gather VJP       {ms:7.3f} ms  (shipping staircase)")

    def comp_grad_all_fn(px):
        # grads to every composite input (what the training step pays),
        # not just px
        def lose(px, py, op, cols):
            p = proj._replace(px=px, py=py)
            out = R._composite_tiles(cfg, p.px, p.py, p, op, cols,
                                     jnp.ones_like(p.px), ids, valid, green)
            return jnp.mean(out.image ** 2)
        gs = jax.grad(lose, argnums=(0, 1, 2, 3))(
            px, proj.py, opac.reshape(-1), shs[:, 0])
        return sum(jnp.sum(g) for g in gs)

    ms = timed(comp_grad_all_fn, proj.px, reps=args.reps)
    print(f"composite fwd+bwd(all){ms:7.3f} ms  (select reused)")

    # motion networks at adaptation scale
    nets = synthetic_motion_params(onehot=True)
    face_net, face_pmf = nets["face_net"], nets["face_pmf_net"]
    aud, exp = nets["aud"], nets["exp"]
    x30 = xyz

    def motion_fn(params):
        d = face_net.apply(params, x30, aud, exp)
        p = face_pmf.apply(nets["face_pmf_params"], x30, aud, exp)
        return d["d_xyz"] + p["d_xyz"]

    ms = timed(motion_fn, nets["face_umf_params"], reps=args.reps)
    print(f"motion fwd (UMF+PMF)  {ms:7.3f} ms")

    def motion_grad_fn(params):
        return jax.grad(lambda p: jnp.sum(motion_fn(p) ** 2))(params)

    ms = timed(motion_grad_fn, nets["face_umf_params"], reps=args.reps)
    print(f"motion fwd+bwd        {ms:7.3f} ms")


if __name__ == "__main__":
    main()
