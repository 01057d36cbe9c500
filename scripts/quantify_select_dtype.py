"""A/B the selection-key dtype (RasterizeConfig.select_key_dtype).

The [chunk, N] key matrix is the tile-selection sweep's dominant traffic;
bfloat16 halves it at the cost of exact-tie depth reordering (membership
and the front-most splat are preserved by the near-depth rebase —
tests/test_rasterize.py::test_select_key_dtype_bf16_rebased_matches_f32).
This script measures, at the BASELINE.md bench shape (512², 30k splats):

  * fwd and fwd+bwd wall time, f32 vs bf16 keys (fetch-forced, in-device
    loops, median of 5);
  * rendered-image PSNR of bf16-keys vs f32-keys (selection-only delta).

Run on the TPU host: python scripts/quantify_select_dtype.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from instag_tpu.bench_utils import synthetic_camera, synthetic_state
    from instag_tpu.config import enable_persistent_compile_cache
    from instag_tpu.ops.rasterize import RasterizeConfig, rasterize
    from instag_tpu.utils.timing import fetch, rpc_floor

    enable_persistent_compile_cache()
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    rpc = rpc_floor()
    print(f"# rpc floor: {rpc:.1f} ms", file=sys.stderr)

    size = 512
    state = synthetic_state(30000, 32768, seed=0, scale=0.004)
    cam = synthetic_camera(size)
    green = jnp.array([0.0, 1.0, 0.0], jnp.float32)

    def build(dtype):
        cfg = RasterizeConfig(size, size, max_per_tile=256, tile_chunk=32,
                              select_key_dtype=dtype)

        def fwd(xyz, c):
            st = state.replace(params=state.params.replace(xyz=xyz))
            out = rasterize(cfg, st.params.xyz + c * 1e-30,
                            st.get_opacity(), st.get_scaling(),
                            st.get_rotation(), cam.view_transform,
                            cam.full_proj_transform, cam.camera_center,
                            cam.tanfovx, cam.tanfovy, green,
                            shs=st.get_features(), sh_degree=1,
                            active=st.alive)
            return out.image

        def loss(xyz, c):
            return jnp.mean(fwd(xyz, c) ** 2)

        def loop(fn, n):
            def body(_, c):
                return c + fn(state.params.xyz, c) * 1e-6
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        fwd_loop = jax.jit(lambda n: loop(
            lambda x, c: jnp.sum(fwd(x, c)[:, ::64, ::64]), n))
        bwd_loop = jax.jit(lambda n: loop(
            lambda x, c: jnp.sum(jax.grad(loss)(x, c)), n))
        img = jax.jit(lambda: fwd(state.params.xyz, jnp.float32(0)))
        return fwd_loop, bwd_loop, img

    def measure(fn, n):
        fetch(fn(jnp.int32(n)))                           # warm
        ts = []
        for _ in range(5):
            t0 = time.time()
            fetch(fn(jnp.int32(n)))
            ts.append(time.time() - t0)
        med = sorted(ts)[2] * 1e3
        return max(med - rpc, 0.0) / n

    imgs = {}
    for dtype in ("float32", "bfloat16"):
        fwd_loop, bwd_loop, img = build(dtype)
        ms_f = measure(fwd_loop, 256)
        ms_b = measure(bwd_loop, 128)
        imgs[dtype] = np.asarray(img())
        print(f"# select_key_dtype={dtype}: fwd {ms_f:.3f} ms | "
              f"fwd+bwd {ms_b:.3f} ms", file=sys.stderr)

    err = ((imgs["bfloat16"].astype(np.float64)
            - imgs["float32"].astype(np.float64)) ** 2).mean()
    p = -10 * np.log10(err + 1e-12)
    print(f"# bf16-keys vs f32-keys image PSNR: {p:.1f} dB", file=sys.stderr)


if __name__ == "__main__":
    main()
