"""Quantify the --select_every serving knob (selection temporal reuse).

The per-tile top-K splat selection (`ops.rasterize._tile_select`) is the
single most expensive stage of the fused synthesis forward (the [T, N] key
sweep). Talking-head synthesis is temporally coherent — the head moves
millimetres between 40 ms frames — so `--select_every k` recomputes the
selection only on every k-th frame and reuses the stale tile membership in
between (projection / colors / alpha / compositing stay per-frame exact;
`ops.rasterize.prepare(selection=...)`).

This script measures, at the BASELINE.md bench shape (512², 30k face +
10k mouth splats, fused two-branch synthesis):

  1. QUALITY — PSNR of each stale-selection frame vs the same frame with
     fresh per-frame selection, under per-frame audio AND a per-frame head
     pose drift (rotation ~0.2°/frame + mm-scale translation, the
     measured-at-25-fps scale of real talking-video head motion), for
     k ∈ {2, 4}, including the worst (most-stale) frame.
  2. SPEED — honest fetch-forced dispatch FPS of the production
     `make_synthesis_chunk_fn` at select_every ∈ {1, 2, 4}.

Results recorded in BASELINE.md ("selection reuse").
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def drifted_batch(size: int, n_frames: int, rot_deg_per_frame: float = 0.2,
                  trans_mm: float = 1.0):
    """A FrameBatch whose camera drifts per frame like a real talking head
    (slow rotation + mm translation at a ~3.3 unit view distance where the
    head spans ~0.3 units ≈ 20 cm → 1 unit ≈ 60 mm)."""
    import jax.numpy as jnp

    from instag_tpu.bench_utils import synthetic_frame_batch
    from instag_tpu.utils.graphics import projection_matrix, world_to_view

    batch = synthetic_frame_batch(size, n_frames=n_frames)
    proj = projection_matrix(0.01, 100.0, 0.5, 0.5)
    vts, fps_, ccs = [], [], []
    for i in range(n_frames):
        th = np.deg2rad(rot_deg_per_frame) * i
        R = np.array([[np.cos(th), 0, np.sin(th)],
                      [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]], np.float32)
        t = np.array([trans_mm / 60.0 * i * 0.2, 0.0, 10.0 / 3.0], np.float32)
        w2c = world_to_view(R, t)
        vts.append(w2c.T)
        fps_.append((proj @ w2c).T)
        ccs.append(np.linalg.inv(w2c)[:3, 3].astype(np.float32))
    return batch.replace(
        view_transform=jnp.asarray(np.stack(vts)),
        full_proj_transform=jnp.asarray(np.stack(fps_)),
        camera_center=jnp.asarray(np.stack(ccs)))


def turn_batch(size: int, n_frames: int, turn_start: int = 8,
               turn_deg_per_frame: float = 5.0):
    """ADVERSARIAL trajectory: calm drift, then a fast head turn
    (5 deg/frame = 125 deg/s at 25 fps — a violent whip by talking-video
    standards) with a simultaneous lateral slide. The worst case for
    fixed-cadence selection reuse and the validation target for the
    staleness guard (--select_auto)."""
    import jax.numpy as jnp

    from instag_tpu.bench_utils import synthetic_frame_batch
    from instag_tpu.utils.graphics import projection_matrix, world_to_view

    batch = synthetic_frame_batch(size, n_frames=n_frames)
    proj = projection_matrix(0.01, 100.0, 0.5, 0.5)
    vts, fps_, ccs = [], [], []
    for i in range(n_frames):
        turn = max(0, i - turn_start)
        th = np.deg2rad(0.2 * min(i, turn_start)
                        + turn_deg_per_frame * turn)
        R = np.array([[np.cos(th), 0, np.sin(th)],
                      [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]], np.float32)
        t = np.array([0.02 * turn, 0.01 * turn, 10.0 / 3.0], np.float32)
        w2c = world_to_view(R, t)
        vts.append(w2c.T)
        fps_.append((proj @ w2c).T)
        ccs.append(np.linalg.inv(w2c)[:3, 3].astype(np.float32))
    return batch.replace(
        view_transform=jnp.asarray(np.stack(vts)),
        full_proj_transform=jnp.asarray(np.stack(fps_)),
        camera_center=jnp.asarray(np.stack(ccs)))


def main():
    import jax
    import jax.numpy as jnp

    from instag_tpu.bench_utils import (synthetic_motion_params,
                                        synthetic_state)
    from instag_tpu.config import ModelConfig, \
        enable_persistent_compile_cache
    from instag_tpu.ops.rasterize import RasterizeConfig
    from instag_tpu.synthesize import (make_synthesis_chunk_auto_fn,
                                       make_synthesis_chunk_fn)
    from instag_tpu.utils.losses import psnr
    from instag_tpu.utils.timing import fetch, rpc_floor

    enable_persistent_compile_cache()
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    size = 512
    cfg = RasterizeConfig(size, size, max_per_tile=256, tile_chunk=32)
    mc = ModelConfig(audio_extractor="deepspeech")
    nets = synthetic_motion_params()
    face_state = synthetic_state(30000, 32768, seed=0, scale=0.004)
    mouth_state = synthetic_state(10000, 16384, seed=1, spread=0.05,
                                  scale=0.004)

    chunk = 8
    batch = drifted_batch(size, n_frames=chunk)
    margs = (face_state, mouth_state, nets["face_umf_params"],
             nets["mouth_umf_params"], nets["face_pmf_params"],
             nets["mouth_pmf_params"], batch)
    ivec = jnp.arange(chunk, dtype=jnp.int32)

    # ---- quality ----------------------------------------------------------
    fns = {k: make_synthesis_chunk_fn(cfg, mc, chunk=chunk, select_every=k)
           for k in (1, 2, 4)}
    ref = np.asarray(fns[1](*margs, ivec)).astype(np.float32) / 255.0
    print("# quality (stale-selection frames vs fresh, drifting head pose "
          "0.2 deg/frame):", file=sys.stderr)
    quality = {}
    for k in (2, 4):
        out = np.asarray(fns[k](*margs, ivec)).astype(np.float32) / 255.0
        stale = [i for i in range(chunk) if i % k]
        ps = [float(psnr(jnp.asarray(out[i]), jnp.asarray(ref[i])))
              for i in stale]
        quality[k] = (float(np.mean(ps)), float(np.min(ps)))
        print(f"#   k={k}: mean {np.mean(ps):.1f} dB | worst (age "
              f"{k-1} frames) {np.min(ps):.1f} dB", file=sys.stderr)

    # ---- speed ------------------------------------------------------------
    rpc = rpc_floor()
    print(f"# rpc floor: {rpc:.1f} ms", file=sys.stderr)
    n_disp = 16
    csum = jax.jit(
        lambda o: jnp.sum(o[:, ::64, ::64, :], dtype=jnp.float32))
    for k in (1, 2, 4):
        f = fns[k]
        # chain dispatches through a device checksum (auds perturbed by the
        # previous dispatch's output) so the tunnel can't serve
        # value-identical dispatches from cache
        chk = csum(f(*margs, ivec))
        fetch(chk)                                                 # warm
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(n_disp):
                b2 = batch.replace(auds=batch.auds + chk * 1e-30)
                chk = csum(f(*margs[:6], b2, ivec))
            fetch(chk)
            best = min(best, time.time() - t0 - rpc / 1e3)
        fps = n_disp * chunk / best
        msg = f"# select_every={k}: {fps:.1f} FPS ({1000*best/(n_disp*chunk):.2f} ms/frame)"
        if k in quality:
            msg += (f" | stale-frame PSNR mean {quality[k][0]:.1f} / "
                    f"worst {quality[k][1]:.1f} dB")
        print(msg, file=sys.stderr)

    # ---- select_auto: adversarial fast-head-turn sweep --------------------
    # quality: run the guarded mode over a calm-then-whip trajectory and
    # compare EVERY frame against per-frame-exact selection; report the
    # worst frame and the realized refresh rate. Fixed-cadence k=4 runs the
    # same trajectory for contrast.
    n_turn = 32
    tb = turn_batch(size, n_frames=n_turn)
    targs = (face_state, mouth_state, nets["face_umf_params"],
             nets["mouth_umf_params"], nets["face_pmf_params"],
             nets["mouth_pmf_params"], tb)
    tvec = jnp.arange(n_turn, dtype=jnp.int32)
    exact_fn = make_synthesis_chunk_fn(cfg, mc, chunk=n_turn, select_every=1)
    exact_t = np.asarray(exact_fn(*targs, tvec)).astype(np.float32) / 255.0
    se4_fn = make_synthesis_chunk_fn(cfg, mc, chunk=n_turn, select_every=4)
    se4_t = np.asarray(se4_fn(*targs, tvec)).astype(np.float32) / 255.0

    for thresh in (2.0, 4.0):
        boot, step = make_synthesis_chunk_auto_fn(cfg, mc, chunk=n_turn,
                                                  thresh_px=thresh)
        auto_imgs, carry = boot(*targs, tvec)
        auto_t = np.asarray(auto_imgs).astype(np.float32) / 255.0
        n_ref = int(jax.device_get(carry[-1]).max())
        ps = [float(psnr(jnp.asarray(auto_t[i]), jnp.asarray(exact_t[i])))
              for i in range(n_turn)]
        ps4 = [float(psnr(jnp.asarray(se4_t[i]), jnp.asarray(exact_t[i])))
               for i in range(n_turn)]
        print(f"# select_auto({thresh:g}px) fast-turn sweep: worst "
              f"{min(ps):.1f} dB / mean {np.mean(ps):.1f} dB | refreshes "
              f"{n_ref}/{n_turn} | fixed k=4 worst {min(ps4):.1f} dB",
              file=sys.stderr)

    # speed: guarded mode on the CALM drifting trajectory (the serving
    # regime — refreshes should be rare), dispatch-chained like above
    boot, step = make_synthesis_chunk_auto_fn(cfg, mc, chunk=chunk,
                                              thresh_px=4.0)
    imgs, carry0 = boot(*margs, ivec)
    fetch(csum(imgs))
    imgs, c = step(*margs, ivec, carry0)
    fetch(csum(imgs))                                              # warm
    best = 1e9
    n_ref_speed = 0
    for _ in range(3):
        chk = jnp.float32(0)
        c = jax.tree.map(jnp.array, carry0)
        t0 = time.time()
        for _ in range(n_disp):
            b2 = batch.replace(auds=batch.auds + chk * 1e-30)
            imgs, c = step(*margs[:6], b2, ivec, c)
            chk = csum(imgs)
        fetch(chk)
        best = min(best, time.time() - t0 - rpc / 1e3)
        n_ref_speed = int(jax.device_get(c[-1]).max())
    fps = n_disp * chunk / best
    print(f"# select_auto(4px): {fps:.1f} FPS "
          f"({1000*best/(n_disp*chunk):.2f} ms/frame) | refreshes "
          f"{n_ref_speed}/{n_disp*chunk + 1} on the drifting trajectory",
          file=sys.stderr)


if __name__ == "__main__":
    main()
