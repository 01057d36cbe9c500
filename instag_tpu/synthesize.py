"""Fused synthesis: render the two-branch talking head to video
(reference synthesize_fuse.py).

Per frame (:34-74): face `render_motion(personalized, align=True)` + mouth
`render_motion_mouth(inference=True)` reusing the face UMF prediction,
optional mouth-alpha max-pool dilation (k=13), alpha composite over the
per-frame torso background, collect uint8 frames → mp4 at 25 fps.

TPU design: the whole per-frame pipeline (two UMFs + two PMFs + two raster
passes + composite) is ONE jitted function; frames stream through it with
device-side uint8 conversion, so the hot loop is a single dispatch per frame.
This is the ≥25 FPS 512x512 target path (BASELINE.md).
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from .config import ModelConfig
from .data.dataset import load_frames
from .models import gaussians as G
from .models.motion import (MotionNetwork, MouthMotionNetwork,
                            PersonalizedMotionNetwork)
from .ops.rasterize import RasterizeConfig
from .render import composite_fuse, dilate_alpha, render_motion, \
    render_motion_mouth
from .train.common import FrameBatch, build_frame_batch

GREEN = jnp.array([0.0, 1.0, 0.0], jnp.float32)


def make_synthesis_fn(cfg: RasterizeConfig, model_cfg: ModelConfig,
                      dilate: bool = False, personalized: bool = False,
                      variants: bool = False, _return_one: bool = False):
    """Build the jitted per-frame synthesis step.

    Returns fn(face_state, mouth_state, face_umf, mouth_umf, face_pmf,
    mouth_pmf, batch, i) -> uint8 [H, W, 3]; with ``variants`` the
    composite/face-branch/mouth-branch images come back stacked as ONE
    uint8 [3, H, W, 3] array (single host fetch per frame — the variant
    videos the reference writes unless --fast, synthesize_fuse.py:81-90).

    Pass the clip-constant model state as (device_put) ARGUMENTS, never via
    closure: closed-over arrays bake into the HLO as constants, making the
    program unique per checkpoint — the persistent compile cache then never
    hits and every synthesis run repays a ~40-100 s compile (measured on the
    tunneled v5e). Argument dispatch costs only device handles per frame.
    """
    # inference-mode nets: gather lookups (no backward -> one-hot not useful)
    face_net = MotionNetwork(model_cfg.audio_extractor, onehot=False)
    mouth_net = MouthMotionNetwork(model_cfg.audio_extractor, onehot=False)
    face_pmf_net = PersonalizedMotionNetwork("face", model_cfg.audio_extractor,
                                             onehot=False)
    mouth_pmf_net = PersonalizedMotionNetwork("mouth",
                                              model_cfg.audio_extractor,
                                              onehot=False)

    def synth_one(face_state, mouth_state, face_umf, mouth_umf, face_pmf,
                  mouth_pmf, batch: FrameBatch, i, sels=None):
        """One frame; returns (uint8 image(s), (face_sel, mouth_sel)).

        ``sels``: the previous frame's returned selections — the per-tile
        top-K sweeps are skipped and that frame's tile membership reused
        (ops.rasterize.prepare selection reuse; the --select_every serving
        knob). None recomputes selection (reference-exact)."""
        cam = batch.camera(i)
        aud = batch.auds[i]
        exp = batch.au_exp[i]
        torso_bg = batch.bg_image(i)
        face_sel, mouth_sel = sels if sels is not None else (None, None)

        fr = render_motion(
            cfg, cam, face_state,
            umf=lambda x, a, e: face_net.apply(face_umf, x, a, e),
            aud=aud, exp=exp, bg=GREEN,
            pmf=lambda x, a, e: face_pmf_net.apply(face_pmf, x, a, e),
            personalized=personalized, align=True, selection=face_sel)
        # inference reuses the face branch's motion prediction as the cache
        # (synthesize_fuse.py:55-56, gaussian_renderer/__init__.py:362-364);
        # the cached prediction was computed with the real expression, which
        # is what the reference cache holds at this point.
        mr = render_motion_mouth(
            cfg, cam, mouth_state,
            mouth_umf=lambda x, a, m: mouth_net.apply(mouth_umf, x, a, m),
            face_state=face_state,
            face_umf=None, aud=aud, bg=GREEN,
            pmf=lambda x, a: mouth_pmf_net.apply(mouth_pmf, x, a),
            personalized=personalized, align=True,
            face_motion_cache=fr.motion, selection=mouth_sel)

        alpha_m = mr.out.alpha
        dil = dilate_alpha(alpha_m, 13) if dilate else alpha_m
        image = composite_fuse(fr.out.image, fr.out.alpha, mr.out.image,
                               alpha_m, GREEN, torso_bg,
                               mouth_dilate_alpha=dil)

        def to_u8(img):
            return (jnp.clip(img, 0.0, 1.0) * 255.0
                    ).astype(jnp.uint8).transpose(1, 2, 0)

        if variants:
            img = jnp.stack([to_u8(image), to_u8(fr.out.image),
                             to_u8(mr.out.image)])
        else:
            img = to_u8(image)
        return img, (fr.selection, mr.selection), (fr.prep, mr.prep)

    @jax.jit
    def synth(face_state, mouth_state, face_umf, mouth_umf, face_pmf,
              mouth_pmf, batch: FrameBatch, i):
        return synth_one(face_state, mouth_state, face_umf, mouth_umf,
                         face_pmf, mouth_pmf, batch, i)[0]

    if _return_one:
        return synth, synth_one
    return synth


DISPATCH_CHUNK = 4


def make_synthesis_chunk_fn(cfg: RasterizeConfig, model_cfg: ModelConfig,
                            dilate: bool = False,
                            personalized: bool = False,
                            variants: bool = False,
                            chunk: int = DISPATCH_CHUNK,
                            select_every: int = 1):
    """Chunked dispatch variant of :func:`make_synthesis_fn`:
    fn(..., ivec [chunk]) renders ``chunk`` frames in ONE dispatch via an
    in-jit lax.scan and returns them stacked uint8 [chunk, ...].

    Per-dispatch overhead through the tunneled device costs ~0.7 ms/frame
    (BENCH_r03 synthesis_dispatch 209 vs 247 FPS device throughput);
    scanning 4 frames per dispatch quarters it for +3 frames (~16 ms) of
    latency — immaterial for clip synthesis and well inside a live 40 ms
    frame budget.

    ``select_every`` > 1 recomputes the per-tile splat selection only on
    every k-th frame and reuses it in between (projection, colors, alpha
    and compositing stay per-frame exact — only tile membership / order is
    up to k-1 frames stale; quality quantified in BASELINE.md, selection
    reuse). The scan runs over GROUPS of k frames with the reuse unrolled
    statically inside the body — no lax.cond, one executable. k must
    divide the dispatch chunk (both default small powers of two).
    """
    if select_every < 1:
        raise ValueError(f"select_every must be >= 1, got {select_every}")
    if chunk % select_every != 0:
        raise ValueError(f"select_every={select_every} must divide the "
                         f"dispatch chunk ({chunk})")
    _, synth_one = make_synthesis_fn(cfg, model_cfg, dilate, personalized,
                                     variants, _return_one=True)

    @jax.jit
    def synth_chunk(face_state, mouth_state, face_umf, mouth_umf, face_pmf,
                    mouth_pmf, batch: FrameBatch, ivec):
        groups = ivec.reshape(-1, select_every)

        def one(_, g):
            imgs, sels = [], None
            for j in range(select_every):
                img, sels, _ = synth_one(face_state, mouth_state, face_umf,
                                         mouth_umf, face_pmf, mouth_pmf,
                                         batch, g[j], sels if j else None)
                imgs.append(img)
            return None, jnp.stack(imgs)

        out = jax.lax.scan(one, None, groups)[1]
        return out.reshape((out.shape[0] * out.shape[1],) + out.shape[2:])

    return synth_chunk


def make_synthesis_chunk_auto_fn(cfg: RasterizeConfig,
                                 model_cfg: ModelConfig,
                                 dilate: bool = False,
                                 personalized: bool = False,
                                 variants: bool = False,
                                 chunk: int = DISPATCH_CHUNK,
                                 thresh_px: float = 4.0):
    """STALENESS-GUARDED selection reuse — the default-safe serving mode
    (--select_auto; VERDICT r4 item 4).

    Unlike the fixed-cadence ``select_every`` (which has no detector for a
    fast head turn between refreshes), every frame measures the maximum
    projected splat displacement since the last selection refresh (px/py
    of splats visible at BOTH times — computed by the projection the frame
    pays for anyway) and, when it crosses ``thresh_px`` (default 4 px =
    tile/4 at the 16-px tile), a ``lax.cond`` rebuilds fresh tile lists
    from the current projection *before this frame composites* — the
    decision sits between projection and compositing
    (``ops.rasterize.prepare`` selection-callable), so a refresh applies
    to the SAME frame that detected it, with zero lag. Worst-case
    staleness is therefore bounded by thresh_px of projected motion
    regardless of how violently the head moves: a 125°/s whip simply
    refreshes every frame (paying per-frame-selection cost, never
    per-frame-selection error). Each branch (face / mouth) carries its
    own reference and refreshes independently. Quantified under an
    adversarial fast-head-turn sweep in scripts/quantify_select_reuse.py
    (BASELINE.md "selection auto reuse").

    Returns (boot, step):
      boot(model_args..., batch, ivec)        -> (imgs, carry)
      step(model_args..., batch, ivec, carry) -> (imgs, carry)
    ``boot`` renders the first frame with fresh selection to seed the
    carry; ``step`` chains carries across dispatches. The carry also
    counts per-branch refreshes (``carry[-1]``, [2] int32) so callers can
    report the realized refresh rate.
    """
    from .ops.rasterize import tile_select

    _, synth_one = make_synthesis_fn(cfg, model_cfg, dilate, personalized,
                                     variants, _return_one=True)

    def _chooser(sel_i, sel_v, refx, refy, refv, log: list):
        """Selection callable for prepare(): same-frame guarded refresh."""
        def choose(proj, px, py):
            d = jnp.maximum(jnp.abs(px - refx), jnp.abs(py - refy))
            both = proj.visible & refv
            stale = jnp.max(jnp.where(both, d, 0.0))
            refresh = stale > thresh_px
            ids, valid = jax.lax.cond(
                refresh,
                lambda: tile_select(cfg, proj),
                lambda: (sel_i, sel_v))
            log.append((refresh, ids, valid,
                        jnp.where(refresh, px, refx),
                        jnp.where(refresh, py, refy),
                        jnp.where(refresh, proj.visible, refv)))
            return ids, valid
        return choose

    def body(carry, i, *margs):
        fsel_i, fsel_v, msel_i, msel_v, fx, fy, fv, mx, my, mv, nref = carry
        flog, mlog = [], []
        img, _, _ = synth_one(
            *margs, i, (_chooser(fsel_i, fsel_v, fx, fy, fv, flog),
                        _chooser(msel_i, msel_v, mx, my, mv, mlog)))
        (fref, fi, fva, fx2, fy2, fv2), = flog
        (mref, mi, mva, mx2, my2, mv2), = mlog
        new = (fi, fva, mi, mva, fx2, fy2, fv2, mx2, my2, mv2,
               nref + jnp.stack([fref, mref]).astype(jnp.int32))
        return new, img

    @jax.jit
    def step(face_state, mouth_state, face_umf, mouth_umf, face_pmf,
             mouth_pmf, batch: FrameBatch, ivec, carry):
        margs = (face_state, mouth_state, face_umf, mouth_umf, face_pmf,
                 mouth_pmf, batch)
        carry, imgs = jax.lax.scan(lambda c, i: body(c, i, *margs),
                                   carry, ivec)
        return imgs, carry

    @jax.jit
    def boot(face_state, mouth_state, face_umf, mouth_umf, face_pmf,
             mouth_pmf, batch: FrameBatch, ivec):
        margs = (face_state, mouth_state, face_umf, mouth_umf, face_pmf,
                 mouth_pmf, batch)
        img0, (fsel, msel), (fprep, mprep) = synth_one(*margs, ivec[0], None)
        carry = fsel + msel + (fprep.px, fprep.py, fprep.proj.visible,
                               mprep.px, mprep.py, mprep.proj.visible) \
            + (jnp.ones((2,), jnp.int32),)
        carry, imgs = jax.lax.scan(lambda c, i: body(c, i, *margs),
                                   carry, ivec[1:])
        return jnp.concatenate([img0[None], imgs], 0), carry

    return boot, step


def export_deformed_plys(cfg: RasterizeConfig, model_cfg: ModelConfig,
                         fuse_bundle: dict, batch: FrameBatch, out_dir: str,
                         n_frames: int = 11, personalized: bool = False):
    """Dump the first ``n_frames`` deformed face clouds as PLYs
    (reference synthesize_fuse.py:61-63 save_deformed_ply)."""
    from .io.checkpoints import save_gaussian_ply

    face_net = MotionNetwork(model_cfg.audio_extractor, onehot=False)
    face_pmf_net = PersonalizedMotionNetwork("face", model_cfg.audio_extractor,
                                             onehot=False)
    face_state: G.GaussianState = fuse_bundle["face_state"]
    nf = min(n_frames, batch.num_frames)

    # weights/audio ride as arguments (cache-keyed on shapes, not baked as
    # per-checkpoint HLO constants — see make_synthesis_fn)
    @jax.jit
    def deformed_all(xyz0, pmf_params, umf_params, auds, exps):
        def one(aud, exp):
            p = face_pmf_net.apply(pmf_params, xyz0, aud, exp)
            xyz = xyz0 + p["p_xyz"]
            preds = face_net.apply(umf_params, xyz, aud, exp)
            d_xyz = preds["d_xyz"]
            if personalized:
                d_xyz = d_xyz + p["d_xyz"]
            return xyz0 + d_xyz * p["p_scale"]
        return jax.vmap(one)(auds, exps)

    # all frames in one program + ONE host fetch (the per-frame fetch of a
    # full padded state is ~30 MB of tunnel traffic each)
    all_xyz, host_state = jax.device_get(
        (deformed_all(face_state.params.xyz, fuse_bundle["face_pmf_params"],
                      fuse_bundle["face_umf_params"], batch.auds[:nf],
                      batch.au_exp[:nf]), face_state))
    for i in range(nf):
        st = host_state.replace(
            params=host_state.params.replace(xyz=all_xyz[i]))
        save_gaussian_ply(os.path.join(out_dir, f"deformed_{i}.ply"), st)


def synthesize(model_cfg: ModelConfig, fuse_bundle: dict,
               split: str = "val", audio_file: str = "",
               dilate: bool = False, personalized: bool = False,
               out_path: str | None = None, fps: int = 25,
               max_frames: int | None = None, dump_plys: int = 0,
               ply_dir: str = "", fast: bool = True,
               select_every: int = 1, select_auto: float = 0.0):
    """Render a full clip; returns (frames [T,H,W,3] uint8, fps achieved).

    With ``fast=False`` (the reference default, synthesize_fuse.py:81-90)
    the face-branch/mouth-branch variant videos are written next to
    ``out_path`` (out_face.mp4 / out_mouth.mp4) plus the ground-truth clip
    (gt.mp4) — the pair metrics.py consumes.
    """
    records = load_frames(model_cfg.source_path, split,
                          model_cfg.audio_extractor, -1,
                          audio_file=audio_file)
    if max_frames:
        records = records[:max_frames]
    batch = build_frame_batch(records)
    h, w = records[0].height, records[0].width
    cfg = RasterizeConfig(h, w, max_per_tile=model_cfg.max_per_tile)

    variants = (not fast) and out_path is not None
    if select_auto > 0 and select_every > 1:
        raise ValueError("--select_auto and --select_every are mutually "
                         "exclusive serving modes")
    if select_auto > 0:
        boot_fn, step_fn = make_synthesis_chunk_auto_fn(
            cfg, model_cfg, dilate, personalized, variants=variants,
            thresh_px=select_auto)
        synth_full = None
    else:
        synth_full = make_synthesis_chunk_fn(cfg, model_cfg, dilate,
                                             personalized,
                                             variants=variants,
                                             select_every=select_every)

    if dump_plys:
        export_deformed_plys(cfg, model_cfg, fuse_bundle, batch,
                             ply_dir or os.path.dirname(out_path or "."),
                             n_frames=dump_plys, personalized=personalized)

    # model state and frame batch ride as jit ARGUMENTS (device_put once),
    # NOT closure constants: baked-in constants make the HLO unique per
    # trained checkpoint, so the persistent compile cache can never hit and
    # every synthesis run pays a full ~40-100 s recompile of the fused
    # program. As arguments the executable is keyed on shapes only (cache
    # hits across runs/models) and per-frame dispatch carries device
    # handles, not data.
    clip_args = jax.device_put((
        fuse_bundle["face_state"], fuse_bundle["mouth_state"],
        fuse_bundle["face_umf_params"], fuse_bundle["mouth_umf_params"],
        fuse_bundle["face_pmf_params"], fuse_bundle["mouth_pmf_params"],
        batch))

    _carry = None

    def synth(ivec, first):
        nonlocal _carry
        iv = jnp.asarray(ivec, jnp.int32)
        if select_auto <= 0:
            return synth_full(*clip_args, iv)
        if first:
            imgs, _carry = boot_fn(*clip_args, iv)
        else:
            imgs, _carry = step_fn(*clip_args, iv, _carry)
        return imgs

    # chunked dispatch (DISPATCH_CHUNK frames per RPC — see
    # make_synthesis_chunk_fn), dispatching ahead and fetching in
    # half-window batches: when the dispatch queue fills, the OLDER half
    # fetches as ONE jax.device_get (one RPC round trip per window//2
    # chunks) while the newer half keeps the device busy through the
    # transfer. In --select_auto mode the selection carry chains across
    # dispatches as device handles (no host sync).
    nf = batch.num_frames
    idx_all = np.minimum(np.arange(-(-nf // DISPATCH_CHUNK)
                                   * DISPATCH_CHUNK), nf - 1)
    chunks = idx_all.reshape(-1, DISPATCH_CHUNK)
    frames = []
    np.asarray(synth(chunks[0], True))   # compile (boot)
    if select_auto > 0 and len(chunks) > 1:
        np.asarray(synth(chunks[1], False))  # compile the steady-state step
    _carry = None
    t0 = time.time()
    window = 16                          # pending chunks (= 64 frames)
    pending = []
    for ci, ch in enumerate(chunks):
        pending.append(synth(ch, ci == 0))
        if len(pending) >= window:
            frames.extend(jax.device_get(pending[:window // 2]))
            pending = pending[window // 2:]
    frames.extend(jax.device_get(pending))
    dt = time.time() - t0
    achieved_fps = nf / max(dt, 1e-9)
    if select_auto > 0 and _carry is not None:
        nf_ref, nm_ref = (int(x) for x in jax.device_get(_carry[-1]))
        print(f"[synthesize] select_auto({select_auto:g}px): "
              f"face {nf_ref}/{len(idx_all)}, mouth {nm_ref}/{len(idx_all)} "
              f"selection refreshes")

    stacked = np.concatenate(frames, axis=0)[:nf]
    if variants:
        video = stacked[:, 0]
        base = os.path.dirname(out_path) or "."
        write_video(os.path.join(base, "out_face.mp4"), stacked[:, 1], fps)
        write_video(os.path.join(base, "out_mouth.mp4"), stacked[:, 2], fps)
        # ground truth straight from the host records (no device fetch)
        gt = np.stack([r.image for r in records]).astype(np.uint8)
        write_video(os.path.join(base, "gt.mp4"), gt, fps)
    else:
        video = stacked
    if out_path:
        write_video(out_path, video, fps)
    return video, achieved_fps


def write_video(out_path: str, video: np.ndarray, fps: int = 25) -> None:
    """Write [T,H,W,3] uint8 frames to mp4. Prefers OpenCV (this image has
    no ffmpeg); falls back to an .npz frame dump next to the target path."""
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    try:
        import cv2
        h, w = video.shape[1:3]
        writer = cv2.VideoWriter(out_path,
                                 cv2.VideoWriter_fourcc(*"mp4v"),
                                 fps, (w, h))
        ok = writer.isOpened()
        if ok:
            for frame in video:
                writer.write(frame[:, :, ::-1])  # RGB -> BGR
        writer.release()
        if ok:
            return
    except Exception:
        pass
    np.savez_compressed(out_path + ".frames.npz", video=video, fps=fps)
