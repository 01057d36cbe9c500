"""CLI: fused synthesis to video (reference synthesize_fuse.py __main__).

    python -m instag_tpu.cli.synthesize_fuse -m output/<run> -s data/<id> \
        [--use_train] [--audio feats.npy] [--dilate] [--personalized] [--fast]
"""

from __future__ import annotations

import os
import time

from ..config import load_cfg, make_parser, parse_all
from ..io.checkpoints import load_bundle, state_from_dict
from ..synthesize import synthesize


def main(argv=None):
    parser = make_parser("Fused synthesis")
    parser.add_argument("--use_train", action="store_true")
    parser.add_argument("--dilate", action="store_true")
    parser.add_argument("--personalized", action="store_true")
    parser.add_argument("--fast", action="store_true")
    parser.add_argument("--select_every", type=int, default=1,
                        help="recompute per-tile splat selection only every "
                             "k-th frame, reusing tile membership in "
                             "between (serving optimization; 1 = "
                             "reference-exact per-frame selection; must "
                             "divide the dispatch chunk of 4). Quality "
                             "bound in BASELINE.md 'selection reuse'.")
    parser.add_argument("--select_auto", type=float, default=0.0,
                        nargs="?", const=4.0,
                        help="staleness-GUARDED selection reuse (the "
                             "default-safe serving mode): refresh the "
                             "per-tile selection whenever the max "
                             "projected splat displacement since the last "
                             "refresh exceeds this many pixels (bare flag "
                             "= 4.0 = tile/4). Mutually exclusive with "
                             "--select_every. Worst-frame quality under "
                             "an adversarial fast head turn quantified in "
                             "BASELINE.md 'selection auto reuse'.")
    parser.add_argument("--mux_audio", action="store_true",
                        help="attach the tail-aligned dataset aud.wav to "
                             "the output (reference "
                             "sync_tail_audio_to_video.ipynb); ffmpeg "
                             "remux when available, else a pure-Python "
                             "MJPEG+PCM AVI next to out.mp4")
    mc, _, _, args = parse_all(parser, argv)
    # merge persisted train-time config (reference get_combined_args)
    if os.path.exists(os.path.join(mc.model_path, "cfg_args.json")):
        saved = load_cfg(mc.model_path)
        if not mc.source_path:
            mc.source_path = saved.source_path
        mc.audio_extractor = saved.audio_extractor
        mc.max_per_tile = saved.max_per_tile

    bundle = load_bundle(os.path.join(mc.model_path, "chkpnt_fuse_latest.pkl"))
    bundle["face_state"] = state_from_dict(bundle["face_state"])
    bundle["mouth_state"] = state_from_dict(bundle["mouth_state"])

    split = "train" if args.use_train else "val"
    out = os.path.join(mc.model_path, "out.mp4")
    # reference dumps the first 11 deformed face clouds unless --fast
    # (synthesize_fuse.py:61-63)
    video, fps = synthesize(mc, bundle, split=split, audio_file=mc.audio,
                            dilate=args.dilate,
                            personalized=args.personalized, out_path=out,
                            dump_plys=0 if args.fast else 11,
                            ply_dir=os.path.join(mc.model_path,
                                                 "deformed_ply"),
                            fast=args.fast,
                            select_every=args.select_every,
                            select_auto=args.select_auto)
    print(f"wrote {out}: {video.shape[0]} frames @ {fps:.1f} FPS synthesis")

    if args.mux_audio:
        from ..io.avmux import mux_audio
        dst = mux_audio(out, video, 25.0,
                        os.path.join(mc.source_path, "aud.wav"))
        if dst:
            print(f"wrote {dst} (with audio)")


if __name__ == "__main__":
    main()
