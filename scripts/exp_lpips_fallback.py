"""Bound the random-feature LPIPS fallback (VERDICT r3 weak 2 / item 6).

This image has no egress, so the AlexNet-LPIPS weights the reference uses
(`lpipsPyTorch`, train_face.py:596-620 perceptual phase) cannot exist here
and every in-env perceptual phase runs on fixed-seed random features
(models/lpips.py fallback). This experiment bounds how much that fallback
*matters to training outcomes* by running the SAME full few-shot adaptation
(cli/adapt, identical seed/budget/scene) under four perceptual-loss arms:

    no_lpips   perceptual phases disabled outright (--no_lpips)
    rf_seed0   random-feature LPIPS, init seed 0 (the shipping default)
    rf_seed1   seed 1  }  seed-sensitivity sweep: if outcomes move less
    rf_seed2   seed 2  }  across seeds than vs no_lpips, the *structure*
                          of the multi-scale loss (not the specific random
                          projection) is what training consumes

Held-out PSNR is objective; for cross-arm comparability LPIPS is RE-scored
with seed 0 on every arm's (out.mp4, gt.mp4) pair regardless of the arm's
training-time seed.

Usage:
    python scripts/exp_lpips_fallback.py [--root /tmp/lpips_ab]
        [--size 512] [--adapt_iterations 10000] [--arms no_lpips,rf_seed0,...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = {
    "no_lpips": None,
    "rf_seed0": 0,
    "rf_seed1": 1,
    "rf_seed2": 2,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/lpips_ab")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--adapt_iterations", type=int, default=10000)
    ap.add_argument("--fuse_iterations", type=int, default=2000)
    ap.add_argument("--adapt_frames", type=int, default=250)
    ap.add_argument("--n_val", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arms", default=",".join(ARMS))
    ap.add_argument("--hard", action="store_true",
                    help="use the HARD textured identity family "
                         "(data/synthetic_hard.py) — the blob scenes have "
                         "no texture for LPIPS features to see, which "
                         "confounds the neutrality conclusion "
                         "(VERDICT r4 weak 3)")
    ap.add_argument("--scene_dir", default=None,
                    help="train on an EXISTING scene directory instead of "
                         "generating one (e.g. the flagship held-out "
                         "identity, for cross-experiment comparability)")
    args = ap.parse_args()

    if args.scene_dir:
        scene = args.scene_dir
    else:
        scene = os.path.join(args.root, "scene")
        if not os.path.exists(os.path.join(scene, "transforms_train.json")):
            if args.hard:
                from instag_tpu.data.synthetic_hard import generate_hard_scene
                generate_hard_scene(scene, n_frames=args.adapt_frames,
                                    size=args.size, n_val=args.n_val,
                                    seed=args.seed + 777)
            else:
                from instag_tpu.data.synthetic import generate_scene
                generate_scene(scene, n_frames=args.adapt_frames,
                               size=args.size, n_val=args.n_val,
                               seed=args.seed + 777,
                               variation=1.0, focal_mult=8.0)
            print("# scene generated", file=sys.stderr, flush=True)

    from instag_tpu.cli.adapt import main as adapt_main

    def run_arm(arm: str):
        rf_seed = ARMS[arm]
        out = os.path.join(args.root, f"adapt_{arm}")
        shutil.rmtree(out, ignore_errors=True)
        argv = ["--source_path", scene, "--model_path", out,
                "--init_num", "2000", "--mouth_init_num", "5000",
                "--densify_grad_threshold", "0.0005",
                "--N_views", str(args.adapt_frames),
                "--iterations", str(args.adapt_iterations),
                "--fuse_iterations", str(args.fuse_iterations),
                "--seed", str(args.seed)]
        if rf_seed is None:
            argv.append("--no_lpips")
            os.environ.pop("INSTAG_LPIPS_RF_SEED", None)
        else:
            os.environ["INSTAG_LPIPS_RF_SEED"] = str(rf_seed)
        t0 = time.time()
        adapt_main(argv)
        wall = time.time() - t0
        os.environ.pop("INSTAG_LPIPS_RF_SEED", None)

        scores = json.load(open(os.path.join(out, "metrics.json")))
        # comparable LPIPS: rescore every arm with metric seed 0
        from instag_tpu.cli.metrics import _load_video
        from instag_tpu.metrics import evaluate_frames
        pred = _load_video(os.path.join(out, "out.mp4"))
        gt = _load_video(os.path.join(out, "gt.mp4"))
        t = min(len(pred), len(gt))
        rescored = evaluate_frames(pred[:t], gt[:t])
        res = {"psnr": scores["psnr"],
               "lpips_seed0": rescored["lpips"],
               "lpips_as_trained": scores.get("lpips"),
               "lpips_real": rescored.get("lpips_real", False),
               "wall_s": round(wall, 1)}
        print(f"# arm {arm}: PSNR {res['psnr']:.3f} "
              f"LPIPS(seed0) {res['lpips_seed0']:.5f} wall {wall:.0f}s",
              file=sys.stderr, flush=True)
        return res

    summary = {"metric": "lpips_fallback_psnr_spread_db", "unit": "dB",
               "scene": ("dir:" + args.scene_dir if args.scene_dir
                         else "hard" if args.hard else "blob"),
               "size": args.size, "seed": args.seed,
               "adapt_iterations": args.adapt_iterations}
    for arm in args.arms.split(","):
        summary[arm] = run_arm(arm)
    rf = [summary[a]["psnr"] for a in summary
          if isinstance(summary.get(a), dict) and a.startswith("rf_seed")]
    if rf and "no_lpips" in summary:
        summary["rf_seed_spread_db"] = round(max(rf) - min(rf), 3)
        summary["value"] = round(
            sum(rf) / len(rf) - summary["no_lpips"]["psnr"], 3)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
