"""End-to-end approx-selection A/B (VERDICT r4 item 5).

The shipping rasterizer selects per-tile splats with recall-0.9
``approx_max_k`` (ops/rasterize.py:58-74). Training consumes means2D grads
of SELECTED splats only, so densification stats (reference
scene/gaussian_model.py:683-685 semantics) could in principle be biased by
the ~10% tail misses. This script retires that question: one FULL few-shot
adaptation with exact selection (--no_approx_topk -> lax.top_k) vs the
shipping config, same seed/scene/budget, comparing final held-out PSNR and
the final live-splat count. Results recorded in BASELINE.md
("approx-selection A/B").

Usage:
    python scripts/exp_approx_select_ab.py [--source_path DIR]
        [--iterations 10000] [--size 512] [--n_frames 250]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source_path", default="",
                    help="existing dataset dir (e.g. the flagship held "
                         "identity); empty -> generate a hard scene")
    ap.add_argument("--root", default="/tmp/approx_ab")
    ap.add_argument("--iterations", type=int, default=10000)
    ap.add_argument("--fuse_iterations", type=int, default=2000)
    ap.add_argument("--n_frames", type=int, default=250)
    ap.add_argument("--n_val", type=int, default=50)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    src = args.source_path
    if not src:
        src = os.path.join(args.root, "scene")
        if not os.path.exists(os.path.join(src, "transforms_train.json")):
            from instag_tpu.data.synthetic_hard import generate_hard_scene
            t0 = time.time()
            generate_hard_scene(src, n_frames=args.n_frames, size=args.size,
                                n_val=args.n_val, seed=args.seed + 777)
            print(f"# scene generated ({time.time()-t0:.0f}s)",
                  file=sys.stderr, flush=True)

    from instag_tpu.cli.adapt import main as adapt_main
    from instag_tpu.io.checkpoints import load_bundle, state_from_dict

    def run(arm: str, extra: list[str]):
        out = os.path.join(args.root, f"adapt_{arm}")
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        adapt_main(["--source_path", src, "--model_path", out,
                    "--init_num", "2000", "--mouth_init_num", "5000",
                    "--densify_grad_threshold", "0.0005",
                    "--N_views", str(args.n_frames),
                    "--iterations", str(args.iterations),
                    "--fuse_iterations", str(args.fuse_iterations),
                    "--seed", str(args.seed)] + extra)
        wall = time.time() - t0
        scores = json.load(open(os.path.join(out, "metrics.json")))
        bundle = load_bundle(os.path.join(out, "chkpnt_fuse_latest.pkl"))
        import numpy as np
        alive = {k: int(np.asarray(state_from_dict(bundle[k]).alive).sum())
                 for k in ("face_state", "mouth_state")}
        row = {"psnr": scores["psnr"], "lpips": scores.get("lpips"),
               "alive": alive, "wall_s": round(wall, 1)}
        print(f"# arm {arm}: PSNR {row['psnr']:.3f} alive {alive} "
              f"wall {wall:.0f}s", file=sys.stderr, flush=True)
        return row

    summary = {"metric": "approx_select_ab_psnr_delta_db", "unit": "dB",
               "iterations": args.iterations, "seed": args.seed}
    summary["approx"] = run("approx", [])
    summary["exact"] = run("exact", ["--no_approx_topk"])
    summary["value"] = round(summary["approx"]["psnr"]
                             - summary["exact"]["psnr"], 3)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
