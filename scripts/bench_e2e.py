"""End-to-end few-shot adaptation wall-clock benchmark (BASELINE.md).

Reproduces the protocol used for the round-2/3 numbers, now committed so the
measurement is exactly repeatable: a 512x512 synthetic identity with 250
training frames + 50 held-out frames (`instag_tpu/data/synthetic.py`), run
through the single-process chain `instag_tpu.cli.adapt` with the reference
pipeline constants (face init 2000 @ densify_grad_threshold 5e-4, 10k face +
10k mouth + 2k fuse iters, N_views 250 — /root/reference/scripts/
train_xx_few.sh:19-21), ending with variant videos + the metrics stage.

Usage:
    python scripts/bench_e2e.py [--scene /tmp/e2e_scene] [--out /tmp/e2e_out]
        [--iterations 10000] [--fuse_iterations 2000] [--fresh_scene]

Prints per-stage wall times (cli/adapt already logs `[adapt] <stage> (t=..s)`)
and a final JSON line with the total.
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
    ap.add_argument("--scene", default="/tmp/e2e_scene_512")
    ap.add_argument("--out", default="/tmp/e2e_out_512")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--n_frames", type=int, default=250)
    ap.add_argument("--n_val", type=int, default=50)
    ap.add_argument("--iterations", type=int, default=10000)
    ap.add_argument("--fuse_iterations", type=int, default=2000)
    ap.add_argument("--data_parallel", type=int, default=1)
    ap.add_argument("--fresh_scene", action="store_true")
    ap.add_argument("--fast", action="store_true",
                    help="skip variant videos / PLY dump / metrics")
    args = ap.parse_args()

    if args.fresh_scene and os.path.isdir(args.scene):
        shutil.rmtree(args.scene)
    if not os.path.exists(os.path.join(args.scene, "transforms_train.json")):
        from instag_tpu.data.synthetic import generate_scene
        t = time.time()
        generate_scene(args.scene, n_frames=args.n_frames, size=args.size,
                       n_val=args.n_val)
        print(f"# scene generated in {time.time() - t:.1f}s -> {args.scene}",
              file=sys.stderr)
    shutil.rmtree(args.out, ignore_errors=True)

    from instag_tpu.cli.adapt import main as adapt_main
    argv = ["--source_path", args.scene, "--model_path", args.out,
            "--init_num", "2000", "--mouth_init_num", "5000",
            "--densify_grad_threshold", "0.0005",
            "--N_views", str(args.n_frames),
            "--iterations", str(args.iterations),
            "--fuse_iterations", str(args.fuse_iterations)]
    if args.fast:
        argv.append("--fast")
    if args.data_parallel > 1:
        argv += ["--data_parallel", str(args.data_parallel)]
    t0 = time.time()
    adapt_main(argv)
    wall = time.time() - t0

    metrics = {}
    mpath = os.path.join(args.out, "metrics.json")
    if os.path.exists(mpath):
        metrics = json.load(open(mpath))
    print(json.dumps({
        "metric": "adaptation_e2e_wall_s", "value": round(wall, 1),
        "unit": "s", "iterations": [args.iterations, args.iterations,
                                    args.fuse_iterations],
        "frames": args.n_frames, "size": args.size,
        "psnr": metrics.get("psnr"), "vs_reference_5min": round(300 / wall, 3),
    }))


if __name__ == "__main__":
    main()
