"""Pre-training throughput probe (BASELINE.md config-5 flavor).

Runs `pretrain_face` (and optionally `pretrain_mouth`) on two synthetic
512x512 identities with the reference pre-training constants
(face init 2000 @ densify_grad_threshold 5e-4, mouth init 5000 —
/root/reference/scripts/pretrain_con.sh:10-11) for a bounded iteration
probe, and prints the wall time + steady step rate. `--fixed_capacity`
disables the adaptive cloud capacity so the win is measurable A/B.

Usage:
    python scripts/bench_pretrain.py [--iterations 2000] [--mouth]
        [--fixed_capacity] [--size 512] [--n_frames 250]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/tmp/pretrain_scene_512")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--n_frames", type=int, default=250)
    ap.add_argument("--iterations", type=int, default=2000,
                    help="iterations per identity (reference: 30000)")
    ap.add_argument("--warm_per_id", type=int, default=500,
                    help="static warm-up per identity (reference: 1000)")
    ap.add_argument("--mouth", action="store_true",
                    help="also probe the mouth branch")
    ap.add_argument("--fixed_capacity", action="store_true")
    ap.add_argument("--fresh_scene", action="store_true")
    args = ap.parse_args()

    if args.fresh_scene and os.path.isdir(args.scene):
        shutil.rmtree(args.scene)
    names = ["id_a", "id_b"]
    for k, name in enumerate(names):
        d = os.path.join(args.scene, name)
        if not os.path.exists(os.path.join(d, "transforms_train.json")):
            from instag_tpu.data.synthetic import generate_scene
            t = time.time()
            generate_scene(d, n_frames=args.n_frames, size=args.size,
                           n_val=10, seed=k)
            print(f"# scene {name} generated in {time.time()-t:.1f}s",
                  file=sys.stderr)

    from instag_tpu.config import (ModelConfig, OptimizationConfig,
                                   enable_persistent_compile_cache)
    from instag_tpu.train.pretrain import pretrain_face, pretrain_mouth

    enable_persistent_compile_cache()
    adaptive = not args.fixed_capacity

    mc = ModelConfig(source_path=args.scene, init_num=2000,
                     adaptive_capacity=adaptive)
    oc = OptimizationConfig(iterations=args.iterations,
                            densify_grad_threshold=0.0005,
                            position_lr_max_steps=args.iterations * 2)
    t0 = time.time()
    face = pretrain_face(mc, oc, names, warm_per_id=args.warm_per_id)
    face_wall = time.time() - t0
    total = args.iterations * len(names)
    print(json.dumps({
        "metric": "pretrain_face_wall_s", "value": round(face_wall, 1),
        "unit": "s", "iterations_total": total, "size": args.size,
        "adaptive_capacity": adaptive,
        "ms_per_iter": round(1000.0 * face_wall / total, 2)}), flush=True)

    if args.mouth:
        mcm = ModelConfig(source_path=args.scene, init_num=5000,
                          type="mouth", adaptive_capacity=adaptive)
        # the mouth stage runs at the DEFAULT densify threshold (2e-4):
        # pretrain_con.sh passes 5e-4 to pretrain_face only, and
        # cli/pretrain resets the mouth OptimizationConfig the same way
        ocm = dataclasses.replace(
            oc, densify_grad_threshold=OptimizationConfig()
            .densify_grad_threshold)
        t0 = time.time()
        pretrain_mouth(mcm, ocm, names, face,
                       warm_per_id=min(3 * args.warm_per_id,
                                       args.iterations // 2))
        mouth_wall = time.time() - t0
        print(json.dumps({
            "metric": "pretrain_mouth_wall_s", "value": round(mouth_wall, 1),
            "unit": "s", "iterations_total": total, "size": args.size,
            "adaptive_capacity": adaptive,
            "ms_per_iter": round(1000.0 * mouth_wall / total, 2)}),
            flush=True)


if __name__ == "__main__":
    main()
