"""UMF-transfer experiment: multi-identity pre-training -> few-shot adaptation
(BASELINE config 5 — the reference's core claim, executed end-to-end).

InsTaG's thesis is that a Universal Motion Field pre-trained on several
identities makes few-shot adaptation to a NEW identity better than training
from scratch (/root/reference/pretrain_face.py:34-522 feeding
/root/reference/train_face.py:66-68 via --pretrain_path). This script runs
that chain on synthetic identities with real appearance/geometry/cadence
variation (instag_tpu/data/synthetic.py `variation=1.0`) and reports both
adaptation arms:

1. generate N pretrain identities + 1 held-out identity (different seed =>
   different head shape/colors, talking period, AND audio-feature projection)
2. `cli.pretrain` (single-process face+mouth chain) at the reference budget
   (30k iters/branch/identity, scripts/pretrain_con.sh:10-11; scale with
   --iterations if wall time demands — state the scaling when reporting)
3. `cli.adapt` on the held-out identity TWICE with the same seed/budget:
   with --pretrain_path (the pretrained-UMF arm) and without (from scratch)
4. print a JSON summary with pretrain wall clock + held-out PSNR/LPIPS per
   arm; each arm's metrics.json holds the full protocol output

Usage:
    python scripts/exp_umf_transfer.py [--root /tmp/umf_exp]
        [--n_ids 3] [--iterations 30000] [--adapt_iterations 10000]
        [--pretrain_frames 400] [--size 512] [--skip_pretrain]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/umf_exp")
    ap.add_argument("--n_ids", type=int, default=3)
    ap.add_argument("--iterations", type=int, default=30000,
                    help="pretrain iters per branch per identity "
                         "(reference: 30000)")
    ap.add_argument("--adapt_iterations", type=int, default=10000)
    ap.add_argument("--fuse_iterations", type=int, default=2000)
    ap.add_argument("--pretrain_frames", type=int, default=400)
    ap.add_argument("--adapt_frames", type=int, default=250,
                    help="few-shot budget (reference: 250 = 10 s)")
    ap.add_argument("--n_val", type=int, default=50)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip_pretrain", action="store_true",
                    help="reuse an existing pretrain output dir")
    ap.add_argument("--fresh_scenes", action="store_true")
    ap.add_argument("--motion_dims", type=int, default=1,
                    help="audio->motion manifold dimensionality (1-3); >1 "
                         "makes short few-shot clips undersample the "
                         "motion space (data/synthetic.py)")
    ap.add_argument("--hard", action="store_true",
                    help="use the HARD identity family "
                         "(data/synthetic_hard.py: ray-traced textured "
                         "head, blink, teeth, 8-D articulation map 75 "
                         "frames undersample — VERDICT r4 item 1)")
    ap.add_argument("--adapt_seeds", default=None,
                    help="comma list of adaptation seeds; both arms run "
                         "once per seed and the summary reports "
                         "mean +- spread (default: just --seed)")
    args = ap.parse_args()

    data_dir = os.path.join(args.root, "data")
    pre_out = os.path.join(args.root, "pretrain_out")
    os.makedirs(data_dir, exist_ok=True)

    names = [f"id{k}" for k in range(args.n_ids)]
    held = "held"
    t = time.time()
    for k, name in enumerate(names + [held]):
        d = os.path.join(data_dir, name)
        if args.fresh_scenes and os.path.isdir(d):
            shutil.rmtree(d)
        if os.path.exists(os.path.join(d, "transforms_train.json")):
            continue
        n_frames = args.pretrain_frames if name != held else args.adapt_frames
        # held-out identity draws a seed far from the pretrain block
        sid = args.seed + k if name != held else args.seed + 777
        if args.hard:
            from instag_tpu.data.synthetic_hard import generate_hard_scene
            generate_hard_scene(d, n_frames=n_frames, size=args.size,
                                n_val=args.n_val, seed=sid)
        else:
            from instag_tpu.data.synthetic import generate_scene
            generate_scene(d, n_frames=n_frames, size=args.size,
                           n_val=args.n_val, seed=sid,
                           variation=1.0, focal_mult=8.0,
                           motion_dims=args.motion_dims)
        print(f"# scene {name} generated ({time.time()-t:.0f}s)",
              file=sys.stderr, flush=True)

    summary = {"metric": "umf_transfer_psnr_delta_db", "unit": "dB",
               "n_ids": args.n_ids, "size": args.size,
               "motion_dims": args.motion_dims,
               "pretrain_iters_per_branch_per_id": args.iterations,
               "reference_budget": 30000}

    # ---- pre-training at the reference constants (pretrain_con.sh:10-11:
    # face init 2000 @ grad 5e-4; mouth init 5000 @ default grad) ----
    if not args.skip_pretrain or not os.path.exists(
            os.path.join(pre_out, "chkpnt_ema_mouth_latest.pkl")):
        shutil.rmtree(pre_out, ignore_errors=True)
        from instag_tpu.cli.pretrain import main as pretrain_main
        t0 = time.time()
        pretrain_main(["--source_path", data_dir, "--model_path", pre_out,
                       "--data_list", ",".join(names),
                       "--init_num", "2000", "--mouth_init_num", "5000",
                       "--densify_grad_threshold", "0.0005",
                       "--iterations", str(args.iterations),
                       "--seed", str(args.seed)])
        summary["pretrain_wall_s"] = round(time.time() - t0, 1)
        print(f"# pretrain wall: {summary['pretrain_wall_s']}s",
              file=sys.stderr, flush=True)

    # ---- adaptation arms: identical seed/budget, +- the pretrained UMF;
    # optionally repeated over several seeds (VERDICT r4 item 6: report
    # the transfer delta against its own seed noise) ----
    from instag_tpu.cli.adapt import main as adapt_main

    def adapt(arm: str, pretrain_path: str | None, seed: int):
        out = os.path.join(args.root, f"adapt_{arm}_s{seed}")
        shutil.rmtree(out, ignore_errors=True)
        argv = ["--source_path", os.path.join(data_dir, held),
                "--model_path", out,
                "--init_num", "2000", "--mouth_init_num", "5000",
                "--densify_grad_threshold", "0.0005",
                "--N_views", str(args.adapt_frames),
                "--iterations", str(args.adapt_iterations),
                "--fuse_iterations", str(args.fuse_iterations),
                "--seed", str(seed)]
        if pretrain_path:
            argv += ["--pretrain_path", pretrain_path]
        t0 = time.time()
        adapt_main(argv)
        wall = time.time() - t0
        scores = json.load(open(os.path.join(out, "metrics.json")))
        scores["wall_s"] = round(wall, 1)
        print(f"# arm {arm} seed {seed}: PSNR {scores['psnr']:.3f} "
              f"LPIPS {scores.get('lpips', float('nan')):.4f} "
              f"wall {wall:.0f}s", file=sys.stderr, flush=True)
        return scores

    seeds = ([int(s) for s in args.adapt_seeds.split(",")]
             if args.adapt_seeds else [args.seed])
    for arm, pre in [("pretrained", pre_out), ("scratch", None)]:
        runs = [adapt(arm, pre, s) for s in seeds]
        psnrs = [r["psnr"] for r in runs]
        summary[arm] = {"runs": runs, "psnr": round(float(np.mean(psnrs)), 3),
                        "psnr_spread": round(max(psnrs) - min(psnrs), 3),
                        "seeds": seeds}
    deltas = [summary["pretrained"]["runs"][i]["psnr"]
              - summary["scratch"]["runs"][i]["psnr"]
              for i in range(len(seeds))]
    summary["per_seed_delta"] = [round(d, 3) for d in deltas]
    summary["value"] = round(float(np.mean(deltas)), 3)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
