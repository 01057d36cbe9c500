#!/usr/bin/env bash
# Round-5 chip-work queue: runs after the flagship 10-s chain completes.
# Each stage appends to its own log; failures don't block later stages.
set -u
R=/root/repo
SNAP=/tmp/flagship_repo     # code snapshot the 10-s arms ran on (A/B parity)

echo "== 1/5 flagship 3-s budget (reuses pretrain + scenes via symlinks) =="
mkdir -p /tmp/flagship3
[ -e /tmp/flagship3/data ] || ln -s /tmp/flagship/data /tmp/flagship3/data
[ -e /tmp/flagship3/pretrain_out ] || ln -s /tmp/flagship/pretrain_out /tmp/flagship3/pretrain_out
(cd "$SNAP" && timeout 7200 python scripts/exp_umf_transfer.py \
    --root /tmp/flagship3 --hard --n_ids 4 --skip_pretrain \
    --adapt_iterations 10000 --fuse_iterations 2000 \
    --adapt_frames 75 --n_val 50 --size 512 --seed 0 --adapt_seeds 0,1) \
    > /tmp/flagship_3s.log 2>&1
echo "3s exit=$?"

echo "== 2/5 select reuse quantify (adversarial sweep + auto mode) =="
(cd "$R" && timeout 2400 python scripts/quantify_select_reuse.py) \
    > /tmp/q_select.log 2>&1
echo "select exit=$?"

echo "== 3/5 selection-key dtype A/B =="
(cd "$R" && timeout 1800 python scripts/quantify_select_dtype.py) \
    > /tmp/q_dtype.log 2>&1
echo "dtype exit=$?"

echo "== 4/5 approx-selection end-to-end A/B (flagship held scene) =="
(cd "$R" && timeout 7200 python scripts/exp_approx_select_ab.py \
    --source_path /tmp/flagship/data/held --root /tmp/approx_ab \
    --iterations 10000 --fuse_iterations 2000 --n_frames 250) \
    > /tmp/approx_ab.log 2>&1
echo "approx exit=$?"

echo "== 5/5 final clean bench =="
(cd "$R" && timeout 1200 python bench.py) \
    > /tmp/bench_final.json 2> /tmp/bench_final.log
echo "bench exit=$?"
echo "QUEUE DONE"
