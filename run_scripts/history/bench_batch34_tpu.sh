#!/bin/bash
# Batch 34 (round 3): 1) headline regression check after the attention
# shard_map/constraint change (single-chip must be a no-op), 2) FIRST
# pretraining-recipe measurement (VERDICT r2 item 2: mlm+mim+itm, image
# 288, text 64, per-chip batch 32 — reference pretrain_m3ae.sh), at two
# batch sizes, 3) realdata steady-state + decomposition rows (VERDICT r2
# item 3): stock vs device_resize, to locate the binding constraint
# (host resize vs tunnel transfer).  Idle host required.
cd /root/repo
LOG=${1:-.tpu_batch34.log}
{
  echo "=== batch34 $(date) ==="
  echo "--- 1) train headline regression check (b32) ---"
  BENCH_MODE=train BENCH_BATCH=32 python bench.py
  echo "--- 2a) pretrain b32 (reference recipe) ---"
  BENCH_MODE=pretrain BENCH_BATCH=32 python bench.py
  echo "--- 2b) pretrain b16 ---"
  BENCH_MODE=pretrain BENCH_BATCH=16 python bench.py
  echo "--- 3a) realdata stock (b32) ---"
  BENCH_MODE=realdata BENCH_BATCH=32 BENCH_STEPS=40 python bench.py
  echo "--- 3b) realdata device_resize (b32) ---"
  BENCH_MODE=realdata BENCH_BATCH=32 BENCH_STEPS=40 BENCH_DEVRESIZE=1 python bench.py
  echo "=== batch34 done $(date) ==="
} 2>&1 | tee "$LOG"
