#!/bin/bash
# Batch 22 (round 2): Swin-tower lanes (BENCH_PRESET=swin32_base384) — first
# TPU measurement of the swin path at preset scale.  Cold compiles.
cd /root/repo
LOG=${1:-.tpu_batch22.log}
{
  echo "=== swin train b16 $(date) ==="
  BENCH_PRESET=swin32_base384 BENCH_MODE=train BENCH_BATCH=16 \
    BENCH_STEPS=50 timeout 3600 python bench.py; echo rc=$?
  echo "=== swin eval b16 $(date) ==="
  BENCH_PRESET=swin32_base384 BENCH_MODE=eval BENCH_BATCH=16 \
    BENCH_STEPS=50 timeout 3600 python bench.py; echo rc=$?
  echo "=== all done $(date) ==="
} >> "$LOG" 2>&1
