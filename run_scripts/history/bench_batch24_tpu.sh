#!/bin/bash
# Batch 24 (round 2): swin lanes after the shifted-window bias fold
# (window axis folded into heads; bias streamed, not materialized).
# No profiled lanes before measured lanes (batch23 hygiene rule).
cd /root/repo
LOG=${1:-.tpu_batch24.log}
{
  echo "=== swin eval b16 (bias-fold) $(date) ==="
  BENCH_PRESET=swin32_base384 BENCH_MODE=eval BENCH_BATCH=16 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== swin train b16 (bias-fold) $(date) ==="
  BENCH_PRESET=swin32_base384 BENCH_MODE=train BENCH_BATCH=16 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== all done $(date) ==="
} >> "$LOG" 2>&1
