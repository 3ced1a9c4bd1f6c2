#!/bin/bash
# Batch 25 (round 2): swin qkv-slice variant + batch scaling rows.
cd /root/repo
LOG=${1:-.tpu_batch25.log}
{
  echo "=== swin eval b16 (qkv-slice) $(date) ==="
  BENCH_PRESET=swin32_base384 BENCH_MODE=eval BENCH_BATCH=16 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== swin eval b32 $(date) ==="
  BENCH_PRESET=swin32_base384 BENCH_MODE=eval BENCH_BATCH=32 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== swin train b32 $(date) ==="
  BENCH_PRESET=swin32_base384 BENCH_MODE=train BENCH_BATCH=32 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== all done $(date) ==="
} >> "$LOG" 2>&1
