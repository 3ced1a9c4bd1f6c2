#!/bin/bash
# Batch 30 (round 2): packed-layout swin window attention A/B.
# Same-batch rows: packed ON vs OFF for eval b16 and train b32.
cd /root/repo
LOG=${1:-.tpu_batch30.log}
{
  echo "=== swin eval b16 PACKED=1 $(date) ==="
  MMVQA_SWIN_PACKED=1 BENCH_PRESET=swin32_base384 BENCH_MODE=eval \
    BENCH_BATCH=16 BENCH_STEPS=50 timeout 3600 python bench.py; echo rc=$?
  echo "=== swin eval b16 PACKED=0 $(date) ==="
  MMVQA_SWIN_PACKED=0 BENCH_PRESET=swin32_base384 BENCH_MODE=eval \
    BENCH_BATCH=16 BENCH_STEPS=50 timeout 3600 python bench.py; echo rc=$?
  echo "=== swin train b32 PACKED=1 $(date) ==="
  MMVQA_SWIN_PACKED=1 BENCH_PRESET=swin32_base384 BENCH_MODE=train \
    BENCH_BATCH=32 BENCH_STEPS=50 timeout 3600 python bench.py; echo rc=$?
  echo "=== swin train b32 PACKED=0 $(date) ==="
  MMVQA_SWIN_PACKED=0 BENCH_PRESET=swin32_base384 BENCH_MODE=train \
    BENCH_BATCH=32 BENCH_STEPS=50 timeout 3600 python bench.py; echo rc=$?
  echo "=== all done $(date) ==="
} >> "$LOG" 2>&1
