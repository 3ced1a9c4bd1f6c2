#!/bin/bash
# Batch 40 (round 3): explicit-remat A/B on the swin train lane.
# Motivation: batch36 profile shows XLA involuntarily full-rematerializes
# the 302 MB 6-D windowed fusions at b32 (sweep b16 > b32 > b48); explicit
# jax.checkpoint at block granularity (MMVQA_SWIN_REMAT) picks what to
# save instead of letting the compiler spill-recover.
cd /root/repo
LOG=${1:-.tpu_batch40.log}
{
  echo "=== batch40 $(date) ==="
  echo "--- 0) swin train b32 control (remat=none) ---"
  BENCH_MODE=train BENCH_BATCH=32 BENCH_PRESET=swin32_base384 python bench.py
  echo "--- 1) swin train b32 remat=dots ---"
  MMVQA_SWIN_REMAT=dots BENCH_MODE=train BENCH_BATCH=32 BENCH_PRESET=swin32_base384 python bench.py
  echo "--- 2) swin train b32 remat=block ---"
  MMVQA_SWIN_REMAT=block BENCH_MODE=train BENCH_BATCH=32 BENCH_PRESET=swin32_base384 python bench.py
  echo "--- 3) swin train b48 remat=dots ---"
  MMVQA_SWIN_REMAT=dots BENCH_MODE=train BENCH_BATCH=48 BENCH_PRESET=swin32_base384 python bench.py
  echo "--- 4) swin train b64 remat=dots ---"
  MMVQA_SWIN_REMAT=dots BENCH_MODE=train BENCH_BATCH=64 BENCH_PRESET=swin32_base384 python bench.py
  echo "=== batch40 done $(date) ==="
} 2>&1 | tee "$LOG"
