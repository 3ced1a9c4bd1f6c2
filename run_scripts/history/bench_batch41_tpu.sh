#!/bin/bash
# Batch 41 (round 3): bf16 optimizer moments on the swin train lane.
# Motivation: batch36 profile puts 31.4 ms/step (15%) in the
# multiply_subtract family (per-leaf optimizer/dropout traffic; swin-base
# has ~2.5x the leaves of ViT-B).  MMVQA_OPT_MOMENTS_DTYPE=bfloat16 halves
# moment read/write bytes (+3.2% on clip16, PERF.md batch21 — opt-in).
cd /root/repo
LOG=${1:-.tpu_batch41.log}
{
  echo "=== batch41 $(date) ==="
  echo "--- 0) swin train b32 control ---"
  BENCH_MODE=train BENCH_BATCH=32 BENCH_PRESET=swin32_base384 python bench.py
  echo "--- 1) swin train b32 bf16 moments ---"
  MMVQA_OPT_MOMENTS_DTYPE=bfloat16 BENCH_MODE=train BENCH_BATCH=32 BENCH_PRESET=swin32_base384 python bench.py
  echo "--- 2) swin train b16 bf16 moments ---"
  MMVQA_OPT_MOMENTS_DTYPE=bfloat16 BENCH_MODE=train BENCH_BATCH=16 BENCH_PRESET=swin32_base384 python bench.py
  echo "=== batch41 done $(date) ==="
} 2>&1 | tee "$LOG"
