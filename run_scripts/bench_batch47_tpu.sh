#!/bin/bash
# Batch 47 (round 5): refresh every headline lane at the NEW defaults
# (32M scoped vmem for non-swin, bf16 Adam moment storage) and capture a
# fresh xplane profile of the driver lane for the family-attribution
# account (VERDICT r4 item 2's fallback deliverable).  Nothing else may
# run on the host during this script (1 vCPU).
cd /root/repo
LOG=${1:-.tpu_batch47.log}
{
  echo "=== batch47 $(date) ==="
  echo "--- 0) pretrain at new defaults (bf16 moments now default) ---"
  BENCH_MODE=pretrain BENCH_BATCH=32 python bench.py
  echo "--- 1) swin at new defaults (16M scoped via swin exclusion + bf16 moments) ---"
  BENCH_MODE=train BENCH_PRESET=swin32_base384 BENCH_BATCH=16 python bench.py
  echo "--- 2) decoder-head train at new defaults ---"
  BENCH_MODE=decoder_train BENCH_BATCH=32 python bench.py
  echo "--- 3) T5-head train at new defaults ---"
  BENCH_MODE=t5_train BENCH_BATCH=32 python bench.py
  echo "--- 4) driver lane, profiled (steps 3..8 traced) ---"
  rm -rf .profiles/r5_train
  MMVQA_PROFILE_DIR=.profiles/r5_train BENCH_MODE=train BENCH_BATCH=32 \
    BENCH_STEPS=40 python bench.py
  echo "--- 5) xplane family decomposition ---"
  python run_scripts/analyze_xplane.py .profiles/r5_train || true
  echo "=== batch47 done $(date) ==="
} 2>&1 | tee "$LOG"
