#!/bin/bash
# Batch 36 (round 3): profiling pass for the two sub-50%-MFU lanes
# (VERDICT r2 items 4 and 7).  PROFILED LANES ONLY — trace flush congests
# the tunnel, so no measured lane may follow in this batch
# (NOTES_ROUND3 measurement hazard).
# 1) swin32_base384 train b32 profile -> .profiles/r3_swin_train
# 2) t5_train b32 profile            -> .profiles/r3_t5_train
# Then summarize both with analyze_xplane.py.
cd /root/repo
LOG=${1:-.tpu_batch36.log}
{
  echo "=== batch36 $(date) ==="
  echo "--- 1) swin train b32 PROFILED ---"
  BENCH_MODE=train BENCH_BATCH=32 BENCH_PRESET=swin32_base384 \
    BENCH_STEPS=20 MMVQA_PROFILE_DIR=.profiles/r3_swin_train python bench.py
  echo "--- 2) t5_train b32 PROFILED ---"
  BENCH_MODE=t5_train BENCH_BATCH=32 BENCH_STEPS=20 \
    MMVQA_PROFILE_DIR=.profiles/r3_t5_train python bench.py
  echo "--- summaries ---"
  python run_scripts/analyze_xplane.py .profiles/r3_swin_train 20 || true
  python run_scripts/analyze_xplane.py .profiles/r3_t5_train 20 || true
  echo "=== batch36 done $(date) ==="
} 2>&1 | tee "$LOG"
