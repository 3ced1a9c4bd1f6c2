#!/bin/bash
# Batch 23 (round 2): profile the swin eval lane (where does the ~7% MFU go)
# + confirm the retrace fix didn't move the clip16 train control.
cd /root/repo
LOG=${1:-.tpu_batch23.log}
{
  echo "=== swin eval b16 profiled $(date) ==="
  BENCH_PRESET=swin32_base384 BENCH_MODE=eval BENCH_BATCH=16 BENCH_STEPS=50 \
    MMVQA_PROFILE_DIR=.profiles/r2_swin_eval timeout 3600 python bench.py
  echo rc=$?
  echo "=== train b32 control (post-retrace-fix) $(date) ==="
  BENCH_MODE=train BENCH_BATCH=32 BENCH_STEPS=100 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== all done $(date) ==="
} >> "$LOG" 2>&1
