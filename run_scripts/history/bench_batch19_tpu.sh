#!/bin/bash
# Batch 19 (round 2): first TPU runs of the generative-head TRAIN lanes +
# LN one-pass ablation on the classifier train lane.  Idle host required
# (NOTES_ROUND3 fact 7); rows are only comparable within this batch.
# First compile of each new HLO is 8-17 min through the remote-compile
# tunnel (.jax_cache persists across runs).
cd /root/repo
LOG=${1:-.tpu_batch19.log}
{
  echo "=== train b32 control $(date) ==="
  BENCH_MODE=train BENCH_BATCH=32 BENCH_STEPS=100 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== train b32 LN_ONEPASS $(date) ==="
  MMVQA_LN_ONEPASS=1 BENCH_MODE=train BENCH_BATCH=32 BENCH_STEPS=100 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== decoder_train b32 $(date) ==="
  BENCH_MODE=decoder_train BENCH_BATCH=32 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== t5_train b32 $(date) ==="
  BENCH_MODE=t5_train BENCH_BATCH=32 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== all done $(date) ==="
} >> "$LOG" 2>&1
