#!/bin/bash
# Batch 20 (round 2): generative-train lanes re-measured after the batch19
# postmortem fixes (second warmup, LeafFusedAdamW skip-frozen, frozen-subtree
# stop_gradient).  Fresh HLOs -> cold compiles (~10 min/lane).  Idle host.
cd /root/repo
LOG=${1:-.tpu_batch20.log}
{
  echo "=== decoder_train b32 (fused+stopgrad) $(date) ==="
  BENCH_MODE=decoder_train BENCH_BATCH=32 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== t5_train b32 (fused+stopgrad) $(date) ==="
  BENCH_MODE=t5_train BENCH_BATCH=32 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== train b32 control (same session) $(date) ==="
  BENCH_MODE=train BENCH_BATCH=32 BENCH_STEPS=100 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== all done $(date) ==="
} >> "$LOG" 2>&1
