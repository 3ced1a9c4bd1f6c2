#!/bin/bash
# Batch 21 (round 2): bf16-moments knob measurement + fresh nodrop row +
# eval control.  Idle host; compare rows within this batch only.
cd /root/repo
LOG=${1:-.tpu_batch21.log}
{
  echo "=== train b32 control $(date) ==="
  BENCH_MODE=train BENCH_BATCH=32 BENCH_STEPS=100 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== train b32 bf16-moments $(date) ==="
  MMVQA_OPT_MOMENTS_DTYPE=bfloat16 BENCH_MODE=train BENCH_BATCH=32 \
    BENCH_STEPS=100 timeout 3600 python bench.py; echo rc=$?
  echo "=== train b32 nodrop (analysis only) $(date) ==="
  BENCH_DROP=0 BENCH_MODE=train BENCH_BATCH=32 BENCH_STEPS=100 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== eval b16 control $(date) ==="
  BENCH_MODE=eval BENCH_BATCH=16 BENCH_STEPS=100 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== all done $(date) ==="
} >> "$LOG" 2>&1
