#!/bin/bash
# Batch 38 (round 3): t5_train with kernel-routed T5 SELF-attention
# (cross reverted to einsum — TPU compiler SIGABRT on the 12x512 cross
# shape, probe_t5_attn_shapes.py).  clip16 control re-run (batch37 lane 0
# hit a remote-compile transient).
cd /root/repo
LOG=${1:-.tpu_batch38.log}
{
  echo "=== batch38 $(date) ==="
  echo "--- 0) clip16 train b32 control ---"
  BENCH_MODE=train BENCH_BATCH=32 python bench.py
  echo "--- 1) t5_train b32 (kernel self-attn) ---"
  BENCH_MODE=t5_train BENCH_BATCH=32 python bench.py
  echo "=== batch38 done $(date) ==="
} 2>&1 | tee "$LOG"
