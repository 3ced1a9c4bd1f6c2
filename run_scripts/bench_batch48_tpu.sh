#!/bin/bash
# Batch 48 (round 5): batch-size re-sweep at the new defaults.  bf16
# moment storage cut per-step optimizer HBM ~30%; the b32-optimum was
# established when that traffic was 28 B/param (b40 = 187.9 vs b32 =
# 188.3, batch42), so the optimum may have shifted up.  Plus one LHS
# scheduler retry at the new defaults.  Nothing else on the host.
cd /root/repo
LOG=${1:-.tpu_batch48.log}
{
  echo "=== batch48 $(date) ==="
  echo "--- 0) b40 at new defaults ---"
  BENCH_MODE=train BENCH_BATCH=40 python bench.py
  echo "--- 1) b48 at new defaults ---"
  BENCH_MODE=train BENCH_BATCH=48 python bench.py
  echo "--- 2) b32 + latency-hiding scheduler ---"
  MMVQA_XLA_OPTS="xla_tpu_enable_latency_hiding_scheduler=true" \
    BENCH_MODE=train BENCH_BATCH=32 python bench.py
  echo "=== batch48 done $(date) ==="
} 2>&1 | tee "$LOG"
