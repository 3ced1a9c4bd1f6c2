#!/bin/bash
# Batch 39 (round 3): post-droppath swin train (honest parity number),
# t5_beam with the kernel-routed encoder, remaining swin levers.
cd /root/repo
LOG=${1:-.tpu_batch39.log}
{
  echo "=== batch39 $(date) ==="
  echo "--- 0) clip16 train b32 control ---"
  BENCH_MODE=train BENCH_BATCH=32 python bench.py
  echo "--- 1) swin train b32 (now with stochastic depth) ---"
  BENCH_MODE=train BENCH_BATCH=32 BENCH_PRESET=swin32_base384 python bench.py
  echo "--- 2) swin train b16 ---"
  BENCH_MODE=train BENCH_BATCH=16 BENCH_PRESET=swin32_base384 python bench.py
  echo "--- 3) t5_beam b128 (kernel encoder) ---"
  BENCH_MODE=t5_beam BENCH_BATCH=128 BENCH_T5_MAXLEN=12 BENCH_T5_IMPL=device python bench.py
  echo "--- 4) swin eval b16 control (droppath inactive at eval) ---"
  BENCH_MODE=eval BENCH_BATCH=16 BENCH_PRESET=swin32_base384 python bench.py
  echo "=== batch39 done $(date) ==="
} 2>&1 | tee "$LOG"
