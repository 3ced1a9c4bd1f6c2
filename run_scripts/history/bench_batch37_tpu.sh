#!/bin/bash
# Batch 37 (round 3): t5_train with kernel-routed T5 attention (scale=1.0,
# streamed softmax — batch36 profile showed the 512² encoder scores at 29%
# of the step), + swin MFU experiments (batch36 profile: XLA-forced remat
# duplicates of 6-D windowed fusions => HBM-pressure hypothesis; probe
# batch sizes + flat-layout control).  No profiled lanes.
cd /root/repo
LOG=${1:-.tpu_batch37.log}
{
  echo "=== batch37 $(date) ==="
  echo "--- 0) clip16 train b32 control ---"
  BENCH_MODE=train BENCH_BATCH=32 python bench.py
  echo "--- 1) t5_train b32 (kernel-routed T5 attention) ---"
  BENCH_MODE=t5_train BENCH_BATCH=32 python bench.py
  echo "--- 2) swin train b32 control ---"
  BENCH_MODE=train BENCH_BATCH=32 BENCH_PRESET=swin32_base384 python bench.py
  echo "--- 3) swin train b16 ---"
  BENCH_MODE=train BENCH_BATCH=16 BENCH_PRESET=swin32_base384 python bench.py
  echo "--- 4) swin train b48 ---"
  BENCH_MODE=train BENCH_BATCH=48 BENCH_PRESET=swin32_base384 python bench.py
  echo "--- 5) swin train b32 flat layout (WINDOWED=0) ---"
  BENCH_MODE=train BENCH_BATCH=32 BENCH_PRESET=swin32_base384 \
    MMVQA_SWIN_WINDOWED=0 python bench.py
  echo "=== batch37 done $(date) ==="
} 2>&1 | tee "$LOG"
