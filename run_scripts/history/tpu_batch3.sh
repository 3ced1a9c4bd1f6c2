#!/bin/bash
# Round-2 perf batch: fused optimizer + packed-attention fallback.
# Serial TPU runs (single chip; never concurrent with pytest — 1-vCPU host).
cd /root/repo
LOG=.tpu_batch3.log
: > $LOG

echo "=== train fused-opt ===" >> $LOG
BENCH_MODE=train BENCH_STEPS=20 timeout 1800 python bench.py >> $LOG 2>&1
echo "=== train fwd-budget 15M (packed image self-attn fwd) ===" >> $LOG
MMVQA_ATTN_FWD_BUDGET=15728640 BENCH_MODE=train BENCH_STEPS=20 \
  timeout 1800 python bench.py >> $LOG 2>&1
echo "=== eval ===" >> $LOG
BENCH_MODE=eval BENCH_STEPS=20 timeout 1200 python bench.py >> $LOG 2>&1
echo "=== decode ===" >> $LOG
BENCH_MODE=decode BENCH_STEPS=9 timeout 1800 python bench.py >> $LOG 2>&1
echo "=== realdata ===" >> $LOG
BENCH_MODE=realdata BENCH_STEPS=60 timeout 2400 python bench.py >> $LOG 2>&1
echo "=== done rc=$? ===" >> $LOG
