#!/bin/bash
# Batch 32 (round 2): grouped-head attention follow-up.
# Rows: clip16 eval A/B under the new default; swin budget tuning
# (MMVQA_ATTN_GROUP_BUDGET 4MB default vs 8MB); generative-train lanes A/B.
cd /root/repo
LOG=${1:-.tpu_batch32.log}
{
  echo "=== clip16 eval b16 GROUP=auto $(date) ==="
  BENCH_MODE=eval BENCH_BATCH=16 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== clip16 eval b16 GROUP=0 $(date) ==="
  MMVQA_ATTN_PACKED_GROUP=0 BENCH_MODE=eval BENCH_BATCH=16 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== swin eval b16 BUDGET=8M $(date) ==="
  MMVQA_ATTN_GROUP_BUDGET=8388608 BENCH_PRESET=swin32_base384 \
    BENCH_MODE=eval BENCH_BATCH=16 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== swin eval b16 BUDGET=default $(date) ==="
  BENCH_PRESET=swin32_base384 BENCH_MODE=eval BENCH_BATCH=16 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== swin train b32 BUDGET=8M $(date) ==="
  MMVQA_ATTN_GROUP_BUDGET=8388608 BENCH_PRESET=swin32_base384 \
    BENCH_MODE=train BENCH_BATCH=32 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== swin train b32 BUDGET=default $(date) ==="
  BENCH_PRESET=swin32_base384 BENCH_MODE=train BENCH_BATCH=32 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== decoder_train b32 GROUP=auto $(date) ==="
  BENCH_MODE=decoder_train BENCH_BATCH=32 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== decoder_train b32 GROUP=0 $(date) ==="
  MMVQA_ATTN_PACKED_GROUP=0 BENCH_MODE=decoder_train BENCH_BATCH=32 \
    BENCH_STEPS=50 timeout 3600 python bench.py; echo rc=$?
  echo "=== t5_train b32 GROUP=auto $(date) ==="
  BENCH_MODE=t5_train BENCH_BATCH=32 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== t5_train b32 GROUP=0 $(date) ==="
  MMVQA_ATTN_PACKED_GROUP=0 BENCH_MODE=t5_train BENCH_BATCH=32 \
    BENCH_STEPS=50 timeout 3600 python bench.py; echo rc=$?
  echo "=== all done $(date) ==="
} >> "$LOG" 2>&1
