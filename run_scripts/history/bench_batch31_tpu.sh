#!/bin/bash
# Batch 31 (round 2): grouped-head packed attention A/B
# (MMVQA_ATTN_PACKED_GROUP=auto batches gb heads per dot_general inside the
# packed kernels — targets the swin window regime where the batch30 profile
# showed the per-head loop as 32 serialized d=32 matmuls, ~6% MXU).
# Same-batch rows: GROUP=auto vs GROUP=0 for swin eval b16, swin train b32,
# and a clip16 train b32 control.
cd /root/repo
LOG=${1:-.tpu_batch31.log}
{
  echo "=== swin eval b16 GROUP=auto $(date) ==="
  MMVQA_ATTN_PACKED_GROUP=auto BENCH_PRESET=swin32_base384 BENCH_MODE=eval \
    BENCH_BATCH=16 BENCH_STEPS=50 timeout 3600 python bench.py; echo rc=$?
  echo "=== swin eval b16 GROUP=0 $(date) ==="
  MMVQA_ATTN_PACKED_GROUP=0 BENCH_PRESET=swin32_base384 BENCH_MODE=eval \
    BENCH_BATCH=16 BENCH_STEPS=50 timeout 3600 python bench.py; echo rc=$?
  echo "=== swin train b32 GROUP=auto $(date) ==="
  MMVQA_ATTN_PACKED_GROUP=auto BENCH_PRESET=swin32_base384 BENCH_MODE=train \
    BENCH_BATCH=32 BENCH_STEPS=50 timeout 3600 python bench.py; echo rc=$?
  echo "=== swin train b32 GROUP=0 $(date) ==="
  MMVQA_ATTN_PACKED_GROUP=0 BENCH_PRESET=swin32_base384 BENCH_MODE=train \
    BENCH_BATCH=32 BENCH_STEPS=50 timeout 3600 python bench.py; echo rc=$?
  echo "=== clip16 train b32 GROUP=auto $(date) ==="
  MMVQA_ATTN_PACKED_GROUP=auto BENCH_MODE=train \
    BENCH_BATCH=32 BENCH_STEPS=50 timeout 3600 python bench.py; echo rc=$?
  echo "=== clip16 train b32 GROUP=0 $(date) ==="
  MMVQA_ATTN_PACKED_GROUP=0 BENCH_MODE=train \
    BENCH_BATCH=32 BENCH_STEPS=50 timeout 3600 python bench.py; echo rc=$?
  echo "=== all done $(date) ==="
} >> "$LOG" 2>&1
