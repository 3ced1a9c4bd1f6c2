#!/bin/bash
# Batch 33 (round 2 close-out): post-grouping follow-ups.
# 0) defaults validation (plain `python bench.py` — exactly what the driver
#    runs), 1) decode + t5_beam headline refresh (grouped kernels now
#    default in the encode phase), 2) group-budget 16MB probe (swin won
#    4->8MB +2.8%; does 16 help? clip16 image tiles would group at gb=2 —
#    VMEM-risk experiment, a compile failure is an acceptable outcome),
# 3) one batch-scaling spot row (swin eval b32), 4) PROFILED swin train LAST (trace flush
#    congests the tunnel into any following lane — NOTES_ROUND3 hazard).
cd /root/repo
LOG=${1:-.tpu_batch33.log}
{
  echo "=== defaults validation: plain python bench.py (driver lane) $(date) ==="
  timeout 3600 python bench.py; echo rc=$?
  echo "=== eval default b16 $(date) ==="
  BENCH_MODE=eval BENCH_STEPS=100 timeout 3600 python bench.py; echo rc=$?
  echo "=== decode greedy b512 maxlen12 full-memory (headline refresh) $(date) ==="
  BENCH_MODE=decode BENCH_BATCH=512 BENCH_DECODE_MAXLEN=12 \
    BENCH_DECODE_MEMORY=full BENCH_STEPS=30 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== t5_beam b128 maxlen12 (headline refresh) $(date) ==="
  BENCH_MODE=t5_beam BENCH_BATCH=128 BENCH_T5_MAXLEN=12 BENCH_STEPS=30 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== swin train b32 budget 16MB probe $(date) ==="
  MMVQA_ATTN_GROUP_BUDGET=16777216 BENCH_PRESET=swin32_base384 \
    BENCH_MODE=train BENCH_BATCH=32 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== clip16 train b32 budget 16MB probe (image tiles gb=2; may fail VMEM) $(date) ==="
  MMVQA_ATTN_GROUP_BUDGET=16777216 BENCH_MODE=train BENCH_BATCH=32 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== swin eval b32 $(date) ==="
  BENCH_PRESET=swin32_base384 BENCH_MODE=eval BENCH_BATCH=32 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== pretrain b32 (refresh) $(date) ==="
  BENCH_MODE=pretrain BENCH_BATCH=32 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== PROFILED swin train b32 (LAST) $(date) ==="
  MMVQA_PROFILE_DIR=.profiles/r2_swin_train_grouped BENCH_PRESET=swin32_base384 \
    BENCH_MODE=train BENCH_BATCH=32 BENCH_STEPS=30 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== all done $(date) ==="
} >> "$LOG" 2>&1
