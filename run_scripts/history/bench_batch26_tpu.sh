#!/bin/bash
# Batch 26 (round 2): production-realistic greedy decode (12-token cap,
# the decoder recipe's max_answer_length) + swin-train profile LAST
# (profiled lanes congest the tunnel into the next lane — batch23 rule).
cd /root/repo
LOG=${1:-.tpu_batch26.log}
{
  echo "=== decode b128 maxlen12 (production answers) $(date) ==="
  BENCH_MODE=decode BENCH_BATCH=128 BENCH_DECODE_MAXLEN=12 \
    MMVQA_DECODE_CHUNK=12 BENCH_STEPS=30 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== decode b128 maxlen12 FULL memory $(date) ==="
  BENCH_MODE=decode BENCH_BATCH=128 BENCH_DECODE_MAXLEN=12 \
    MMVQA_DECODE_CHUNK=12 BENCH_DECODE_MEMORY=full BENCH_STEPS=30 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== swin train b16 PROFILED (last lane) $(date) ==="
  BENCH_PRESET=swin32_base384 BENCH_MODE=train BENCH_BATCH=16 BENCH_STEPS=50 \
    MMVQA_PROFILE_DIR=.profiles/r2_swin_train timeout 3600 python bench.py
  echo rc=$?
  echo "=== all done $(date) ==="
} >> "$LOG" 2>&1
