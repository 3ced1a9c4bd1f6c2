#!/bin/bash
# Batch 35 (round 3): realdata overlap A/B + pretrain MFU row.
# 0) train control (window normalization vs batch34),
# 1) realdata overlap ON vs OFF back-to-back (same tunnel window),
# 2) pretrain b32 rerun — bench.py now derives MFU from the XLA-audited
#    778.8 GF/sample (flops_audit.py).
cd /root/repo
LOG=${1:-.tpu_batch35.log}
{
  echo "=== batch35 $(date) ==="
  echo "--- 0) train control b32 ---"
  BENCH_MODE=train BENCH_BATCH=32 python bench.py
  echo "--- 1a) realdata b32 overlap=1 ---"
  BENCH_MODE=realdata BENCH_BATCH=32 BENCH_STEPS=40 python bench.py
  echo "--- 1b) realdata b32 overlap=0 ---"
  BENCH_MODE=realdata BENCH_BATCH=32 BENCH_STEPS=40 BENCH_OVERLAP=0 python bench.py
  echo "--- 2) pretrain b32 (MFU row) ---"
  BENCH_MODE=pretrain BENCH_BATCH=32 python bench.py
  echo "=== batch35 done $(date) ==="
} 2>&1 | tee "$LOG"
