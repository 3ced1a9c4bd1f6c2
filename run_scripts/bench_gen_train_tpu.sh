#!/bin/bash
# Generative-head fine-tune TRAIN benches on the real TPU (ambient axon env).
# First compile of each lane is 8-17 min through the remote-compile tunnel
# (.jax_cache persists); timeouts are sized for a cold cache.
cd /root/repo
LOG=${1:-.tpu_batch19.log}
{
  echo "=== decoder_train b32 $(date) ==="
  BENCH_MODE=decoder_train BENCH_BATCH=32 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== t5_train b32 $(date) ==="
  BENCH_MODE=t5_train BENCH_BATCH=32 BENCH_STEPS=50 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== all done $(date) ==="
} >> "$LOG" 2>&1
