#!/bin/bash
# Batch 29 (round-2 close-out): re-confirm the driver-visible default
# lanes from a virgin shell on an idle host, in one batch so rows are
# comparable (cross-batch tunnel variance ±15%).  No profiled lanes.
cd /root/repo
LOG=${1:-.tpu_batch29.log}
{
  echo "=== DEFAULT train lane (exactly what the driver runs) $(date) ==="
  timeout 3600 python bench.py; echo rc=$?
  echo "=== eval control $(date) ==="
  BENCH_MODE=eval timeout 3600 python bench.py; echo rc=$?
  echo "=== production greedy decode headline (b512, 12-token cap, full memory) $(date) ==="
  BENCH_MODE=decode BENCH_BATCH=512 BENCH_DECODE_MAXLEN=12 \
    MMVQA_DECODE_CHUNK=12 BENCH_DECODE_MEMORY=full BENCH_STEPS=30 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== T5 beam headline (b128, t5_max_length=12) $(date) ==="
  BENCH_MODE=t5_beam BENCH_BATCH=128 BENCH_T5_MAXLEN=12 BENCH_STEPS=20 \
    timeout 3600 python bench.py; echo rc=$?
  echo "=== all done $(date) ==="
} >> "$LOG" 2>&1
