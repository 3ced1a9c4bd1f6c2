#!/bin/bash
# Post-outage revalidation: real-kernel attention suite on hardware,
# profile capture on current defaults, decode full-pipeline retry.
cd /root/repo
LOG=.tpu_batch10.log
: > $LOG
echo "=== attention suite on TPU ===" >> $LOG
MMVQA_TPU_TESTS=1 timeout 3000 python -m pytest tests/test_attention.py -q >> $LOG 2>&1
echo "=== profile capture (current defaults) ===" >> $LOG
BENCH_MODE=train MMVQA_PROFILE_DIR=/root/repo/.profiles/r2_train_v2 \
  timeout 2400 python bench.py >> $LOG 2>&1
echo "=== decode full-pipeline retry ===" >> $LOG
BENCH_MODE=decode BENCH_STEPS=9 BENCH_BATCH=16 timeout 3000 python bench.py >> $LOG 2>&1
echo "=== fused-norm tests on TPU ===" >> $LOG
MMVQA_TPU_TESTS=1 timeout 1800 python -m pytest tests/test_fused_norm.py -q >> $LOG 2>&1
echo "=== all done ===" >> $LOG
