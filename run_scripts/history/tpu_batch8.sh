#!/bin/bash
# Validate flipped defaults + decode_step measurement.
cd /root/repo
LOG=.tpu_batch8.log
: > $LOG
run() {
  echo "=== $1 ===" >> $LOG
  shift
  env "$@" timeout 2400 python bench.py >> $LOG 2>&1
}
run "train defaults (leaf-fused+perhead)" BENCH_MODE=train
run "decode_step b16"                     BENCH_MODE=decode_step BENCH_STEPS=15
run "realdata new defaults"               BENCH_MODE=realdata BENCH_STEPS=100
echo "=== done ===" >> $LOG
