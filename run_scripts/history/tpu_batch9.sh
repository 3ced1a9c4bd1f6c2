#!/bin/bash
# Batch scaling + pretrain lane (unmeasured this round) on the new defaults.
cd /root/repo
LOG=.tpu_batch9.log
: > $LOG
run() {
  echo "=== $1 ===" >> $LOG
  shift
  env "$@" timeout 2400 python bench.py >> $LOG 2>&1
}
run "train b32"        BENCH_MODE=train BENCH_BATCH=32
run "eval b64"         BENCH_MODE=eval BENCH_BATCH=64
run "pretrain b16"     BENCH_MODE=pretrain
run "train nodrop ref" BENCH_MODE=train BENCH_DROP=0
# decode chunk scaling: 95 ms per 16-token round trip is tunnel-latency
# dominated; fewer host syncs should approach the pure-compute rate
run "decode_step chunk32"  BENCH_MODE=decode_step BENCH_STEPS=15 MMVQA_DECODE_CHUNK=32
run "decode_step chunk128" BENCH_MODE=decode_step BENCH_STEPS=15 MMVQA_DECODE_CHUNK=128
echo "=== done ===" >> $LOG
