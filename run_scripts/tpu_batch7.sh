#!/bin/bash
# Round-2 batch 7: leaf-fused optimizer + perhead packing, 2x2 within-batch
# ablation (cross-batch tunnel variance is +-15%, so only same-batch rows
# are comparable), plus eval rows.
cd /root/repo
LOG=.tpu_batch7.log
: > $LOG
run() {
  echo "=== $1 ===" >> $LOG
  shift
  env "$@" BENCH_STEPS=20 timeout 2400 python bench.py >> $LOG 2>&1
}
run "train base (optax, packed)"      BENCH_MODE=train
run "train leaf-fused"                BENCH_MODE=train BENCH_FUSED_OPT=1
run "train leaf-fused + perhead"      BENCH_MODE=train BENCH_FUSED_OPT=1 MMVQA_ATTN_PACKED_PERHEAD=1
run "train perhead only"              BENCH_MODE=train MMVQA_ATTN_PACKED_PERHEAD=1
run "eval base"                       BENCH_MODE=eval
run "eval perhead"                    BENCH_MODE=eval MMVQA_ATTN_PACKED_PERHEAD=1
echo "=== done ===" >> $LOG
