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
  env "$@" timeout 2400 python bench.py >> $LOG 2>&1
}
# BENCH_STEPS=100: the profile showed steps run gapless on-device at
# 99.3 ms while the 20-step window carried ~390 ms of fixed tunnel/dispatch
# overhead (~19 ms/step); 100 steps amortize it to ~4 ms/step.
run "train base (optax, packed)"      BENCH_MODE=train BENCH_STEPS=100
run "train leaf-fused"                BENCH_MODE=train BENCH_STEPS=100 BENCH_FUSED_OPT=1
run "train leaf-fused + perhead"      BENCH_MODE=train BENCH_STEPS=100 BENCH_FUSED_OPT=1 MMVQA_ATTN_PACKED_PERHEAD=1
run "train perhead only"              BENCH_MODE=train BENCH_STEPS=100 MMVQA_ATTN_PACKED_PERHEAD=1
run "eval base"                       BENCH_MODE=eval BENCH_STEPS=100
run "eval perhead"                    BENCH_MODE=eval BENCH_STEPS=100 MMVQA_ATTN_PACKED_PERHEAD=1
# decode: the pallas-attention encode HLO reproducibly breaks the
# remote-compile service (broken pipe, 3 attempts); XLA attention is
# within 3% end-to-end at these sizes and compiles — measure with it.
run "decode greedy xla-attn b16"      BENCH_MODE=decode BENCH_STEPS=9 BENCH_BATCH=16 BENCH_ATTN=xla
echo "=== done ===" >> $LOG
