#!/bin/bash
# Ablation: isolate the 156.5 -> 124 train regression.  The da9fc44
# measurement (156.5/s) predates packed attention, fused LN, and fused
# AdamW; batch4 measured all three ON at 124/s.  Rows toggle one at a time.
# Run with an idle host (no concurrent pytest).
cd /root/repo
LOG=.tpu_batch5.log
: > $LOG
run() {
  echo "=== $1 ===" >> $LOG
  shift
  env "$@" BENCH_MODE=train BENCH_STEPS=20 timeout 1800 python bench.py >> $LOG 2>&1
}
run "all-off (da9fc44 config)" MMVQA_FUSED_LN=0 BENCH_FUSED_OPT=0 MMVQA_ATTN_PACKED=0
run "fused-LN only"            MMVQA_FUSED_LN=1 BENCH_FUSED_OPT=0 MMVQA_ATTN_PACKED=0
run "fused-opt only"           MMVQA_FUSED_LN=0 BENCH_FUSED_OPT=1 MMVQA_ATTN_PACKED=0
run "packed-attn only"         MMVQA_FUSED_LN=0 BENCH_FUSED_OPT=0 MMVQA_ATTN_PACKED=1
echo "=== done ===" >> $LOG
# decode retry (VERDICT #4): compiles ~20-30 min through the remote tunnel
# (init-at-batch-1 + encode + per-token step HLOs), so give it an hour.
echo "=== decode greedy (retry, 3600s) ===" >> $LOG
BENCH_MODE=decode BENCH_STEPS=9 timeout 3600 python bench.py >> $LOG 2>&1
echo "=== all done ===" >> $LOG
