#!/bin/bash
# Post-ablation defaults validation + device-resize realdata + profile.
cd /root/repo
LOG=.tpu_batch6.log
: > $LOG
run() {
  echo "=== $1 ===" >> $LOG
  shift
  env "$@" BENCH_STEPS=20 timeout 2400 python bench.py >> $LOG 2>&1
}
run "train new-defaults (packed on, LN/opt off)" BENCH_MODE=train
run "train perhead-packed"                       BENCH_MODE=train MMVQA_ATTN_PACKED_PERHEAD=1
run "realdata device-resize"                     BENCH_MODE=realdata BENCH_DEVRESIZE=1
run "realdata host-path control"                 BENCH_MODE=realdata
run "train profile capture"                      BENCH_MODE=train MMVQA_PROFILE_DIR=/root/repo/.profiles/r2_train
# decode with chunked host loop (16 tokens per round trip + jitted
# init_cache): 8 syncs per answer batch instead of 128
# batch 32 encode HLO reproducibly breaks the remote-compile tunnel
# ("broken pipe", 3rd occurrence) — run decode at the eval batch size
run "decode greedy chunked b16"                  BENCH_MODE=decode BENCH_STEPS=9 BENCH_BATCH=16
echo "=== done ===" >> $LOG
