#!/bin/bash
# Round-2 train-lane measurements after the fused-LN bwd fix:
#   1. default (fused AdamW + packed attn w/ split fallback on image self)
#   2. per-head VMEM accounting (packed attn everywhere, incl. image self
#      w/ dropout) — errors fast at Mosaic lowering if the allocator does
#      not reuse loop buffers, in which case ignore this row.
#   3. decode bench (VERDICT #4 — never completed; retry at batch 32)
#   4. realdata train (VERDICT #5)
cd /root/repo
LOG=.tpu_batch4.log
: > $LOG

echo "=== train fused-opt (default) ===" >> $LOG
BENCH_MODE=train BENCH_STEPS=20 timeout 1800 python bench.py >> $LOG 2>&1
echo "=== train perhead-packed ===" >> $LOG
MMVQA_ATTN_PACKED_PERHEAD=1 BENCH_MODE=train BENCH_STEPS=20 \
  timeout 1800 python bench.py >> $LOG 2>&1
echo "=== decode greedy ===" >> $LOG
BENCH_MODE=decode BENCH_STEPS=9 timeout 1800 python bench.py >> $LOG 2>&1
echo "=== realdata train ===" >> $LOG
BENCH_MODE=realdata BENCH_STEPS=20 timeout 1800 python bench.py >> $LOG 2>&1
echo "=== done rc=$? ===" >> $LOG
