#!/bin/bash
# Batch 43 (round 4): driver-config (b16) lanes for VERDICT item 2.
#   0) control b16 + fresh xplane profile (floor-table input at the
#      driver's own batch — the v2 decomposition was b32)
#   1) packed-bwd VMEM budget bump: the image self-attention BACKWARD
#      (584x640 fp32 score family + dropout bits) estimates 12.2 MB at
#      hb=2 > the 10 MB _BWD_VMEM_BUDGET, so it falls back to the
#      split layout and pays the [B,577,12,64] relayout copies the
#      packed family exists to kill.  The chip has ~16 MB scoped VMEM
#      and Mosaic re-checks at lowering — a 13 MB budget may simply
#      compile.  (VERDICT r3 item 2 / NOTES_ROUND3 "BSHD-native".)
#   2) same + xla_tpu_scoped_vmem_limit_kib=32768 and a 24 MB budget:
#      if the hardware knob actually widens scoped VMEM, hb=2 fits with
#      room to spare.
#   3) latency-hiding scheduler at b16 (b32 lane lives in batch42).
cd /root/repo
LOG=${1:-.tpu_batch43.log}
{
  echo "=== batch43 $(date) ==="
  echo "--- 0) control b16 + profile ---"
  MMVQA_PROFILE_DIR=.profiles/r4_train_b16 BENCH_MODE=train python bench.py
  echo "--- 1) packed-bwd budget 13M ---"
  MMVQA_ATTN_BWD_BUDGET=13631488 BENCH_MODE=train python bench.py
  echo "--- 2) packed-bwd budget 24M + scoped vmem 32M ---"
  MMVQA_ATTN_BWD_BUDGET=25165824 \
    MMVQA_XLA_OPTS="xla_tpu_scoped_vmem_limit_kib=32768" \
    BENCH_MODE=train python bench.py
  echo "--- 3) LHS b16 ---"
  MMVQA_XLA_OPTS="xla_tpu_enable_latency_hiding_scheduler=true" \
    BENCH_MODE=train python bench.py
  echo "=== batch43 done $(date) ==="
} 2>&1 | tee "$LOG"
