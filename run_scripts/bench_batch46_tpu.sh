#!/bin/bash
# Batch 46 (round 5): drive the driver lane from ~189 toward 195-200
# (VERDICT r4 item 2: 200 samples/s = 5x the conservative A6000 bracket
# end).  Levers untested at the new 32M-scoped-vmem default:
#   - fwd attention head-block budget 12M -> 24M (wider hb on the
#     577-token self-attention forward; the bwd equivalent was measured
#     saturated at 13M, but the FWD budget has never been raised)
#   - bf16 Adam moments (MMVQA_OPT_MOMENTS_DTYPE=bfloat16): cuts the
#     ~260M-param optimizer HBM stream 28 -> 20 B/param/step; the GEMM
#     family floor prices ~9 ms of AdamW traffic, so this is worth
#     ~+1.5-2% if HBM-bound.  Numerics knob (documented in optim.py) —
#     A/B only, NOT a default candidate without a convergence check.
# Paired: control re-measured in the same session.  Nothing else may
# run on the host during this script (1 vCPU).
cd /root/repo
LOG=${1:-.tpu_batch46.log}
{
  echo "=== batch46 $(date) ==="
  echo "--- 0) driver control (new 32M default) ---"
  BENCH_MODE=train BENCH_BATCH=32 python bench.py
  echo "--- 1) fwd attn budget 24M ---"
  MMVQA_ATTN_FWD_BUDGET=25165824 BENCH_MODE=train BENCH_BATCH=32 python bench.py
  echo "--- 2) bf16 Adam moments ---"
  MMVQA_OPT_MOMENTS_DTYPE=bfloat16 BENCH_MODE=train BENCH_BATCH=32 python bench.py
  echo "--- 3) both ---"
  MMVQA_ATTN_FWD_BUDGET=25165824 MMVQA_OPT_MOMENTS_DTYPE=bfloat16 \
    BENCH_MODE=train BENCH_BATCH=32 python bench.py
  echo "=== batch46 done $(date) ==="
} 2>&1 | tee "$LOG"
