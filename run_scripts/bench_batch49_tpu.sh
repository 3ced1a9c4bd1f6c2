#!/bin/bash
# Batch 49 (round 5): short-key cross-attention routing A/B.  The fusion
# image-branch CROSS attention (Sq=577 image queries, Sk=32 text keys)
# pays the pallas kernel's 128-lane key padding — 4x VPU work on the
# score family for 32 real keys, fwd and bwd, 6 layers.  Lane 1 routes
# sk<=64 & sq>=256 sites to the XLA path (tiny score tensors, ~28 MB
# fp32 at these shapes) via MMVQA_ATTN_SHORTK_XLA=1.  Control = batch48
# lane 2 / batch46 lane 0 (193.1-193.3), re-run here paired.
cd /root/repo
LOG=${1:-.tpu_batch49.log}
{
  echo "=== batch49 $(date) ==="
  echo "--- 0) control (defaults) ---"
  BENCH_MODE=train BENCH_BATCH=32 python bench.py
  echo "--- 1) short-key cross-attn -> XLA ---"
  MMVQA_ATTN_SHORTK_XLA=1 BENCH_MODE=train BENCH_BATCH=32 python bench.py
  echo "=== batch49 done $(date) ==="
} 2>&1 | tee "$LOG"
