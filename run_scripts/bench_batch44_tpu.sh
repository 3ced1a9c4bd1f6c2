#!/bin/bash
# Batch 44 (round 4): validate the 13 MB packed-bwd VMEM budget default
# (batch43) across the non-driver train lanes whose head-block choices
# shifted (pretrain 325-token tiles, swin d=32 windows, T5 512-token
# split kernels), and A/B xla_tpu_scoped_vmem_limit_kib=32768 (the one
# XLA-option lane that measured above control in batch42: 189.3 vs
# 188.3 on the driver config, twice).  Controls re-measured same-day so
# every comparison is paired.
cd /root/repo
LOG=${1:-.tpu_batch44.log}
{
  echo "=== batch44 $(date) ==="
  echo "--- 0) pretrain control (13M default) ---"
  BENCH_MODE=pretrain BENCH_BATCH=32 python bench.py
  echo "--- 1) pretrain + vmem32M ---"
  MMVQA_XLA_OPTS="xla_tpu_scoped_vmem_limit_kib=32768" \
    BENCH_MODE=pretrain BENCH_BATCH=32 python bench.py
  echo "--- 2) swin train control (13M default) ---"
  BENCH_MODE=train BENCH_PRESET=swin32_base384 BENCH_BATCH=16 python bench.py
  echo "--- 3) swin + vmem32M ---"
  MMVQA_XLA_OPTS="xla_tpu_scoped_vmem_limit_kib=32768" \
    BENCH_MODE=train BENCH_PRESET=swin32_base384 BENCH_BATCH=16 python bench.py
  echo "--- 4) driver lane + vmem32M (re-confirm 189.3) ---"
  MMVQA_XLA_OPTS="xla_tpu_scoped_vmem_limit_kib=32768" \
    BENCH_MODE=train python bench.py
  echo "--- 5) realdata (keep the tunnel-floor proof current) ---"
  BENCH_MODE=realdata python bench.py
  echo "=== batch44 done $(date) ==="
} 2>&1 | tee "$LOG"
