#!/bin/bash
# Batch 45 (round 5): batch44's decision, re-run clean after two findings:
#  (a) batch44 lane 0 CRASHED — the 13 MB packed-bwd budget (batch43)
#      makes the pretrain fusion vision-branch attention backward pick
#      hb=2 at 325 tokens, whose REAL Mosaic stack allocation is 16.81 MB
#      > the 16 MB default scoped-vmem limit (the estimator's working-set
#      model undercounts Mosaic internals at this shape).  Fix adopted:
#      xla_tpu_scoped_vmem_limit_kib=32768 is now the TPU DEFAULT in
#      xla_compiler_options() (also measured +0.55% on the driver lane,
#      batch42, twice).
#  (b) batch44 lanes 0-2 ran concurrently with a pytest run on this
#      1-vCPU host (contaminated timing).
# So the A/B directions flip: control = NEW default (32M); the
# regression check pins the OLD 16 MB limit via env override.
# NOTHING else may run on the host during this script.
cd /root/repo
LOG=${1:-.tpu_batch45.log}
{
  echo "=== batch45 $(date) ==="
  echo "--- 0) pretrain at new default (32M) — must COMPILE and hold ~147 ---"
  BENCH_MODE=pretrain BENCH_BATCH=32 python bench.py
  echo "--- 1) swin train at new default (32M) ---"
  BENCH_MODE=train BENCH_PRESET=swin32_base384 BENCH_BATCH=16 python bench.py
  echo "--- 2) swin at old 16M limit (regression direction) ---"
  MMVQA_XLA_OPTS="xla_tpu_scoped_vmem_limit_kib=16384" \
    BENCH_MODE=train BENCH_PRESET=swin32_base384 BENCH_BATCH=16 python bench.py
  echo "--- 3) driver lane at new default (expect ~189.3) ---"
  BENCH_MODE=train python bench.py
  echo "--- 4) driver lane at old 16M limit (paired control, expect ~188.3) ---"
  MMVQA_XLA_OPTS="xla_tpu_scoped_vmem_limit_kib=16384" \
    BENCH_MODE=train python bench.py
  echo "--- 5) realdata (keep the tunnel-floor proof current) ---"
  BENCH_MODE=realdata python bench.py
  echo "=== batch45 done $(date) ==="
} 2>&1 | tee "$LOG"
