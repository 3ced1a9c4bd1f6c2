#!/bin/bash
# Batch 42 (round 4): the driver-scored clip16 train lane (VERDICT r3
# item 2 — "move or formally floor").  Three untried levers in one batch:
#   0) control + fresh xplane profile (the floor table's input — the last
#      clip16 decomposition is the round-2 v2 profile at 183 ms)
#   1) per-chip batch sweep 24/40/48 (b32 has been assumed since round 1;
#      swin's sweep found b16 > b32 under HBM pressure)
#   2) XLA compiler-option sweep via MMVQA_XLA_OPTS (never tried: the
#      remote axon compile path ignores client XLA_FLAGS, so flags are
#      threaded as jit compiler_options — trainer.xla_compiler_options).
#      Unknown-flag lanes may fail; each lane is independent.
cd /root/repo
LOG=${1:-.tpu_batch42.log}
{
  echo "=== batch42 $(date) ==="
  echo "--- 0) clip16 train b32 control + profile ---"
  MMVQA_PROFILE_DIR=.profiles/r4_train BENCH_MODE=train BENCH_BATCH=32 python bench.py
  echo "--- 1a) b24 ---"
  BENCH_MODE=train BENCH_BATCH=24 python bench.py
  echo "--- 1b) b40 ---"
  BENCH_MODE=train BENCH_BATCH=40 python bench.py
  echo "--- 1c) b48 ---"
  BENCH_MODE=train BENCH_BATCH=48 python bench.py
  echo "--- 2a) latency-hiding scheduler ---"
  MMVQA_XLA_OPTS="xla_tpu_enable_latency_hiding_scheduler=true" \
    BENCH_MODE=train BENCH_BATCH=32 python bench.py
  echo "--- 2b) scoped vmem 32M ---"
  MMVQA_XLA_OPTS="xla_tpu_scoped_vmem_limit_kib=32768" \
    BENCH_MODE=train BENCH_BATCH=32 python bench.py
  echo "--- 2c) scoped vmem 48M ---"
  MMVQA_XLA_OPTS="xla_tpu_scoped_vmem_limit_kib=49152" \
    BENCH_MODE=train BENCH_BATCH=32 python bench.py
  echo "--- 2d) LHS + vmem 32M ---"
  MMVQA_XLA_OPTS="xla_tpu_enable_latency_hiding_scheduler=true,xla_tpu_scoped_vmem_limit_kib=32768" \
    BENCH_MODE=train BENCH_BATCH=32 python bench.py
  echo "=== batch42 done $(date) ==="
} 2>&1 | tee "$LOG"
