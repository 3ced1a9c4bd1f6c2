#!/bin/bash
# Perf ablation matrix on the real TPU (ambient axon env, repo root).
# Each line: knob combo -> bench.py JSON appended to PERF_ABLATE.jsonl.
# First run of each distinct config compiles (~8-17 min via the remote
# tunnel; .jax_cache persists across reruns).
set -u
cd "$(dirname "$0")/.."

run() {
  label="$1"; shift
  echo "=== $label ===" >&2
  out=$(env "$@" python bench.py 2>/dev/null | tail -1)
  echo "{\"label\": \"$label\", \"result\": $out}" | tee -a PERF_ABLATE.jsonl
}

# round-1 baseline HLO (cast off, threefry) — expect cache hit
run train_r1_baseline   BENCH_CAST=0 BENCH_RNG=threefry
# one-time bf16 param cast
run train_cast          BENCH_CAST=1 BENCH_RNG=threefry
# + hardware rbg dropout bits
run train_cast_rbg      BENCH_CAST=1 BENCH_RNG=rbg
# dropout cost isolation
run train_cast_nodrop   BENCH_CAST=1 BENCH_RNG=rbg BENCH_DROP=0
# eval: r1 HLO vs bf16-tower
run eval_r1             BENCH_MODE=eval BENCH_CAST=0
run eval_cast           BENCH_MODE=eval BENCH_CAST=1
