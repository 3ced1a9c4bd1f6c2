#!/bin/bash
# On-TPU test lane (VERDICT r1 #6): run the @pytest.mark.tpu tests plus a
# numerics smoke subset on the real axon backend, so kernel/precision
# regressions are caught where they matter (the CPU suite runs the
# interpreter).  Run from the repo root in the ambient axon env.
#
# MMVQA_TPU_TESTS=1 disables the conftest CPU re-exec.
set -u
cd "$(dirname "$0")/.."

echo "== @tpu-marked tests (kernel statistics etc.) =="
MMVQA_TPU_TESTS=1 python -m pytest tests -m tpu -q "$@"
rc1=$?

echo "== fused-vs-XLA numerics smoke on hardware =="
MMVQA_TPU_TESTS=1 python -m pytest tests/test_attention.py -q "$@"
rc2=$?

exit $(( rc1 || rc2 ))
