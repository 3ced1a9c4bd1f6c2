#!/bin/bash
# Convergence gate (round-end): the calibrated overfit lanes — every
# training lane driven to ~1.0 scores on tiny fixtures.  ~1h on the
# 1-vCPU host; the default `pytest tests/` tier covers learning with
# reduced-step smoke lanes instead (tests/test_learning_smoke.py).
# Never run concurrently with TPU jobs (1 vCPU).
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -m convergence -q "$@"
