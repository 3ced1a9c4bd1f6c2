#!/bin/bash
# Fast smoke tier: <2 minutes on this 1-vCPU host (VERDICT r2 item 5).
# Covers config composition, metric semantics, TP/FSDP partition rules,
# tiny-shape kernel parity, pallas-under-GSPMD partitioning, and one
# trainer step per head (marked fast inside the heavier modules).
# The full suite (`python -m pytest tests/ -q`, ~14 min) stays the
# round-end gate.
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -m fast -q "$@"
