#!/bin/bash
# Multi-chip dryrun INCLUDING the production-shape (384², b=8/chip, dp8)
# compile check (VERDICT r2 item 1c).  ~6.5 min extra on this 1-vCPU host,
# so it is env-gated out of the driver's default dryrun; run this once per
# round and commit the log under result/.
cd "$(dirname "$0")/.."
MMVQA_DRYRUN_PROD=1 exec python __graft_entry__.py --dryrun "${1:-8}"
