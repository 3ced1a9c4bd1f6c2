#!/bin/bash
# Multi-chip dryrun INCLUDING the production-shape (384², b=8/chip, dp8)
# compile check (VERDICT r2 item 1c) AND the pallas+shard_map production
# compile on the real chip (VERDICT r3 item 3).  ~6.5 min extra on this
# 1-vCPU host, so it is env-gated out of the driver's default dryrun; run
# once per round and `git add -f` the log under result/ (result/ is
# gitignored for metrics dirs; evidence logs are force-added).
cd "$(dirname "$0")/.."
MMVQA_DRYRUN_PROD=1 python __graft_entry__.py --dryrun "${1:-8}" || exit $?
# second lane: ambient axon process = the real TPU chip, mesh(1)
exec python __graft_entry__.py --prod-pallas
