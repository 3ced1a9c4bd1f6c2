#!/usr/bin/env python
"""Summarize a jax.profiler xplane dump: per-op-family device time.

Usage: python run_scripts/analyze_xplane.py <dir-or-.xplane.pb> [n_steps]

Aggregates XLA-op events on the device plane(s) by fusion family so the
per-step cost table in PERF.md can be regenerated after each perf change.
"""

import collections
import glob
import os
import re
import sys


def load_xspace(path):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        from xprof.protobuf import xplane_pb2  # fallback location
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


FAMILIES = [
    # the pallas attention custom-calls surface under their kernel value
    # names (%self.N / %attn.N / %cross.N) on this backend, not as
    # "custom-call" (round-5 fix: they all landed in "other")
    ("attention-kernel", re.compile(
        r"fused_attention|pallas|custom-call|^%?(self|attn|cross)\.")),
    ("gemm/conv", re.compile(r"^(%?)(dot|conv|gemm)|fusion.*dot|convolution")),
    ("optimizer", re.compile(r"multiply_add|adam|update")),
    ("layernorm", re.compile(r"reduce.*(add|mean)|norm")),
    ("copy/layout", re.compile(r"copy|transpose|bitcast")),
    ("convert/cast", re.compile(r"convert")),
]


def classify(name, metadata_name):
    label = (metadata_name or name).lower()
    for fam, pat in FAMILIES:
        if pat.search(label):
            return fam
    return "other"


def main():
    target = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else None
    if os.path.isdir(target):
        pbs = sorted(glob.glob(os.path.join(
            target, "**", "*.xplane.pb"), recursive=True))
        target = pbs[-1]
    print(f"# {target}")
    xs = load_xspace(target)

    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        # steps in the capture window -> per-step division.  Prefer the
        # "XLA Modules" line (one event per executed program) over
        # "Steps": under the axon remote-execution backend the Steps
        # line carries sub-step launch events (round 5: a 5-step trace
        # reported 200 "steps", scaling every per-step number down 40x
        # — result/r5_batch47b_profile.log).  Filter modules to the
        # dominant program so warmup/eval jits don't inflate the count.
        steps = None
        mods = next((l for l in plane.lines if l.name == "XLA Modules"),
                    None)
        if mods is not None and mods.events:
            per_prog = collections.Counter()
            for ev in mods.events:
                meta = plane.event_metadata.get(ev.metadata_id)
                per_prog[meta.name if meta else ev.metadata_id] += 1
            steps = max(per_prog.values())
        if steps is None:
            steps = next((len(l.events) for l in plane.lines
                          if l.name == "Steps"), None)
        div = n_steps or steps or 1
        for lname in ("XLA Ops", "Async XLA Ops"):
            line = next((l for l in plane.lines if l.name == lname), None)
            if line is None:
                continue
            fam_tot = collections.Counter()
            op_tot = collections.Counter()
            total = 0.0
            for ev in line.events:
                meta = ev_meta.get(ev.metadata_id)
                name = meta.name if meta else str(ev.metadata_id)
                dur = ev.duration_ps / 1e9  # ms
                fam = classify(name, getattr(meta, "display_name", ""))
                fam_tot[fam] += dur
                op_tot[name] += dur
                total += dur
            if total == 0:
                continue
            print(f"\n== {plane.name} / {lname}: {total/div:.2f} ms/step "
                  f"over {div} steps (async events overlap each other)")
            for fam, ms in fam_tot.most_common():
                print(f"  {fam:20s} {ms/div:8.2f} ms  {100*ms/total:5.1f}%")
            print("  -- top ops --")
            for name, ms in op_tot.most_common(12):
                print(f"  {ms/div:8.2f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
