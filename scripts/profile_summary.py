"""Summarize a jax.profiler trace into a per-phase step-time breakdown.

Usage: python scripts/profile_summary.py <workdir>/profile

Reads the trace.json.gz that `train.py profile=True` captures (steps 20..30)
and prints, per StepTraceAnnotation step: total device time and the share
attributed to each jax.named_scope phase (wm_update / wm_observe /
connector_update / behavior_update, labeled in
genrl_tpu/agents/assembly.py:train_step). The remainder is window sampling,
optimizer fusions and scan bookkeeping.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys

SCOPES = ("wm_update", "wm_observe", "connector_update", "behavior_update")


def summarize(trace_path: str):
    with gzip.open(trace_path) as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    device_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e["args"].get("name", ""))
    } or {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "device" in str(e["args"].get("name", "")).lower()
    }
    step_names = set()
    scope_dur = collections.Counter()
    total_dur = 0
    for e in events:
        if e.get("ph") != "X" or e["pid"] not in device_pids:
            continue
        args = str(e.get("args") or {}) + e.get("name", "")
        for scope in SCOPES:
            if scope in args:
                scope_dur[scope] += e["dur"]
                break
        # StepTraceAnnotation rows appear as bare step numbers on the Steps line
        if e.get("name", "").isdigit():
            step_names.add(e["name"])
            total_dur += e["dur"]
    n = max(1, len(step_names))
    print(f"device steps traced: {n}")
    print(f"total device time/step: {total_dur / n / 1e3:.3f} ms")
    rest = total_dur
    for scope in SCOPES:
        if scope_dur[scope]:
            print(f"  {scope:18s} {scope_dur[scope] / n / 1e3:7.3f} ms/step")
            rest -= scope_dur[scope]
    print(f"  {'other (sampling/opt)':18s} {rest / n / 1e3:7.3f} ms/step")


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "profile"
    traces = sorted(glob.glob(f"{root}/**/*.trace.json.gz", recursive=True))
    if not traces:
        raise SystemExit(f"no trace.json.gz under {root}")
    print(f"trace: {traces[-1]}")
    summarize(traces[-1])


if __name__ == "__main__":
    main()
