"""Summarize a jax.profiler trace (from tools/profile_step.py) without
TensorBoard: per-HLO-category device time and the top ops, straight from the
trace.json.gz the TPU runtime writes.

This is the data behind PROFILE.md's "where the time goes" tables — the
workflow is `profile_step --out /tmp/trace` then `summarize_trace /tmp/trace
--iters 5` (divide by the loop count profile_step ran).

Usage:
    python -m cerberusdet_tpu.tools.summarize_trace /tmp/trace \
        [--iters 5] [--top 20] [--min-ms 0.2]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def load_events(trace_dir: str):
    pat = os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz")
    files = sorted(glob.glob(pat))
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    events = data["traceEvents"]
    device_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "device:" in e.get("args", {}).get("name", "")
    }
    return [e for e in events
            if e.get("ph") == "X" and e.get("pid") in device_pids
            and "hlo_category" in e.get("args", {})]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--iters", type=int, default=1,
                   help="loop count the trace ran (divides all times)")
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--min-ms", type=float, default=0.2,
                   help="per-iteration cutoff for the top-op list")
    args = p.parse_args(argv)

    events = load_events(args.trace_dir)
    k = args.iters * 1000.0  # us -> ms and per-iteration
    bycat = collections.defaultdict(float)
    byop = collections.defaultdict(lambda: [0.0, 0, ""])
    for e in events:
        cat = e["args"]["hlo_category"]
        bycat[cat] += e["dur"]
        op = byop[(cat, e["name"])]
        op[0] += e["dur"]
        op[1] += 1
        op[2] = e["args"].get("long_name", "")[:140]

    total = sum(bycat.values())
    print(f"device busy: {total / k:.1f} ms/iter "
          f"({len(events)} events / {args.iters} iters)")
    print("\nby category:")
    for c, d in sorted(bycat.items(), key=lambda kv: -kv[1]):
        print(f"{d / k:9.2f} ms/iter  {d / total * 100:5.1f}%  {c}")

    print(f"\ntop ops (>= {args.min_ms} ms/iter):")
    shown = 0
    for (c, n), (d, cnt, ln) in sorted(byop.items(), key=lambda kv: -kv[1][0]):
        if d / k < args.min_ms or shown >= args.top:
            break
        shown += 1
        print(f"{d / k:8.3f} ms/iter x{cnt:<4d} [{c}] {n}")
        print(f"          {ln}")


if __name__ == "__main__":
    main()
