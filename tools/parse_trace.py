"""Aggregate a jax.profiler chrome trace (trace.json.gz) into per-kernel
device-time totals, so the sampler's measured time can be attributed op by
op (docs/PERF_ANALYSIS.md).

Usage: python tools/parse_trace.py <trace_root_dir> [top_n]
Finds the newest *.trace.json.gz under the root, sums durations of complete
('X') events on device lanes, groups XLA fusion names by their root op, and
prints a markdown table.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def find_trace(root: str) -> str:
    cands = glob.glob(os.path.join(root, "**", "*.trace.json.gz"), recursive=True)
    if not cands:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    return max(cands, key=os.path.getmtime)


def classify(name: str) -> str:
    """Collapse XLA kernel names into readable op families."""
    n = name.lower()
    if "conv" in n or "cudnn" in n:
        return "convolution"
    if re.search(r"\bdot\b|matmul|gemm", n):
        return "matmul"
    if "reduce-window" in n or "reduce_window" in n:
        return "reduce-window"
    if "all-reduce" in n or "psum" in n:
        return "collective"
    if "reduce" in n:
        return "reduction (GN stats etc.)"
    if "scatter" in n:
        return "scatter"
    if "gather" in n or "dynamic-slice" in n:
        return "gather/slice"
    if "transpose" in n or "copy" in n or "bitcast" in n:
        return "layout/copy"
    if "rng" in n or "threefry" in n:
        return "rng"
    if "fusion" in n or "loop" in n:
        return "elementwise fusion"
    if "infeed" in n or "outfeed" in n or "transfer" in n:
        return "host transfer"
    return "other: " + name.split(".")[0][:40]


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "outputs/trace_b8"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    path = find_trace(root)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # Device lanes: pid/tid metadata names containing TPU/device; fall back
    # to any lane whose events carry XLA-looking names.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if re.search(r"tpu|device|/device:", n, re.I)}

    totals = defaultdict(float)
    counts = defaultdict(int)
    kernel_totals = defaultdict(float)
    wall = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "?")
        fam = classify(name)
        totals[fam] += dur
        counts[fam] += 1
        kernel_totals[name] += dur
        wall += dur

    if not totals:
        raise SystemExit(f"no device events found in {path} "
                         f"(pids seen: {sorted(pid_names.items())[:10]})")

    print(f"trace: {path}\ntotal device-op time: {wall/1e3:.1f} ms\n")
    print("| op family | ms | % | events |")
    print("|---|---|---|---|")
    for fam, t in sorted(totals.items(), key=lambda kv: -kv[1]):
        print(f"| {fam} | {t/1e3:.1f} | {100*t/wall:.1f}% | {counts[fam]} |")

    print(f"\ntop {top_n} kernels:")
    print("| kernel | ms | % |")
    print("|---|---|---|")
    for name, t in sorted(kernel_totals.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"| `{name[:80]}` | {t/1e3:.1f} | {100*t/wall:.1f}% |")


if __name__ == "__main__":
    main()
