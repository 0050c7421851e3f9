"""Node-count gate tradeoff: rejection rate vs FD table.

The max_graph_nodes plausibility gate (VectorizeConfig) rejects fragmented
non-scene graphs. This tool calibrates it from GT-side data only: the
roundtrip vectorization of 2000 GT rasters never exceeds 16 nodes, so any
"ok" model graph far above that is sampler junk that passed the mask-density
gate, not a plausible dense scene. For each candidate gate it reports the
composed rejection rate and the FD table of the surviving population vs the
cached GT stats — making the quality/rejection tradeoff explicit instead of
tuning a threshold on model outputs.

Usage: python tools/gate_tradeoff.py <run_dir> [gate ...]
       (default gates: 1500 100 50 32 20)
"""

from __future__ import annotations

import glob
import json
import os
import pickle
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drivescenegen_tpu.eval.map_metrics import (  # noqa: E402
    STATS_NAMES,
    compute_map_metrics,
    compute_map_stats,
)


def main():
    run_dir = sys.argv[1] if len(sys.argv) > 1 else "outputs/flagship/e2e5k_r4"
    gates = [int(g) for g in sys.argv[2:]] or [1500, 100, 50, 32, 20]

    stats_json = json.load(open(os.path.join(run_dir, "vectorization_stats.json")))
    n_images = stats_json["n_images"]
    n_rejected = stats_json["n_rejected"] + stats_json["n_failed"]

    gt_dir = "outputs/flagship/gt/metrics_world"
    gt_stats = np.load(os.path.join(gt_dir, "stats.npy"))
    gt_degrees = np.load(os.path.join(gt_dir, "degrees.npy"))
    gt_spectrum = np.load(os.path.join(gt_dir, "spectrum.npy"))

    files = sorted(glob.glob(os.path.join(run_dir, "graph", "*.pickle")))
    counts = np.array([pickle.load(open(f, "rb")).number_of_nodes() for f in files])
    print(f"{run_dir}: {len(files)} ok graphs; node count "
          f"mean {counts.mean():.1f} p99 {np.percentile(counts, 99):.0f} "
          f"max {counts.max()}")
    print(f"(roundtrip-on-GT calibration: max 16 nodes over 2000 rasters)")

    rows = []
    for gate in gates:
        keep = [f for f, c in zip(files, counts) if c <= gate]
        rej = (n_rejected + (len(files) - len(keep))) / n_images
        with tempfile.TemporaryDirectory() as td:
            st, deg, spec = compute_map_stats(
                keep, td, map_range=80.0, map_res=256, verbose=False)
            fds, mmd_d, mmd_s = compute_map_metrics(
                gt_stats, gt_degrees, gt_spectrum, st, deg, spec, verbose=False)
        rows.append((gate, len(keep), rej, fds, mmd_d, mmd_s))

    hdr = ["gate", "n_ok", "rej%"] + STATS_NAMES + ["MMDdeg", "MMDspec"]
    print("\t".join(hdr))
    for gate, n_ok, rej, fds, mmd_d, mmd_s in rows:
        cells = [str(gate), str(n_ok), f"{rej * 100:.1f}"]
        cells += [f"{v:.3f}" for v in fds] + [f"{mmd_d:.4f}", f"{mmd_s:.4f}"]
        print("\t".join(cells))


if __name__ == "__main__":
    main()
