"""Quantify the dropped-two-way-direction failure directly on graphs.

STATUS r4's OrientationR gap (0.89 vs 0.0875 ceiling) is *consistent with*
generated scenes dropping one direction of two-way lane pairs, but the
resultant-length statistic measures within-scene yaw balance, not pairs.
This probe measures the pair structure itself: for every graph node, does
another node exist within `radius` meters whose yaw is antiparallel
(within `tol_deg`)? Reports the mean per-graph paired-node fraction for a
GT graph dir and a model graph dir — the concrete target metric for the
round-5 direction-balancing work (e.g. the rot180 corpus augmentation,
data/augment.py).

  python tools/twoway_probe.py [gt_dir] [model_dir] [n_per_side]
"""

import glob
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def paired_fraction(g, radius=12.0, tol_deg=30.0):
    """Fraction of nodes with an antiparallel partner within `radius` m."""
    nodes = list(g.nodes)
    if len(nodes) < 2:
        return None
    xy = np.array(nodes, np.float64)
    yaw = np.array([g.nodes[n].get("yaw", 0.0) for n in nodes], np.float64)
    d = np.linalg.norm(xy[:, None, :] - xy[None, :, :], axis=-1)
    # Angular distance of yaw_i to (yaw_j + pi).
    dyaw = np.abs(np.angle(np.exp(1j * (yaw[:, None] - yaw[None, :] - np.pi))))
    anti = (dyaw < np.deg2rad(tol_deg)) & (d < radius)
    np.fill_diagonal(anti, False)
    return float(anti.any(axis=1).mean())


def scan(graph_dir, limit):
    files = sorted(glob.glob(os.path.join(graph_dir, "*_graph.pickle")))
    if limit:
        files = files[:limit]
    fracs, yaws_r = [], []
    for f in files:
        with open(f, "rb") as fh:
            g = pickle.load(fh)
        p = paired_fraction(g)
        if p is not None:
            fracs.append(p)
        ys = [g.nodes[n].get("yaw", 0.0) for n in g.nodes]
        if len(ys) >= 2:
            yaws_r.append(float(np.abs(np.mean(np.exp(1j * np.array(ys))))))
    return np.array(fracs), np.array(yaws_r), len(files)


def main():
    gt_dir = sys.argv[1] if len(sys.argv) > 1 else "outputs/flagship/gt/graph"
    md_dir = (sys.argv[2] if len(sys.argv) > 2
              else "outputs/flagship/e2e5k_r4/graph")
    limit = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    for name, d in (("GT", gt_dir), ("model", md_dir)):
        fr, rr, n = scan(d, limit)
        print(
            f"{name:6s} n={n:4d}  paired-node fraction: "
            f"mean {fr.mean():.3f}  median {np.median(fr):.3f}  "
            f"frac(graphs>50% paired) {float((fr > 0.5).mean()):.3f}  |  "
            f"per-graph resultant R: mean {rr.mean():.3f}"
        )


if __name__ == "__main__":
    main()
