"""Orientation-metric diagnosis (VERDICT r2 'explain the 17x gap').

The Orientation stat (eval/map_metrics.py compute_stats) is the per-graph
mean of node yaws, Frechet-compared as a fitted Gaussian across the corpus.
This probe separates the two candidate causes of a model-vs-GT gap:
  (a) sparse-graph artifact: fewer nodes -> noisier mean -> inflated std;
  (b) genuine asymmetry: generated scenes drop lanes of two-way pairs, so
      per-graph yaws no longer cancel, inflating the mean-yaw dispersion.
It prints mean-yaw std binned by node count for both sides; matched-bin
std gaps indicate (b), a pure count-composition effect indicates (a).

Round-2 artifacts result (800-graph samples): GT std 0.81 vs model 1.53,
and the gap persists within every node-count bin (0.68-0.98 vs 1.43-1.57)
=> (b): a model-quality signal that more training should reduce, not a
metric artifact to discount.

Usage: python outputs/orientation_probe.py <gt_graph_dir> <model_graph_dir>
"""

import glob
import os
import pickle
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import networkx as nx
import numpy as np


def yaw_stats(files, transform=False, cap=800):
    rows = []
    random.seed(0)
    if len(files) > cap:
        files = random.sample(files, cap)
    for f in files:
        with open(f, "rb") as fh:
            g = pickle.load(fh)
        if transform:
            from drivescenegen_tpu.eval.map_metrics import transform_to_world_frame

            g = transform_to_world_frame(g, map_range=80.0, map_res=256)
        yaws = list(nx.get_node_attributes(g, "yaw").values())
        if yaws:
            rows.append((len(yaws), float(np.mean(yaws))))
    return np.array(rows)


def main(gt_dir, model_dir):
    gt = yaw_stats(glob.glob(f"{gt_dir}/*"))
    mdl = yaw_stats(glob.glob(f"{model_dir}/*"), transform=True)
    for name, r in (("GT", gt), ("model", mdl)):
        print(
            f"{name}: n={len(r)}, nodes/graph mean {r[:, 0].mean():.1f}, "
            f"mean_yaw mu {r[:, 1].mean():.4f} std {r[:, 1].std():.4f}"
        )
    for lo, hi in ((2, 5), (5, 10), (10, 20), (20, 100)):
        sel = gt[(gt[:, 0] >= lo) & (gt[:, 0] < hi)]
        sem = mdl[(mdl[:, 0] >= lo) & (mdl[:, 0] < hi)]
        gs = f"{sel[:, 1].std():.4f}" if len(sel) > 2 else "n/a"
        ms = f"{sem[:, 1].std():.4f}" if len(sem) > 2 else "n/a"
        print(f"nodes [{lo},{hi}): GT n={len(sel)} std={gs} | model n={len(sem)} std={ms}")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "outputs/flagship/gt/graph",
        sys.argv[2] if len(sys.argv) > 2 else "outputs/flagship/e2e5k/graph",
    )
