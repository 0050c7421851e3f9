"""Per-stage timing of the stage-2 vectorization on model-output rasters:
mask -> skeleton -> despeckle -> connect_graph (BFS/merge) -> graph-fit
passes -> agents. Identifies where the model-output per-image cost goes
(VERDICT r3 target: <=0.5 s/image).

Usage: python outputs/stage2_profile.py <png_dir> [n]
"""

import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from PIL import Image

from drivescenegen_tpu.ops.morphology import skeletonize
from drivescenegen_tpu.vectorize import image_utils, network
from drivescenegen_tpu.vectorize.graph_fit import extract_polylines_from_img
from drivescenegen_tpu.vectorize.agents import extract_agents


def main(png_dir: str, n: int = 24):
    files = sorted(glob.glob(os.path.join(png_dir, "*.png")))
    # Spread over the set (early loops differ from late ones).
    files = files[:: max(1, len(files) // n)][:n]
    stages = {k: 0.0 for k in ("mask", "skel", "despeckle", "graph", "fit", "agents")}
    slow = []
    # warm the skeletonize jit
    skeletonize(np.zeros((256, 256), bool))

    for f in files:
        img01 = np.asarray(Image.open(f)).astype(np.float32) / 255.0
        t0 = time.perf_counter()
        mask = image_utils.get_lane_mask(img01)
        t1 = time.perf_counter()
        skel = np.asarray(skeletonize(np.ascontiguousarray(mask.T) > 0))
        t2 = time.perf_counter()
        skel_d = network.despeckle(skel)
        t3 = time.perf_counter()
        g = network.connect_graph(skel_d, 4)
        t4 = time.perf_counter()
        lanes, dg = extract_polylines_from_img(
            img01, map_range=80.0, skel=skel_d, min_distance=4
        )
        t5 = time.perf_counter()
        extract_agents(img01, lanes)
        t6 = time.perf_counter()
        stages["mask"] += t1 - t0
        stages["skel"] += t2 - t1
        stages["despeckle"] += t3 - t2
        stages["graph"] += t4 - t3
        stages["fit"] += t5 - t4  # includes its own graph build (double count
        # vs 'graph'; 'graph' isolates the BFS/merge share)
        stages["agents"] += t6 - t5
        total = t6 - t0
        if total > 1.0:
            slow.append((os.path.basename(f), round(total, 2), g.number_of_nodes()))

    n_done = len(files)
    print(f"{n_done} images; per-image averages (ms):")
    for k, v in stages.items():
        print(f"  {k:10s} {1000 * v / n_done:8.1f}")
    print("slow (>1s):", slow)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 24)
