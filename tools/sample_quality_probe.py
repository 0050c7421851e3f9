"""Quality-over-training probe: vectorize the trainer's per-epoch eval
samples (outputs/flagship/model/samples/NNN.png — one fixed-seed scene per
save, scripts/train.py:53-84) host-side and log a trajectory of the
production rejection gates.

Gives an early, chip-free signal of when the model's samples stop being
speckle (the round-2/3 failure mode: 38% rejection at the 60k-step budget)
without waiting for the end-of-training harvest.

Usage:
  JAX_PLATFORMS=cpu python tools/sample_quality_probe.py [samples_dir] [--loop]

Appends one JSON line per sample to <samples_dir>/../quality_probe.jsonl and
prints a table. Safe to re-run: already-probed files are skipped by name.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # never touch the busy TPU
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def probe_one(path: str, map_range: float = 80.0) -> dict:
    from PIL import Image

    from drivescenegen_tpu.config import VectorizeConfig
    from drivescenegen_tpu.scripts.vectorization import vectorize
    from drivescenegen_tpu.vectorize.image_utils import get_lane_mask, to_float01

    from scipy import ndimage

    img01 = to_float01(np.asarray(Image.open(path).convert("RGB")))
    mask = get_lane_mask(img01)
    # Speckle diagnostic (the round-2/3 failure mode): a usable sample has a
    # few large connected lane components; garbage is thousands of <15 px dots.
    labels, n_comp = ndimage.label(mask, structure=np.ones((3, 3)))
    sizes = np.bincount(labels.ravel())[1:] if n_comp else np.array([0])
    rec = {
        "file": os.path.basename(path),
        "mask_frac": round(float(mask.mean()), 4),
        "n_components": int(n_comp),
        "max_component_px": int(sizes.max()) if sizes.size else 0,
        "n_tiny_components": int((sizes < 15).sum()),
    }
    vcfg = VectorizeConfig()
    t0 = time.perf_counter()
    try:
        lanes, graph, agents, _ = vectorize(img01, map_range=map_range, vcfg=vcfg)
        rec["vectorize_s"] = round(time.perf_counter() - t0, 2)
        if lanes is None:
            rec["outcome"] = "rejected"
        else:
            rec["outcome"] = "ok"
            rec["n_lanes"] = len(lanes)
            rec["n_graph_nodes"] = int(graph.number_of_nodes()) if hasattr(
                graph, "number_of_nodes") else None
            rec["n_agents"] = len(agents) if agents is not None else 0
    except Exception as e:  # a probe must never crash the loop
        rec["vectorize_s"] = round(time.perf_counter() - t0, 2)
        rec["outcome"] = f"error:{type(e).__name__}"
    return rec


def step_for(path: str, train_log: str) -> int | None:
    """Map a sample file to the training step it was written at, via the
    trainer log's 'epoch N: sample -> ...NNN.png' lines and the nearest
    preceding 'step S/T' line."""
    try:
        base = os.path.basename(path)
        last_step = None
        with open(train_log) as f:
            for line in f:
                m = re.search(r"step (\d+)/\d+", line)
                if m:
                    last_step = int(m.group(1))
                if base in line and "sample ->" in line:
                    return last_step
    except OSError:
        pass
    return None


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    loop = "--loop" in sys.argv
    samples_dir = args[0] if args else "outputs/flagship/model/samples"
    out_path = os.path.join(os.path.dirname(samples_dir.rstrip("/")),
                            "quality_probe.jsonl")
    train_log = "outputs/flagship/train_r4.log"

    while True:
        seen = set()
        if os.path.exists(out_path):
            with open(out_path) as f:
                seen = {json.loads(l)["file"] for l in f if l.strip()}
        todo = [p for p in sorted(glob.glob(os.path.join(samples_dir, "*.png")))
                if os.path.basename(p) not in seen]
        for p in todo:
            rec = probe_one(p)
            rec["step"] = step_for(p, train_log)
            with open(out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)
        if not loop:
            break
        time.sleep(300)


if __name__ == "__main__":
    main()
