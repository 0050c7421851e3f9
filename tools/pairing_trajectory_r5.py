"""Pairing-over-training trajectory for the r5 flagship eval samples.

For each per-epoch eval sample (fixed seed -> same x_T every epoch), report:
  - lane-mask fraction (the production noise gate's key statistic: dense
    speckle reads ~1.0, clean scenes ~0.02-0.10);
  - paired-pixel fraction (tools/raster_pair_probe.py) — meaningful ONLY
    once the mask fraction is scene-like, since dense noise pairs by chance
    (measured 0.975 on the pure-noise epoch-1 sample).

Usage: python tools/pairing_trajectory_r5.py [samples_dir]
"""
import glob
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from raster_pair_probe import image_pair_fraction  # noqa: E402

BACKGROUND = 0.5
MASK_TOL = 0.1


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "outputs/flagship/model_r5/samples"
    files = sorted(glob.glob(os.path.join(d, "*.png")))
    if not files:
        raise SystemExit(f"no samples under {d}")
    print(f"{'sample':>8} {'mask_frac':>10} {'paired':>8}  verdict")
    for f in files:
        img = np.asarray(Image.open(f).convert("RGB")).astype(np.float32) / 255.0
        rg = img[..., :2]
        mask = np.abs(rg - BACKGROUND).max(-1) > MASK_TOL
        mf = float(mask.mean())
        p = image_pair_fraction(img)
        scene_like = mf < 0.25  # the production noise gate's threshold
        verdict = "scene-like" if scene_like else "noise (pairing not meaningful)"
        ps = f"{p:8.3f}" if p is not None else "   (n/a)"
        print(f"{os.path.basename(f):>8} {mf:10.3f} {ps}  {verdict}")


if __name__ == "__main__":
    main()
