"""Raster-level two-way-pair check: does the MODEL RASTER already lack the
second direction, or does the vectorizer lose it?

Under the per-scene MinMax dx/dy normalization (ops/map_processing.py),
exactly antiparallel directions get exactly complementary lane colors:
c_rot = color_max - c per channel (proved + tested in
tests/test_augment.py). So a two-way pair is visible in the raster as two
nearby lane pixels with complementary R/G. For a sample of lane pixels
per image, measure the fraction that have a complementary-colored lane
pixel within `radius_m` — on GT rasters vs model-sample rasters. If the
model fraction is as low image-side as the 4% graph-side pairing
(tools/twoway_probe.py), the model never draws the second ribbon and the
vectorizer is exonerated at the raster level too.

color_max / background / map_range come from the raster config (ADVICE
r4: the inline 0.99 constant would silently under-count pairs under a
different raster config); override with --cfg_file or the flags below.

  python tools/raster_pair_probe.py [gt_dir] [model_dir] [n_images] \
      [--cfg_file cfg.yaml] [--color_max X] [--mask_tol X] [--pair_tol X]
"""

import argparse
import glob
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def image_pair_fraction(img01, radius_m=12.0, map_range=80.0,
                        tol=0.10, n_sample=200, rng=None,
                        color_max=0.99, background=0.5, mask_tol=0.1):
    """Fraction of sampled lane pixels with an antiparallel-colored lane
    pixel within radius. Returns None for (near-)empty lane masks."""
    H = img01.shape[0]
    px_per_m = H / map_range
    radius_px = radius_m * px_per_m
    rg = img01[..., :2]
    mask = np.abs(rg - background).max(-1) > mask_tol
    ys, xs = np.nonzero(mask)
    if len(ys) < 50:
        return None
    rng = rng or np.random.default_rng(0)
    sel = rng.choice(len(ys), size=min(n_sample, len(ys)), replace=False)
    pos = np.stack([ys, xs], 1).astype(np.float32)
    col = rg[ys, xs]  # [N, 2]
    comp = color_max - col[sel]  # complementary color of each sampled pixel
    hits = 0
    for k, i in enumerate(sel):
        d = np.abs(pos - pos[i]).max(-1)  # chebyshev is fine at this tol
        near = (d < radius_px) & (d > 2.0)
        if not near.any():
            continue
        dc = np.abs(col[near] - comp[k]).max(-1)
        hits += bool((dc < tol).any())
    return hits / len(sel)


def scan(d, limit, pattern="*.png", **kw):
    files = sorted(glob.glob(os.path.join(d, pattern)))[:limit]
    fr = []
    for f in files:
        img = np.asarray(Image.open(f).convert("RGB")).astype(np.float32) / 255.0
        p = image_pair_fraction(img, **kw)
        if p is not None:
            fr.append(p)
    return np.array(fr), len(files)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("gt_dir", nargs="?",
                    default="outputs/flagship/ras140k/GT_70k_s80_dxdy_agents_img")
    ap.add_argument("model_dir", nargs="?",
                    default="outputs/flagship/e2e5k_r5/diffusion")
    ap.add_argument("n_images", nargs="?", type=int, default=200)
    ap.add_argument("--cfg_file", default=None,
                    help="raster config source for color_max/background/"
                         "map_range (defaults from the default config tree)")
    ap.add_argument("--color_max", type=float, default=None)
    ap.add_argument("--mask_tol", type=float, default=0.1)
    ap.add_argument("--pair_tol", type=float, default=0.10)
    args = ap.parse_args()

    from drivescenegen_tpu.config import load_config

    raster = load_config(args.cfg_file).raster
    kw = dict(
        color_max=(args.color_max if args.color_max is not None
                   else raster.color_max),
        background=raster.background,
        map_range=raster.map_range,
        mask_tol=args.mask_tol,
        tol=args.pair_tol,
    )
    print(f"probe params: {kw}")
    for name, d in (("GT rasters", args.gt_dir), ("model rasters", args.model_dir)):
        fr, n = scan(d, args.n_images, **kw)
        if not len(fr):
            print(f"{name:14s} n=0/{n:4d}  (no images with a usable lane mask)")
            continue
        print(f"{name:14s} n={len(fr):4d}/{n:4d}  paired-pixel fraction: "
              f"mean {fr.mean():.3f}  median {np.median(fr):.3f}  "
              f"frac(img>50%) {float((fr > 0.5).mean()):.3f}")


if __name__ == "__main__":
    main()
