"""Stitch the 70k-corpus decoded sidecar from the existing 40k sidecar plus
a fresh decode of the 30k widened-family rasters.

The decoded-corpus sidecar (data/dataset.py:158-209) is keyed by the sorted
file list + decode params; building the 70k one from scratch costs ~55 min of
1-core PNG decode. But the 70k corpus is [40k originals] + [30k new] where
the symlink names in ras70k preserve both groups' sort order (originals keep
their basenames; new ones get a "w_" prefix that sorts after "0_".."3_"), so
rows 0..39999 of the 70k sidecar are EXACTLY the 40k sidecar and only the 30k
tail needs decoding (~20 min). Verified at the end by calling decoded_corpus
on the real dataset and asserting it picks the stitched file up.

Usage (host-only, no device touched):
    python tools/stitch_sidecar70k.py <r4_cfg_yaml>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from drivescenegen_tpu.config import load_config
from drivescenegen_tpu.data.dataset import (
    RasterDataset,
    decoded_corpus,
    sidecar_path,
)


def _find_cache(dirname, shape, dtype):
    """Shape/dtype-matched .devcache scan (digest-agnostic: the source dirs'
    own caches are keyed by their own file lists)."""
    for f in sorted(os.listdir(dirname)):
        if not f.startswith(".devcache_"):
            continue
        try:
            m = np.load(os.path.join(dirname, f), mmap_mode="r")
        except Exception:
            continue
        if m.shape == shape and m.dtype == dtype:
            return m, os.path.join(dirname, f)
    return None, None


def main(cfg_path: str) -> None:
    cfg = load_config(cfg_path)
    ds = RasterDataset(
        cfg.train.dataset_glob,
        img_res=cfg.model.sample_size,
        n_channels=cfg.model.in_channels + cfg.model.cond_channels,
        cache=False,
        raw="auto",
    )
    n = len(ds)
    sample0 = ds[0]
    # Same keying expression as decoded_corpus (shared helper).
    cache_path = sidecar_path(ds.files, ds.img_res, ds.n_channels, sample0.dtype)
    if os.path.exists(cache_path):
        print(f"stitch: sidecar already present: {cache_path}")
        return

    # Locate the 40k sidecar by shape match among existing caches.
    n_old = sum(1 for f in ds.files if "/w_" not in f)
    old_dir = os.path.dirname(os.path.realpath(ds.files[0]))
    old, old_path = _find_cache(old_dir, (n_old, *sample0.shape), sample0.dtype)
    full = np.empty((n, *sample0.shape), dtype=sample0.dtype)
    if old is not None:
        # The first n_old sorted ras70k entries are symlinks to the SAME
        # basenames the old sidecar was built from, in the same sort order.
        assert all("/w_" not in f for f in ds.files[:n_old])
        print(f"stitch: reusing {old_path} for rows 0..{n_old - 1}")
        np.copyto(full[:n_old], old)
        start = n_old
    else:
        print("stitch: no reusable head sidecar found; decoding the head")
        start = 0
    # The widened tail may also have a rasterization-time sidecar
    # (data_rasterization --save_sidecar) in its own source dir.
    if start == n_old and n_old < n:
        tail_dir = os.path.dirname(os.path.realpath(ds.files[n_old]))
        tail, tail_path = _find_cache(
            tail_dir, (n - n_old, *sample0.shape), sample0.dtype
        )
        if tail is not None:
            print(f"stitch: reusing {tail_path} for rows {n_old}..{n - 1}")
            np.copyto(full[n_old:], tail)
            start = n
    for i in range(start, n):
        full[i] = ds[i]
        if (i - start) % 2048 == 0:
            print(f"stitch: decoded {i}/{n}", flush=True)
    np.save(cache_path, full)
    del full
    m = decoded_corpus(ds)  # must print "using sidecar <cache_path>"
    assert m.shape == (n, *sample0.shape), m.shape
    print(f"stitch: done, {cache_path} {m.shape} {m.dtype}")


if __name__ == "__main__":
    main(sys.argv[1])
