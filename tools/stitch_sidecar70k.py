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
from drivescenegen_tpu.data.dataset import RasterDataset, decoded_corpus


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
    # Same keying expression as decoded_corpus (data/dataset.py:172-178).
    import hashlib

    digest = hashlib.sha1(
        ("\n".join(ds.files) + f"|{ds.img_res}|{ds.n_channels}"
         + f"|{sample0.dtype}").encode()
    ).hexdigest()[:16]
    cache_path = os.path.join(
        os.path.dirname(ds.files[0]), f".devcache_{digest}.npy"
    )
    if os.path.exists(cache_path):
        print(f"stitch: sidecar already present: {cache_path}")
        return

    # Locate the 40k sidecar by shape match among existing caches.
    n_old = sum(1 for f in ds.files if "/w_" not in f)
    old_dir = os.path.dirname(os.path.realpath(ds.files[0]))
    old = None
    for f in sorted(os.listdir(old_dir)):
        if not f.startswith(".devcache_"):
            continue
        try:
            m = np.load(os.path.join(old_dir, f), mmap_mode="r")
        except Exception:
            continue
        if m.shape == (n_old, *sample0.shape) and m.dtype == sample0.dtype:
            old = m
            print(f"stitch: reusing {os.path.join(old_dir, f)} for rows 0..{n_old - 1}")
            break
    full = np.empty((n, *sample0.shape), dtype=sample0.dtype)
    if old is not None:
        # The first n_old sorted ras70k entries are symlinks to the SAME
        # basenames the old sidecar was built from, in the same sort order.
        assert all("/w_" not in f for f in ds.files[:n_old])
        np.copyto(full[:n_old], old)
        start = n_old
    else:
        print("stitch: no reusable sidecar found; decoding everything")
        start = 0
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
