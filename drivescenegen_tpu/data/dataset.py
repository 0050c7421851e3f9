"""Training dataset: rasterized scene images -> device-ready batches.

Replaces the reference's torch Image_Dataset + DataLoader
(utils/datasets/dataset.py:15-50): glob image files, normalize to [-1, 1]
((x - 0.5) / 0.5, matching transforms.Normalize([0.5],[0.5])), shuffle each
epoch, and prefetch batches on a background thread so host IO overlaps
device compute.
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np


def load_image(path: str, img_res: int = 256, n_channels: int = 3) -> np.ndarray:
    """Load one sample as float32 (H, W, n_channels) in [0, 1]."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".npy",):
        arr = np.load(path)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        arr = arr.astype(np.float32)
    else:
        from PIL import Image

        img = Image.open(path).convert("L" if n_channels == 1 else "RGB")
        if img.size != (img_res, img_res):
            # The reference trains on 512 PNGs resized to 256 with
            # antialias=False (dataset.py:21-24); nearest keeps hard dots.
            img = img.resize((img_res, img_res), Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None] if n_channels == 1 else np.stack([arr] * 3, axis=-1)
    return arr[..., :n_channels]


class RasterDataset:
    """Glob-based image dataset, normalized to [-1, 1].

    cache=True memoizes decoded images in RAM so multi-epoch training
    doesn't re-decode PNGs on every pass — this host has few cores and the
    decode would otherwise starve the device.

    raw="auto"/True yields uint8 [0, 255] samples instead of normalized
    float32; the train step normalizes ON DEVICE ((x/127.5) - 1, exactly
    equal for 8-bit sources). This shrinks the host->device batch transfer
    4x — decisive when the device link is a narrow tunnel (measured ~20
    MB/s on the axon backend: a float32 batch costs more wall time than
    the train step it feeds). "auto" enables raw iff every source file is
    a PNG (8-bit), so float .npy datasets keep full precision."""

    def __init__(self, pattern: str, img_res: int = 256, n_channels: int = 3,
                 cache: bool = False, raw=False):
        self.files: Sequence[str] = sorted(glob.glob(pattern))
        if not self.files:
            raise FileNotFoundError(f"no files match {pattern!r}")
        self.img_res = img_res
        self.n_channels = n_channels
        if raw == "auto":
            raw = all(f.lower().endswith(".png") for f in self.files)
        self.raw = bool(raw)
        self._cache: Optional[list] = [None] * len(self.files) if cache else None

    def __len__(self) -> int:
        return len(self.files)

    def _load(self, idx: int) -> np.ndarray:
        x = load_image(self.files[idx], self.img_res, self.n_channels)
        if self.raw:
            return np.clip(np.round(x * 255.0), 0, 255).astype(np.uint8)
        return x  # float32 in [0, 1]

    def __getitem__(self, idx: int) -> np.ndarray:
        if self._cache is not None:
            if self._cache[idx] is None:
                x = self._load(idx)
                # float sources cache as float16 (~halves RAM; 10-bit
                # mantissa >= the 8-bit source precision).
                self._cache[idx] = x if self.raw else x.astype(np.float16)
            x = self._cache[idx]
        else:
            x = self._load(idx)
        if self.raw:
            return x  # uint8; normalization happens on device
        return (x.astype(np.float32) - 0.5) / 0.5


def batch_iterator(
    dataset: RasterDataset,
    batch_size: int,
    seed: int = 0,
    num_epochs: Optional[int] = None,
    drop_remainder: bool = True,
    prefetch: int = 4,
    num_threads: int = 8,
) -> Iterator[np.ndarray]:
    """Shuffled, threaded, prefetching batch iterator of [B, H, W, 3]."""

    def index_stream():
        rng = np.random.default_rng(seed)
        epoch = 0
        while num_epochs is None or epoch < num_epochs:
            order = rng.permutation(len(dataset))
            end = len(order) - (len(order) % batch_size if drop_remainder else 0)
            for i in range(0, end, batch_size):
                yield order[i : i + batch_size]
            epoch += 1

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def load_batch(idxs):
        if num_threads > 1 and len(idxs) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(num_threads) as ex:
                samples = list(ex.map(dataset.__getitem__, idxs))
        else:
            samples = [dataset[i] for i in idxs]
        out = np.stack(samples)
        # uint8 passes through untouched (device-side normalization path).
        return out if out.dtype == np.uint8 else out.astype(np.float32)

    def worker():
        try:
            for idxs in index_stream():
                if stop.is_set():
                    return
                q.put(load_batch(idxs))
        finally:
            q.put(None)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    try:
        while True:
            batch = q.get()
            if batch is None:
                return
            yield batch
    finally:
        stop.set()
        # Drain so the worker's blocked put() releases. Guard against
        # interpreter teardown, where module globals may already be None.
        try:
            while True:
                q.get_nowait()
        except Exception:
            pass


def sidecar_path(files: Sequence[str], img_res: int, n_channels: int,
                 dtype) -> str:
    """Digest-keyed sidecar path for a decoded corpus.

    One keying expression shared by every producer/consumer of sidecars
    (decoded_corpus, the rasterization-time writer in
    scripts/data_rasterization.py, tools/stitch_sidecar70k.py). Paths are
    normalized so a config glob spelled "./outputs/x/*.png" and a build
    script spelled "outputs/x" key the same corpus.
    """
    import hashlib

    norm = [os.path.normpath(f) for f in files]
    digest = hashlib.sha1(
        ("\n".join(norm) + f"|{img_res}|{n_channels}"
         + f"|{np.dtype(dtype)}").encode()
    ).hexdigest()[:16]
    return os.path.join(os.path.dirname(files[0]), f".devcache_{digest}.npy")


def decoded_corpus(dataset: RasterDataset, chunk: int = 1024) -> np.ndarray:
    """Decode the whole dataset to one [N, H, W, C] host array, backed by a
    persistent sidecar file.

    PNG decode of a 40k-image corpus costs ~30 min on a 1-core host, paid
    again on every crash-recovery relaunch. The sidecar is keyed by the file
    list + decode params, so corpus edits invalidate it; device_put streams
    straight off the mmap. Callable standalone (see __main__) to prebuild a
    corpus sidecar on the host while the chip is busy with another run —
    and data_rasterization --save_sidecar writes it at rasterization time
    (the arrays are in memory pre-PNG-encode), skipping this decode
    entirely on a fresh host.
    """
    n = len(dataset)
    sample0 = dataset[0]
    cache_path = sidecar_path(
        dataset.files, dataset.img_res, dataset.n_channels, sample0.dtype
    )
    if os.path.exists(cache_path):
        try:
            m = np.load(cache_path, mmap_mode="r")
            if m.shape == (n, *sample0.shape) and m.dtype == sample0.dtype:
                print(f"decoded_corpus: using sidecar {cache_path}", flush=True)
                return m
        except Exception:
            pass
    # Digest miss: adopt a shape/dtype-matched sidecar left under an older
    # key (e.g. built before sidecar_path normalized file paths — ADVICE
    # r4: a key-expression change must not silently orphan a multi-GB cache
    # and re-pay the ~30-min 1-core decode). Renamed once to the current
    # key; shape+dtype is the integrity check (same N files, res, channels).
    cache_dir = os.path.dirname(cache_path)
    for f in sorted(os.listdir(cache_dir) if os.path.isdir(cache_dir) else []):
        if not f.startswith(".devcache_") or not f.endswith(".npy"):
            continue
        old_path = os.path.join(cache_dir, f)
        if old_path == cache_path:
            continue
        try:
            m = np.load(old_path, mmap_mode="r")
            if m.shape == (n, *sample0.shape) and m.dtype == sample0.dtype:
                del m
                os.replace(old_path, cache_path)
                print(
                    f"decoded_corpus: adopted old-key sidecar {old_path} "
                    f"-> {cache_path}", flush=True,
                )
                return np.load(cache_path, mmap_mode="r")
        except Exception:
            continue
    full = np.empty((n, *sample0.shape), dtype=sample0.dtype)
    full[0] = sample0
    for i in range(1, n, chunk):
        for j in range(i, min(i + chunk, n)):
            full[j] = dataset[j]
        # logger, not just print: the message lands in the trainer's rotating
        # log file, giving the supervise stall watchdog a liveness signal.
        # A 40k-image decode takes >30 min on a 1-core host with no other log
        # writes, which the watchdog otherwise reads as a hung device op and
        # kills mid-decode — before the sidecar is saved — so every relaunch
        # restarts the decode from zero and dies the same way (observed
        # live). Per-chunk logging is a truthful signal: a genuinely stuck
        # decode stops emitting it.
        import logging

        logging.getLogger("data").info(f"decoded_corpus: decoded {min(i + chunk - 1, n)}/{n}")
        if (i - 1) % (chunk * 8) == 0:
            print(f"decoded_corpus: decoded {i + chunk - 1}/{n}", flush=True)
    try:
        np.save(cache_path, full)
    except OSError:
        pass  # disk-constrained host: decode again next time
    return full


def array_to_device(full: np.ndarray, mesh, label: str = "dataset_to_device"):
    """Ship a host array (often a sidecar mmap) to device HBM in ~200 MB
    chunks via a donated dynamic_update_slice buffer — one giant device_put
    stalls the narrow axon tunnel (>35 min observed for 7.9 GB) and chunked
    put + concatenate transiently needs 2x the corpus in HBM."""
    import time as _time

    import jax
    import jax.numpy as jnp
    from functools import partial

    from drivescenegen_tpu.parallel.mesh import replicated

    t0 = _time.perf_counter()
    n = full.shape[0]
    sharding = replicated(mesh)
    bytes_per = int(np.prod(full.shape[1:])) * full.dtype.itemsize
    up_chunk = max(1, min(n, (200 * 1024 * 1024) // max(bytes_per, 1)))

    @partial(jax.jit, donate_argnums=0)
    def _write(buf, part, start):
        return jax.lax.dynamic_update_slice_in_dim(buf, part, start, axis=0)

    data = jax.device_put(
        jnp.zeros((n, *full.shape[1:]), dtype=full.dtype), sharding
    )
    i = 0
    while i < n:
        if n - i < up_chunk:
            # Tail: re-send the LAST up_chunk rows (the overlap rewrites
            # identical data) so the compiled program is reused.
            i = n - up_chunk
        part = np.ascontiguousarray(full[i : i + up_chunk])
        data = _write(data, jax.device_put(part, sharding), i)
        i += up_chunk
        # logger (not print): lands in the trainer's rotating log file, so
        # the supervise stall watchdog sees liveness during the ~20-min
        # upload over a narrow device link.
        import logging

        logging.getLogger("data").info(f"{label}: uploaded {min(i, n)}/{n}")
        print(f"{label}: uploaded {min(i, n)}/{n}", flush=True)
    data.block_until_ready()
    gb = data.size * data.dtype.itemsize / 1e9
    print(
        f"{label}: {n} samples ({gb:.2f} GB, {data.dtype}) "
        f"in {_time.perf_counter() - t0:.1f}s", flush=True,
    )
    return data


def dataset_to_device(dataset: RasterDataset, mesh, chunk: int = 1024):
    """Upload the whole dataset to device HBM as one [N, H, W, C] array.

    The TPU-native answer to a narrow host->device link: a 24k-scene uint8
    raster set is only ~4.6 GB — it fits beside the model in HBM, so it is
    transferred ONCE and each train step ships 16 int32 indices instead of a
    3 MB batch (the measured tunnel sustains only a few MB/s, which capped
    training at ~2 steps/s host-bound; device-resident data removes the
    input pipeline entirely).

    The full array is assembled HOST-side and shipped as ONE device_put:
    a per-chunk upload + jnp.concatenate briefly needs 2x the dataset in
    HBM (the chunks plus the concatenated copy), which for a 7.9 GB corpus
    next to the model state overflows a 16 GB v5e. Host RAM is the cheap
    side (chunked decode keeps the PNG->array staging bounded)."""
    full = decoded_corpus(dataset, chunk=chunk)
    return array_to_device(full, mesh)


def hybrid_device_data(dataset: RasterDataset, mesh, budget_bytes: int,
                       seed: int = 0):
    """Resident-pool split for corpora larger than the HBM budget.

    A random (seeded) subset of R = budget // bytes_per_sample samples is
    uploaded once; the rest streams from the decoded-corpus sidecar mmap.
    Returns (data_dev [R,...], pool_idx [R], tail_idx [N-R], full_mmap).
    The per-step mixing ratio that keeps every sample equally visited per
    epoch is k_tail/batch = (N-R)/N (see hybrid_index_batches); on the
    measured ~6 MB/s axon link a 50k/20k split at 256² sustains the full
    ~90 samples/s device rate (tail traffic ≈ 5 MB/s) where host-feeding
    everything runs at a third of that."""
    full = decoded_corpus(dataset)
    n = len(dataset)
    bytes_per = int(np.prod(full.shape[1:])) * full.dtype.itemsize
    r = max(1, min(n, int(budget_bytes) // max(bytes_per, 1)))
    order = np.random.default_rng(seed).permutation(n)
    pool_idx = np.sort(order[:r])
    tail_idx = np.sort(order[r:])
    pool = full[pool_idx] if r < n else full  # fancy-index copy, host RAM
    data_dev = array_to_device(pool, mesh, label="hybrid_device_data[pool]")
    return data_dev, pool_idx, tail_idx, full


def hybrid_index_batches(n_pool: int, n_tail: int, batch_size: int,
                         seed: int = 0, align: int = 1):
    """Endless (pool_slots [k_res], tail_slots [k_str]) int32 batches with
    FIXED split sizes (one compiled step for the whole run), shuffled per
    epoch so every sample — resident or streamed — is visited exactly once
    per epoch (up to the dropped remainder). `align` rounds the tail count
    to a multiple of the mesh data-axis width so the streamed sub-batch
    itself shards evenly."""
    n = n_pool + n_tail
    k_str = int(round(batch_size * n_tail / n))
    if n_tail > 0:
        k_str = min(max(k_str, 1), batch_size - 1)
    if align > 1 and k_str % align:
        k_str = min(
            ((k_str + align - 1) // align) * align, batch_size - align
        )
    k_res = batch_size - k_str
    rng = np.random.default_rng(seed)
    while True:
        pool_order = rng.permutation(n_pool)
        tail_order = rng.permutation(n_tail) if n_tail else np.empty(0, np.int64)
        n_batches = pool_order.size // k_res
        if k_str:
            n_batches = min(n_batches, tail_order.size // k_str)
        for b in range(n_batches):
            yield (
                pool_order[b * k_res : (b + 1) * k_res].astype(np.int32),
                tail_order[b * k_str : (b + 1) * k_str].astype(np.int32),
            )


def index_batches(
    n: int, batch_size: int, seed: int = 0, drop_remainder: bool = True
) -> Iterator[np.ndarray]:
    """Endless per-epoch-shuffled index batches — the exact sample order
    batch_iterator would produce (same rng stream), as int32 index arrays
    for the device-resident-data train step."""
    rng = np.random.default_rng(seed)
    while True:
        order = rng.permutation(n)
        end = n - (n % batch_size if drop_remainder else 0)
        for i in range(0, end, batch_size):
            yield order[i : i + batch_size].astype(np.int32)


def prefetch_to_device(iterator, mesh, depth: int = 2):
    """Keep `depth` batches already transferred (and sharded over the mesh
    "data" axis) ahead of the consumer, overlapping host->HBM DMA with the
    device step — the HBM-prefetch stage the reference's file-based pipeline
    lacks (SURVEY.md §2.3)."""
    import collections

    from drivescenegen_tpu.parallel.mesh import shard_batch

    buf = collections.deque()
    for batch in iterator:
        buf.append(shard_batch(mesh, batch))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


if __name__ == "__main__":
    # Prebuild a config's decoded-corpus sidecar on the host (no device
    # touched), so a later device_data training launch skips the ~30-min
    # decode: python -m drivescenegen_tpu.data.dataset --cfg_file <yaml>
    import argparse

    from drivescenegen_tpu.config import load_config

    _p = argparse.ArgumentParser(description="Prebuild decoded-corpus sidecar")
    _p.add_argument("--cfg_file", required=True, type=str)
    _a = _p.parse_args()
    _cfg = load_config(_a.cfg_file)
    _ds = RasterDataset(
        _cfg.train.dataset_glob,
        img_res=_cfg.model.sample_size,
        n_channels=_cfg.model.in_channels + _cfg.model.cond_channels,
        cache=False,
        raw="auto",
    )
    _full = decoded_corpus(_ds)
    print(f"sidecar ready: {_full.shape} {_full.dtype}")
