import numpy as np
import pytest
from PIL import Image

from drivescenegen_tpu.config import MeshConfig
from drivescenegen_tpu.data.dataset import (
    RasterDataset,
    batch_iterator,
    load_image,
    prefetch_to_device,
)
from drivescenegen_tpu.parallel import make_mesh


@pytest.fixture()
def png_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(10):
        arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"{i}.png")
    return tmp_path


def test_dataset_normalization(png_dir):
    ds = RasterDataset(str(png_dir / "*.png"), img_res=64)
    assert len(ds) == 10
    x = ds[0]
    assert x.shape == (64, 64, 3)
    assert -1.0 <= x.min() and x.max() <= 1.0
    # (x*0.5+0.5)*255 recovers the stored bytes.
    raw = np.asarray(Image.open(ds.files[0]), np.float32)
    np.testing.assert_allclose((x * 0.5 + 0.5) * 255, raw, atol=0.51)


def test_load_image_resizes(png_dir):
    x = load_image(str(png_dir / "0.png"), img_res=32)
    assert x.shape == (32, 32, 3)


def test_batch_iterator_epochs_and_shuffle(png_dir):
    ds = RasterDataset(str(png_dir / "*.png"), img_res=64)
    batches = list(batch_iterator(ds, batch_size=4, seed=0, num_epochs=2))
    # 10 samples, batch 4, drop remainder -> 2 batches/epoch x 2 epochs.
    assert len(batches) == 4
    assert all(b.shape == (4, 64, 64, 3) for b in batches)
    # Different seed -> different order.
    b2 = list(batch_iterator(ds, batch_size=4, seed=1, num_epochs=1))
    assert not np.allclose(batches[0], b2[0])


def test_prefetch_to_device_shards(png_dir, eight_devices):
    ds = RasterDataset(str(png_dir / "*.png"), img_res=64)
    mesh = make_mesh(MeshConfig())
    it = prefetch_to_device(
        batch_iterator(ds, batch_size=8, seed=0, num_epochs=2), mesh, depth=2
    )
    batches = list(it)
    assert len(batches) == 2  # 1 batch/epoch x 2 epochs
    for b in batches:
        assert len(b.sharding.device_set) == 8
        assert {s.data.shape for s in b.addressable_shards} == {(1, 64, 64, 3)}


def test_dataset_raw_uint8_path(png_dir):
    """raw mode: uint8 pass-through whose device-side normalization
    (x/127.5 - 1) equals the float path exactly for 8-bit sources."""
    ds_raw = RasterDataset(str(png_dir / "*.png"), img_res=64, raw="auto")
    ds_f32 = RasterDataset(str(png_dir / "*.png"), img_res=64)
    assert ds_raw.raw is True
    x8 = ds_raw[0]
    assert x8.dtype == np.uint8
    np.testing.assert_allclose(
        x8.astype(np.float32) / 127.5 - 1.0, ds_f32[0], atol=1e-6
    )


def test_batch_iterator_preserves_uint8(png_dir):
    from drivescenegen_tpu.data.dataset import batch_iterator

    ds = RasterDataset(str(png_dir / "*.png"), img_res=64, raw=True, cache=True)
    it = batch_iterator(ds, batch_size=4, num_epochs=1)
    b = next(it)
    assert b.dtype == np.uint8 and b.shape == (4, 64, 64, 3)


def test_index_batches_matches_batch_iterator_order(png_dir):
    """The device-resident-data path must see the exact sample sequence the
    host-fed path would (same rng stream), so switching paths mid-training
    via --resume does not change the data distribution."""
    from drivescenegen_tpu.data.dataset import batch_iterator, index_batches

    ds = RasterDataset(str(png_dir / "*.png"), img_res=64, raw=True)
    host_it = batch_iterator(ds, batch_size=4, seed=7, num_epochs=2,
                             num_threads=1)
    idx_it = index_batches(len(ds), batch_size=4, seed=7)
    for host_batch in host_it:
        idxs = next(idx_it)
        gathered = np.stack([ds[int(i)] for i in idxs])
        np.testing.assert_array_equal(host_batch, gathered)


def test_dataset_to_device_roundtrip(png_dir, eight_devices):
    """Uploading the dataset to (virtual) devices preserves bytes, and a
    gather by index equals host-side stacking."""
    import jax.numpy as jnp

    from drivescenegen_tpu.data.dataset import dataset_to_device

    ds = RasterDataset(str(png_dir / "*.png"), img_res=64, raw=True)
    mesh = make_mesh(MeshConfig())
    data = dataset_to_device(ds, mesh, chunk=4)  # forces the chunked path
    assert data.shape == (10, 64, 64, 3) and data.dtype == jnp.uint8
    got = np.asarray(jnp.take(data, jnp.asarray([3, 0, 7]), axis=0))
    want = np.stack([ds[3], ds[0], ds[7]])
    np.testing.assert_array_equal(got, want)


def test_dataset_to_device_sidecar_roundtrip(png_dir, eight_devices):
    import glob as _glob
    import os

    from drivescenegen_tpu.config import MeshConfig
    from drivescenegen_tpu.data.dataset import dataset_to_device
    from drivescenegen_tpu.parallel import make_mesh

    mesh = make_mesh(MeshConfig(data=1, model=1), devices=eight_devices[:1])
    ds = RasterDataset(str(png_dir / "*.png"), img_res=64, raw="auto", cache=True)
    first = np.asarray(dataset_to_device(ds, mesh))
    sidecars = _glob.glob(str(png_dir / ".devcache_*.npy"))
    assert len(sidecars) == 1
    # Second call must hit the sidecar and produce identical bytes.
    ds2 = RasterDataset(str(png_dir / "*.png"), img_res=64, raw="auto")
    again = np.asarray(dataset_to_device(ds2, mesh))
    assert np.array_equal(first, again)
    # A different decode resolution must not reuse the same sidecar.
    ds3 = RasterDataset(str(png_dir / "*.png"), img_res=32, raw="auto")
    other = np.asarray(dataset_to_device(ds3, mesh))
    assert other.shape[1] == 32 and len(_glob.glob(str(png_dir / ".devcache_*.npy"))) == 2


def test_hybrid_index_batches_coverage():
    """One epoch visits every pool slot and every tail slot exactly once
    (up to the dropped remainder), with fixed per-batch split sizes."""
    from drivescenegen_tpu.data.dataset import hybrid_index_batches

    n_pool, n_tail, batch = 50, 20, 7
    it = hybrid_index_batches(n_pool, n_tail, batch, seed=3)
    k_str = round(batch * n_tail / (n_pool + n_tail))
    k_res = batch - k_str
    n_batches = min(n_pool // k_res, n_tail // k_str)
    seen_pool, seen_tail = [], []
    for _ in range(n_batches):
        res, tail = next(it)
        assert res.shape == (k_res,) and tail.shape == (k_str,)
        assert res.dtype == np.int32 and tail.dtype == np.int32
        seen_pool.extend(res.tolist())
        seen_tail.extend(tail.tolist())
    assert len(set(seen_pool)) == len(seen_pool)  # no repeats within epoch
    assert len(set(seen_tail)) == len(seen_tail)
    # Next epoch reshuffles and keeps shapes.
    res2, tail2 = next(it)
    assert res2.shape == (k_res,) and tail2.shape == (k_str,)


def test_hybrid_index_batches_alignment():
    from drivescenegen_tpu.data.dataset import hybrid_index_batches

    it = hybrid_index_batches(60, 10, 16, seed=0, align=4)
    res, tail = next(it)
    assert tail.size % 4 == 0 and tail.size >= 4
    assert res.size + tail.size == 16


def test_hybrid_device_data_split(png_dir, eight_devices):
    """Pool + tail partition the corpus; pool rows land on device intact."""
    import jax.numpy as jnp

    from drivescenegen_tpu.data.dataset import hybrid_device_data

    ds = RasterDataset(str(png_dir / "*.png"), img_res=64, raw=True)
    mesh = make_mesh(MeshConfig())
    bytes_per = 64 * 64 * 3
    data_dev, pool_idx, tail_idx, full = hybrid_device_data(
        ds, mesh, budget_bytes=4 * bytes_per, seed=1
    )
    assert data_dev.shape == (4, 64, 64, 3)
    assert sorted(np.concatenate([pool_idx, tail_idx]).tolist()) == list(range(10))
    got = np.asarray(jnp.take(data_dev, jnp.asarray([2, 0]), axis=0))
    want = np.stack([full[pool_idx[2]], full[pool_idx[0]]])
    np.testing.assert_array_equal(got, want)


def test_train_hybrid_device_data_runs(tmp_path):
    """A tiny training run with device_data: hybrid completes and logs a
    finite loss (CPU mesh)."""
    from drivescenegen_tpu.scripts import train

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(5)
    for i in range(16):
        Image.fromarray(
            rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        ).save(d / f"{i}.png")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "model:\n  sample_size: 16\n  block_out_channels: [8, 16]\n"
        "  layers_per_block: 1\n  norm_num_groups: 4\n  attention_head_dim: 8\n"
        "  dtype: float32\n"
        f"train:\n  batch_size: 8\n  output_dir: {tmp_path}/out\n"
        f"  dataset_glob: '{d}/*.png'\n  ema_decay: 0.0\n"
        "  device_data: hybrid\n"
        # 8 samples resident, 8 streamed (16x16x3 = 768 B/sample).
        f"  device_data_budget_gb: {8 * 768 / 1024**3}\n"
    )
    train.main(["--cfg_file", str(cfg), "--max_steps", "3"])
    assert (tmp_path / "out" / "params").is_dir()


def test_decoded_corpus_logs_progress_for_stall_watchdog(png_dir, caplog):
    """The supervise stall watchdog reads liveness from the trainer's log
    file; a multi-minute PNG decode with no log writes looks like a hung
    device op and gets killed mid-decode (observed live on the 40k corpus:
    every relaunch restarted the decode from zero and died the same way).
    Decode progress must therefore go through the logging system, not only
    stdout."""
    import logging

    from drivescenegen_tpu.data.dataset import decoded_corpus

    ds = RasterDataset(str(png_dir / "*.png"), img_res=64, raw="auto")
    with caplog.at_level(logging.INFO, logger="data"):
        decoded_corpus(ds)
    msgs = [r.message for r in caplog.records if r.name == "data"]
    assert any("decoded_corpus: decoded" in m for m in msgs)
