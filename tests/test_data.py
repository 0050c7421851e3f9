import numpy as np
import pytest

from drivescenegen_tpu.data import tfrecord
from drivescenegen_tpu.data.preprocess import (
    decode_scenario,
    process_tfrecord_file,
)
from drivescenegen_tpu.data.synthetic import (
    make_synthetic_scenario,
    make_synthetic_tfrecord,
)


def test_crc32c_known_vectors():
    # Published CRC-32C test vectors (RFC 3720 appendix / kernel tests).
    assert tfrecord.crc32c(b"") == 0x00000000
    assert tfrecord.crc32c(b"123456789") == 0xE3069283
    assert tfrecord.crc32c(b"\x00" * 32) == 0x8A9136AA


def test_tfrecord_roundtrip_python(tmp_path):
    path = str(tmp_path / "t.tfrecord")
    records = [b"hello", b"", b"x" * 1000]
    assert tfrecord.write_tfrecord(path, records) == 3
    out = list(tfrecord.read_tfrecord_python(path))
    assert out == records


def test_tfrecord_matches_tf_reader(tmp_path):
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "t.tfrecord")
    records = [b"alpha", b"beta" * 100]
    tfrecord.write_tfrecord(path, records)
    tf.config.set_visible_devices([], "GPU")
    out = [bytes(x.numpy()) for x in tf.data.TFRecordDataset(path)]
    assert out == records


def test_tfrecord_corruption_detected(tmp_path):
    path = str(tmp_path / "t.tfrecord")
    tfrecord.write_tfrecord(path, [b"payload-data"])
    raw = bytearray(open(path, "rb").read())
    raw[14] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        list(tfrecord.read_tfrecord_python(path))


def test_decode_scenario_reference_format():
    data = make_synthetic_scenario(seed=3)
    info = decode_scenario(data)
    # Reference pickle keys (data_preprocess.py:176-190).
    for key in ("scenario_id", "tracks_info", "lane", "road_polylines",
                "crosswalk", "speed_bump", "drive_way", "stop_sign",
                "sdc_track_index", "predict_list"):
        assert key in info, key
    trajs = info["tracks_info"]["trajs"]
    assert trajs.ndim == 3 and trajs.shape[1] == 91 and trajs.shape[2] == 11
    assert trajs[:, :, 9].max() == 1.0  # valid flags
    assert set(np.unique(trajs[:, :, 10])) <= {1.0}  # vehicles
    # Lane features: [x,y,z,dx,dy,dz,type,theta], type 2 = surface street.
    lane = next(iter(info["lane"].values()))
    assert lane.shape[1] == 8
    assert np.all(lane[:, 6] == 2.0)
    # dir vectors are unit-ish after the first point.
    norms = np.linalg.norm(lane[1:, 3:6], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_decode_heading_consistency():
    info = decode_scenario(make_synthetic_scenario(seed=5))
    trajs = info["tracks_info"]["trajs"]
    sdc = info["sdc_track_index"]
    # Ego heading matches its displacement direction when moving.
    d = trajs[sdc, 11, 0:2] - trajs[sdc, 10, 0:2]
    if np.linalg.norm(d) > 0.05:
        expect = np.arctan2(d[1], d[0])
        got = trajs[sdc, 10, 6]
        diff = np.abs(np.angle(np.exp(1j * (expect - got))))
        assert diff < 0.2


def test_process_tfrecord_file_writes_pickles(tmp_path):
    rec_path = str(tmp_path / "shard.tfrecord")
    make_synthetic_tfrecord(rec_path, n_scenarios=3, seed=1)
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    ids = process_tfrecord_file(rec_path, str(out_dir), backend="python")
    assert len(ids) == 3
    import pickle

    files = sorted(out_dir.glob("sample_*.pkl"))
    assert len(files) == 3
    info = pickle.load(open(files[0], "rb"))
    assert "lane" in info and "tracks_info" in info


def test_synthetic_scenario_rasterizes():
    """Ingestion -> rasterizer end-to-end on synthetic data."""
    from drivescenegen_tpu.ops.raster import rasterize_scenario

    info = decode_scenario(make_synthetic_scenario(seed=11))
    img = rasterize_scenario(info, img_res=256, map_range=80.0)
    assert img.shape == (256, 256, 3)
    lane_px = (np.abs(img[..., 0] - 0.5) > 0.05).sum()
    assert lane_px > 200, f"too few lane pixels: {lane_px}"
    agent_px = (img[..., 2] > 0.4).sum()
    assert agent_px > 5, f"no agents rasterized: {agent_px}"
