import numpy as np
import pytest

from drivescenegen_tpu.data import native_io, tfrecord

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native dsg_io library not built"
)


def test_native_crc_matches_python(rng):
    for n in (0, 1, 7, 8, 9, 63, 1024):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert native_io.crc32c(data) == tfrecord.crc32c(data)
    assert native_io.crc32c(b"123456789") == 0xE3069283


def test_native_read_matches_python_writer(tmp_path):
    path = str(tmp_path / "t.tfrecord")
    records = [b"hello", b"", b"x" * 5000, bytes(range(256))]
    tfrecord.write_tfrecord(path, records)
    assert list(native_io.read_tfrecord(path)) == records


def test_native_write_matches_python_reader(tmp_path):
    path = str(tmp_path / "t.tfrecord")
    records = [b"alpha", b"b" * 333]
    native_io.write_tfrecord(path, records)
    assert list(tfrecord.read_tfrecord_python(path)) == records


def test_native_detects_corruption(tmp_path):
    path = str(tmp_path / "t.tfrecord")
    tfrecord.write_tfrecord(path, [b"payload-data-here"])
    raw = bytearray(open(path, "rb").read())
    raw[16] ^= 0x01
    open(path, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        native_io.index_tfrecord(path)
    # verify_crc=False skips the check and still frames correctly.
    idx = native_io.index_tfrecord(path, verify_crc=False)
    assert len(idx) == 1


def test_auto_backend_prefers_native(tmp_path):
    path = str(tmp_path / "t.tfrecord")
    tfrecord.write_tfrecord(path, [b"one", b"two"])
    assert list(tfrecord.read_tfrecord(path, backend="native")) == [b"one", b"two"]
    assert list(tfrecord.read_tfrecord(path, backend="auto")) == [b"one", b"two"]
