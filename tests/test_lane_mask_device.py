"""Device lane-mask must match the host get_lane_mask bit for bit.

The fused pipeline (scripts/end_to_end.py) computes lane masks on the TPU
from the same quantized uint8 pixels that land in the PNGs; vectorization
artifacts only stay parity-comparable with the two-stage CLI path if the
two mask implementations agree on EVERY pixel — including the float64
comparison boundaries of the host path (ops/lane_mask.py docstring).
"""

import numpy as np
import pytest

from drivescenegen_tpu.ops.lane_mask import lane_mask_batch
from drivescenegen_tpu.vectorize.image_utils import get_lane_mask


def _host_masks(q):
    return np.stack([get_lane_mask(im.astype(np.float32) / 255.0) for im in q])


def test_matches_host_on_random_images():
    rng = np.random.default_rng(0)
    # Mix of near-uniform background + sparse bright lanes (realistic) and
    # pure-noise images (worst case for mode finding).
    imgs = []
    for i in range(6):
        img = np.full((64, 64, 3), 128, np.uint8)
        n = rng.integers(50, 500)
        ys, xs = rng.integers(0, 64, n), rng.integers(0, 64, n)
        img[ys, xs, 0] = rng.integers(0, 256, n)
        img[ys, xs, 1] = rng.integers(0, 256, n)
        imgs.append(img)
    imgs.append(rng.integers(0, 256, (64, 64, 3)).astype(np.uint8))
    q = np.stack(imgs)
    dev = np.asarray(lane_mask_batch(q))
    np.testing.assert_array_equal(dev, _host_masks(q))


def test_float64_boundary_value():
    """|153/255 - 128/256| == 0.1 exactly in real arithmetic; the host's
    float64 comparison calls it a LANE pixel (f32(0.6) - 0.5 > 0.1 in f64).
    A naive float32 device kernel would call it background."""
    img = np.full((32, 32, 3), 128, np.uint8)
    img[3, 4, 0] = 153
    img[3, 4, 1] = 128
    host = _host_masks(img[None])
    assert host[0, 3, 4], "host must classify the boundary pixel as lane"
    dev = np.asarray(lane_mask_batch(img[None]))
    np.testing.assert_array_equal(dev, host)


def test_all_values_against_all_modes():
    """Exhaustive: every uint8 value present, across several mode choices."""
    vals = np.arange(256, dtype=np.uint8).reshape(16, 16)
    for mode in (0, 77, 128, 204, 255):
        img = np.empty((48, 48, 3), np.uint8)
        img[:] = mode  # dominant background sets the histogram mode
        img[:16, :16, 0] = vals
        img[16:32, 16:32, 1] = vals
        q = img[None]
        dev = np.asarray(lane_mask_batch(q))
        np.testing.assert_array_equal(dev, _host_masks(q), err_msg=f"mode={mode}")


def test_first_max_tie_breaking():
    """np.argmax takes the FIRST maximum; a two-way tie must resolve to the
    smaller value on both paths."""
    img = np.zeros((4, 8, 3), np.uint8)
    img[:2, :, 0] = 60
    img[2:, :, 0] = 200  # exact 16-16 tie in the R histogram
    img[:2, :, 1] = 200
    img[2:, :, 1] = 60
    q = img[None]
    np.testing.assert_array_equal(np.asarray(lane_mask_batch(q)), _host_masks(q))


@pytest.mark.parametrize("shape", [(1, 16, 16, 3), (3, 33, 17, 3)])
def test_odd_shapes(shape):
    rng = np.random.default_rng(7)
    q = rng.integers(0, 256, shape).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(lane_mask_batch(q)), _host_masks(q))
