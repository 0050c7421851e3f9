"""Generated-raster -> binary lane mask (reference: vectorization/utils/
image_utils.py:13-64): per-channel 256-bin histograms find the modal
(background) gray value; pixels deviating > 0.1 in R or G become lane
pixels (255), everything else background (0)."""

from __future__ import annotations

import numpy as np


def channel_background_modes(img01: np.ndarray) -> tuple:
    """Modal (background) value of the R and G channels via 256-bin
    histograms over [0, 1] — left bin edge, like np.histogram + argmax.
    Implemented with bincount on the quantized values (~10x faster than
    np.histogram; identical binning for in-range data)."""

    def mode(ch: np.ndarray) -> float:
        idx = np.clip((ch.ravel() * 256.0).astype(np.int64), 0, 255)
        return float(np.argmax(np.bincount(idx, minlength=256))) / 256.0

    return mode(img01[..., 0]), mode(img01[..., 1])


def get_lane_mask(img01: np.ndarray, threshold: float = 0.1) -> np.ndarray:
    """float (H, W, 3) in [0,1] -> bool (H, W) lane mask."""
    mr, mg = channel_background_modes(img01)
    is_bg = (np.abs(img01[..., 0] - mr) <= threshold) & (
        np.abs(img01[..., 1] - mg) <= threshold
    )
    return ~is_bg


def get_gray_image(img01: np.ndarray, threshold: float = 0.1) -> np.ndarray:
    """uint8 (H, W, 3) 0/255 gray image, white = lane (reference output
    format of get_gray_image)."""
    mask = get_lane_mask(img01, threshold)
    gray = np.where(mask, 255, 0).astype(np.uint8)
    return np.stack([gray] * 3, axis=-1)


def to_float01(img) -> np.ndarray:
    """PIL image / uint8 array / float array -> float32 (H, W, 3) in [0,1]."""
    arr = np.asarray(img)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    arr = arr.astype(np.float32)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    return arr[..., :3]
