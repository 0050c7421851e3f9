"""Device-side lane-mask extraction with bit-exact host parity.

The host path (vectorize/image_utils.py, reference: vectorization/utils/
image_utils.py:13-64) converts the quantized uint8 raster to float32 [0,1],
finds the modal (background) value of the R and G channels via 256-bin
histograms, and marks as lane every pixel deviating > 0.1 from the mode in
either channel. Its arithmetic is platform-pinned in a subtle way: the
deviation test `np.abs(img01 - mode) <= 0.1` promotes float32 pixels against
a float64 Python-scalar mode, so boundary pixels (e.g. v=153 against the
standard 0.5 background, where |153/255 - 128/256| == 0.1 exactly in real
arithmetic) are decided by float64 rounding that a float32 TPU kernel would
get wrong.

Instead of reproducing the float dance on device, observe that for a FIXED
mode bin m the background test selects a CONTIGUOUS range of uint8 values
(x(v) = f32(v/255) is strictly increasing), so the whole decision collapses
to integers:

  1. ``_BIN_LUT[v]``: the histogram bin of uint8 value v, precomputed on the
     host with the host's exact float32 ops. It is strictly increasing in v
     (verified at import), so the first-max argmax over value counts maps to
     the host's first-max argmax over bin counts.
  2. ``_BG_LO/_BG_HI[m]``: the inclusive uint8 range that the host classifies
     as background when the mode bin is m, precomputed with the host's exact
     mixed f32/f64 arithmetic.

The device kernel is then: per-channel 256-bin histogram of the RAW uint8
values (one scatter-add), argmax, two table lookups, two vector compares —
no floating point at all, bit-identical to the host for every possible
(pixel, mode) pair by construction. Used by the fused sampling pipeline
(scripts/end_to_end.py) to keep mask+skeleton work on the TPU without
breaking artifact parity with the two-stage CLI path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _tables(threshold: float = 0.1):
    """(bin_lut[256], bg_lo[256], bg_hi[256]) int32 host-semantics tables."""
    v = np.arange(256, dtype=np.uint8)
    img01 = v.astype(np.float32) / np.float32(255.0)  # host: astype(f32)/255.
    bin_lut = np.clip(
        (img01 * np.float32(256.0)).astype(np.int64), 0, 255
    ).astype(np.int32)
    if not np.all(np.diff(bin_lut) >= 1):  # injective + monotone: argmax maps
        raise AssertionError("bin LUT must be strictly increasing")

    # Background range per mode bin, with the host's float64 comparison:
    # np.abs(f32_pixel - python_float_mode) <= 0.1 computes in float64.
    lo = np.full(256, 255, dtype=np.int32)
    hi = np.full(256, -1, dtype=np.int32)
    x64 = img01.astype(np.float64)  # exact widening of the f32 pixel values
    for m in range(256):
        mode_val = float(m) / 256.0
        is_bg = np.abs(x64 - mode_val) <= threshold
        idx = np.nonzero(is_bg)[0]
        if idx.size:
            if not np.all(np.diff(idx) == 1):
                raise AssertionError(f"background set not contiguous at m={m}")
            lo[m], hi[m] = idx[0], idx[-1]
    # Plain numpy on purpose: the first call can happen inside a jit trace,
    # and caching jnp arrays created there would leak tracers into later
    # traces (observed as UnexpectedTracerError across two jits in one
    # process). Numpy constants embed into any trace safely.
    return bin_lut, lo, hi


def lane_mask_batch(q: jax.Array, threshold: float = 0.1) -> jax.Array:
    """uint8 [B, H, W, C>=2] quantized rasters -> bool [B, H, W] lane masks,
    bit-identical to vectorize.image_utils.get_lane_mask(q/255.) per image."""
    bin_lut, bg_lo, bg_hi = (jnp.asarray(t) for t in _tables(threshold))
    b, h, w = q.shape[:3]
    rg = q[..., :2].astype(jnp.int32)  # [B, H, W, 2]

    # Per-image, per-channel 256-bin histogram of raw uint8 values via one
    # flattened scatter-add.
    flat = rg.transpose(0, 3, 1, 2).reshape(b * 2, h * w)
    offs = jnp.arange(b * 2, dtype=jnp.int32)[:, None] * 256 + flat
    hist = (
        jnp.zeros((b * 2 * 256,), jnp.int32)
        .at[offs.reshape(-1)]
        .add(1)
        .reshape(b * 2, 256)
    )
    v_star = jnp.argmax(hist, axis=-1)  # first max, like np.argmax(bincount)
    m_star = bin_lut[v_star]  # [B*2] mode bins (monotone injective map)
    lo = bg_lo[m_star].reshape(b, 1, 1, 2)
    hi = bg_hi[m_star].reshape(b, 1, 1, 2)

    is_bg = jnp.all((rg >= lo) & (rg <= hi), axis=-1)
    return ~is_bg
