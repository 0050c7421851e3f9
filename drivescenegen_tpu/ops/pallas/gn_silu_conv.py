"""Fused GroupNorm + SiLU + 3x3 conv as one Pallas TPU kernel.

The UNet's ResnetBlocks are chains of GroupNorm -> SiLU -> conv3x3
(models/unet2d.py). Left to XLA, each pair costs: a stats read of x, a
normalize read+write of x (the silu'd tensor is materialized in HBM), and
the conv's own read+write — ~4 full passes over the activation plus the
output write. This op keeps the stats pass in XLA (a per-channel reduction
XLA runs at the HBM roofline) and fuses everything after it:

  pass 1 (XLA):    per-(batch, group) mean/rstd -> per-(batch, channel)
                   mul/add vectors, folded with the GN scale/bias. [B, C]
                   — tiny.
  pass 2 (Pallas): read x once, apply silu(x*mul+add) in VMEM, build the
                   shifted-window im2col matrix on-chip (never in HBM), and
                   contract (TH*W, 9C) @ (9C, Co) on the MXU. HBM traffic
                   is exactly read-x + write-out.

Halo rows (each spatial tile needs one row above and below for the 3x3
window) are precomputed OUTSIDE the kernel as two tiny (B, S, W, C)
tensors, already normalize+silu-transformed, with true zeros at the image
borders (conv SAME padding pads the *post-activation* input with 0). This
keeps the kernel free of DMA/semaphore machinery: every input is a
Mosaic-pipelined BlockSpec block. Extra HBM for halos: 2 rows per
TH-row tile, ~3% of x at TH=64.

The contraction uses the full 9C-wide K dimension (im2col in VMEM), not 9
separate C-wide taps: at C=64 that lifts MXU K-occupancy from 50% to 90%;
at C>=128 K-tiles are full. Edge columns (w=0 / w=W-1) of the shifted
windows are masked with a per-row where() so adjacent image rows never
leak through the flattened (h*W + w) layout.

Numerics match reference_gn_silu_conv3x3 (the plain-XLA composition below)
up to bf16 rounding; parity is pinned in tests/test_gn_silu_conv.py, in
interpret mode on CPU and compiled on TPU.

Used on the sampling path only (no custom VJP); training keeps the flax
composition for autodiff. Gate: ModelConfig.use_pallas_gn_conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Sublane-aligned offset of padded-image row 0 inside the VMEM assembly
# buffer; >= 1 so the (dy=0, dx=0) tap's slice start (OFF + dx - 1) is
# never negative.
_OFF = 8


def _gn_mul_add(x, scale, bias, groups, eps):
    """Per-(batch, channel) normalize-affine vectors, f32: y = x*mul + add.

    Same reduction structure as ops/pallas/group_norm.py's reference path
    (per-channel sums folded to groups), so numerics agree with flax
    GroupNorm exactly."""
    B = x.shape[0]
    C = x.shape[-1]
    cpg = C // groups
    n_tokens = 1
    for d in x.shape[1:-1]:
        n_tokens *= d

    xf = x.astype(jnp.float32).reshape(B, -1, C)
    ch_sum = xf.sum(axis=1)
    ch_sq = (xf * xf).sum(axis=1)
    g_sum = ch_sum.reshape(B, groups, cpg).sum(axis=-1)
    g_sq = ch_sq.reshape(B, groups, cpg).sum(axis=-1)
    count = n_tokens * cpg
    mean_g = g_sum / count
    var_g = jnp.maximum(g_sq / count - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)

    inv_c = jnp.repeat(inv_g, cpg, axis=-1)
    mean_c = jnp.repeat(mean_g, cpg, axis=-1)
    sf = scale.astype(jnp.float32)[None, :]
    mul = inv_c * sf
    add = bias.astype(jnp.float32)[None, :] - mean_c * inv_c * sf
    return mul, add


def _pick_tile(H, W, C, Co, budget_bytes=10 * 1024 * 1024):
    """Largest power-of-two row-tile TH dividing H whose working set
    (im2col matrix + assembly buffer + double-buffered in/out blocks +
    f32 accumulator) fits the VMEM budget."""
    lane_c = max(C, 128)  # lanes pad to 128
    lane_co = max(Co, 128)
    th = min(H, 64)
    while th >= 1:
        if H % th == 0:
            thw = th * W
            need = (
                thw * 9 * lane_c * 2          # im2col M (bf16)
                + (th + 2) * W * lane_c * 2   # assembly buffer ts
                + 2 * thw * lane_c * 2        # input block, double-buffered
                + 2 * thw * lane_co * 2       # output block, double-buffered
                + thw * lane_co * 4           # f32 accumulator
            )
            if need <= budget_bytes:
                return th
        th //= 2
    return 1


def _kernel(x_ref, th_ref, bh_ref, mul_ref, add_ref, w_ref, b_ref, o_ref,
            ts, *, TH, W, C, Co, out_dtype):
    THW = TH * W
    mul = mul_ref[0].astype(jnp.float32)
    add = add_ref[0].astype(jnp.float32)

    # Normalize + SiLU the body tile in f32, store bf16 into the assembly
    # buffer at padded-image row 1 (rows 0 and TH+1 are the halos).
    xb = x_ref[0].reshape(THW, C).astype(jnp.float32)
    t = xb * mul + add
    t = (t * jax.nn.sigmoid(t)).astype(ts.dtype)
    ts[_OFF + W:_OFF + W + THW] = t
    ts[_OFF:_OFF + W] = th_ref[0, 0].astype(ts.dtype)
    ts[_OFF + (TH + 1) * W:_OFF + (TH + 2) * W] = bh_ref[0, 0].astype(ts.dtype)

    # Shifted windows: output pixel r = h*W + w, tap (dy, dx) reads padded
    # row (h+dy)*W + (w+dx-1) = ts[_OFF + W + r + (dy-1)*W + (dx-1)].
    # w-edge taps are masked so the flattened layout can't leak the
    # neighbouring image row into the w=0 / w=W-1 columns.
    wcol = jax.lax.broadcasted_iota(jnp.int32, (THW, 1), 0) % W
    zero = jnp.zeros((), ts.dtype)
    cols = []
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            start = _OFF + W + (dy - 1) * W + (dx - 1)
            m = ts[start:start + THW]
            if dx == 0:
                m = jnp.where(wcol > 0, m, zero)
            elif dx == 2:
                m = jnp.where(wcol < W - 1, m, zero)
            cols.append(m)
    M = jnp.concatenate(cols, axis=1)  # (THW, 9C), on-chip only

    acc = jnp.dot(M, w_ref[...], preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.astype(out_dtype).reshape(TH, W, Co)


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "interpret")
)
def gn_silu_conv3x3(
    x: jax.Array,       # [B, H, W, C]
    scale: jax.Array,   # [C]   GroupNorm scale
    bias: jax.Array,    # [C]   GroupNorm bias
    kernel: jax.Array,  # [3, 3, C, Co]  conv kernel (HWIO)
    conv_bias: jax.Array,  # [Co]
    groups: int = 32,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """conv3x3(silu(group_norm(x)*scale+bias)) + conv_bias, SAME padding,
    stride 1, NHWC. Output dtype follows x."""
    B, H, W, C = x.shape
    Co = kernel.shape[-1]
    mul, add = _gn_mul_add(x, scale, bias, groups, eps)

    TH = _pick_tile(H, W, C, Co)
    S = H // TH

    cdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else x.dtype

    # Halo rows, pre-transformed (normalize+silu) outside the kernel; the
    # image-border halos are the conv's zero padding, NOT silu(affine(0)).
    bc = (B, 1, 1, C)
    def transform(rows):  # rows: [B, S-1, W, C]
        tt = rows.astype(jnp.float32) * mul.reshape(bc) + add.reshape(bc)
        return (tt * jax.nn.sigmoid(tt)).astype(cdt)

    zrow = jnp.zeros((B, 1, W, C), cdt)
    if S > 1:
        tops = transform(x[:, TH - 1:H - 1:TH])   # halo above tiles 1..S-1
        bots = transform(x[:, TH::TH])            # halo below tiles 0..S-2
        top_h = jnp.concatenate([zrow, tops], axis=1)   # [B, S, W, C]
        bot_h = jnp.concatenate([bots, zrow], axis=1)
    else:
        top_h = zrow
        bot_h = zrow

    w2 = kernel.reshape(9 * C, Co).astype(cdt)
    b2 = conv_bias.reshape(1, Co)

    out = pl.pallas_call(
        functools.partial(
            _kernel, TH=TH, W=W, C=C, Co=Co, out_dtype=x.dtype
        ),
        grid=(B, S),
        in_specs=[
            pl.BlockSpec((1, TH, W, C), lambda b, s: (b, s, 0, 0)),
            pl.BlockSpec((1, 1, W, C), lambda b, s: (b, s, 0, 0)),
            pl.BlockSpec((1, 1, W, C), lambda b, s: (b, s, 0, 0)),
            pl.BlockSpec((1, C), lambda b, s: (b, 0)),
            pl.BlockSpec((1, C), lambda b, s: (b, 0)),
            pl.BlockSpec((9 * C, Co), lambda b, s: (0, 0)),
            pl.BlockSpec((1, Co), lambda b, s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TH, W, Co), lambda b, s: (b, s, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM(((TH + 2) * W + 2 * _OFF, C), cdt),
        ],
        interpret=interpret,
    )(x, top_h, bot_h, mul, add, w2, b2)
    return out


def reference_gn_silu_conv3x3(x, scale, bias, kernel, conv_bias,
                              groups=32, eps=1e-6):
    """Plain-XLA composition with the exact same math (stats fold, f32
    affine, silu, SAME conv). The kernel's parity oracle, and the fallback
    on non-TPU platforms."""
    mul, add = _gn_mul_add(x, scale, bias, groups, eps)
    bc = (x.shape[0], 1, 1, x.shape[-1])
    t = x.astype(jnp.float32) * mul.reshape(bc) + add.reshape(bc)
    t = (t * jax.nn.sigmoid(t)).astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        t, kernel.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn
    )
    return y + conv_bias.astype(x.dtype)
