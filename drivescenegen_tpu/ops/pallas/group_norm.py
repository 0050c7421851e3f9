"""Fused GroupNorm + SiLU as a Pallas TPU kernel.

GroupNorm -> SiLU appears ~40x per UNet forward (every ResnetBlock norm and
the output norm); it is memory-bound, and unfused it costs a stats pass plus
a normalize pass over HBM. This kernel runs a two-phase grid per batch item:

  phase 0: accumulate per-group sum / sum-of-squares tile by tile into a
           VMEM scratch that persists across grid steps;
  phase 1: revisit the same tiles, apply (x - mean) * rsqrt(var + eps) *
           scale + bias and SiLU, and write the output.

Each tile is read twice from HBM but written once, and no f32 intermediate
is ever materialized in HBM. Used on the sampling path (bench-critical);
training uses the flax reference implementation for autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, scale_ref, bias_ref, o_ref, acc_ref, *, groups, eps, n_tokens,
            c_real):
    j = pl.program_id(1)  # phase
    s = pl.program_id(2)  # spatial tile

    _, T, C = x_ref.shape
    cpg = c_real // groups

    @pl.when((j == 0) & (s == 0))
    def _reset():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j == 0)
    def _accumulate():
        # Per-CHANNEL partial sums; the group reduction happens in phase 1
        # via a one-hot matmul (Mosaic cannot reshape the lane dim into
        # (groups, cpg) vector registers).
        x = x_ref[0].astype(jnp.float32)
        acc_ref[0, :] += jnp.sum(x, axis=0)
        acc_ref[1, :] += jnp.sum(x * x, axis=0)

    @pl.when(j == 1)
    def _normalize():
        # One-hot channel->group matrix, [C, G]; group stats via MXU. With
        # token packing (C = pack * C_real) the channel id wraps modulo the
        # real channel count, so packed copies land in the same group.
        ch_group = (
            jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0) % c_real
        ) // cpg
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
        M = (ch_group == g_ids).astype(jnp.float32)

        count = jnp.float32(n_tokens * cpg)
        sums = acc_ref[...]  # [2, C]
        # Precision.HIGHEST: the default MXU path quantizes f32 operands to
        # bf16, which visibly corrupts the stats (~1e-2 output error).
        gstats = jnp.dot(
            sums, M, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [2, G]
        mean_g = gstats[0] / count
        var_g = gstats[1] / count - mean_g * mean_g
        inv_g = jax.lax.rsqrt(var_g + eps)
        # Broadcast per-group values back to per-channel lanes.
        mean_c = jnp.dot(
            mean_g[None, :], M.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        inv_c = jnp.dot(
            inv_g[None, :], M.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        x = x_ref[0].astype(jnp.float32)
        xn = (x - mean_c) * inv_c
        y = xn * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
        o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "interpret"))
def fused_group_norm_silu(
    x: jax.Array,  # [B, N, C] or [B, H, W, C]
    scale: jax.Array,  # [C]
    bias: jax.Array,  # [C]
    groups: int = 32,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """silu(group_norm(x) * scale + bias), numerically matching
    flax.linen.GroupNorm(num_groups=groups, epsilon=eps) + silu."""
    orig_shape = x.shape
    B = orig_shape[0]
    C = orig_shape[-1]
    N = 1
    for d in orig_shape[1:-1]:
        N *= d
    # Token packing: with C < 128 lanes would go half-empty; fold `pack`
    # consecutive tokens into one row of pack*C channels (stats unchanged —
    # the group matmul wraps channel ids modulo the real C).
    c_real = C
    pack = 1
    while C < 128 and N % 2 == 0:
        C *= 2
        N //= 2
        pack *= 2
    x3 = x.reshape(B, N, C)
    scale2 = jnp.tile(scale, pack).reshape(1, C)
    bias2 = jnp.tile(bias, pack).reshape(1, C)

    # Spatial tile: cap the block so block + f32 temporaries + double
    # buffering stay well under the ~16 MB VMEM budget.
    tile = N
    max_elems = 1 << 18
    while tile * C > max_elems and tile % 2 == 0:
        tile //= 2
    if N % tile != 0:
        # Padding tiles would pollute the stats; use the reference path.
        return reference_group_norm_silu(x, scale, bias, groups, eps)
    n_tiles = N // tile

    grid = (B, 2, n_tiles)
    out = pl.pallas_call(
        functools.partial(
            _kernel, groups=groups, eps=eps, n_tokens=N * pack, c_real=c_real
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, j, s: (b, s, 0)),
            pl.BlockSpec((1, C), lambda b, j, s: (0, 0)),
            pl.BlockSpec((1, C), lambda b, j, s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, j, s: (b, s, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, C), jnp.float32)],
        interpret=interpret,
    )(x3, scale2, bias2)
    return out.reshape(orig_shape)


def reference_group_norm_silu_multi(xs, scale, bias, groups=32, eps=1e-6):
    """GN+SiLU of concat(xs, axis=-1) WITHOUT materializing the concat,
    returned as a tuple of per-input tensors.

    Group statistics are per-channel partial sums folded jointly, so groups
    may freely straddle input boundaries (they do in real UNet up blocks:
    512 h-channels + 256 skip-channels under 32 groups is a group size of
    24). Only [B, C]-sized stat vectors are ever concatenated. Numerics
    match reference_group_norm_silu(concat(xs)) exactly (same reduction
    structure per channel, same fold)."""
    B = xs[0].shape[0]
    C = sum(x.shape[-1] for x in xs)
    cpg = C // groups
    n_tokens = 1
    for d in xs[0].shape[1:-1]:
        n_tokens *= d

    ch_sums, ch_sqs = [], []
    for x in xs:
        xf = x.astype(jnp.float32).reshape(B, -1, x.shape[-1])
        ch_sums.append(xf.sum(axis=1))
        ch_sqs.append((xf * xf).sum(axis=1))
    ch_sum = jnp.concatenate(ch_sums, axis=-1)  # [B, C] — tiny
    ch_sq = jnp.concatenate(ch_sqs, axis=-1)
    g_sum = ch_sum.reshape(B, groups, cpg).sum(axis=-1)
    g_sq = ch_sq.reshape(B, groups, cpg).sum(axis=-1)
    count = n_tokens * cpg
    mean_g = g_sum / count
    var_g = jnp.maximum(g_sq / count - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)

    inv_c = jnp.repeat(inv_g, cpg, axis=-1)  # [B, C]
    mean_c = jnp.repeat(mean_g, cpg, axis=-1)
    sf = scale.astype(jnp.float32)[None, :]
    mul_full = inv_c * sf
    add_full = bias.astype(jnp.float32)[None, :] - mean_c * inv_c * sf

    outs = []
    off = 0
    for x in xs:
        ci = x.shape[-1]
        mul = mul_full[:, off:off + ci].astype(x.dtype)
        add = add_full[:, off:off + ci].astype(x.dtype)
        off += ci
        bshape = (B,) + (1,) * (x.ndim - 2) + (ci,)
        outs.append(jax.nn.silu(x * mul.reshape(bshape) + add.reshape(bshape)))
    return tuple(outs)


def reference_group_norm_silu(x, scale, bias, groups=32, eps=1e-6):
    """Pure-jnp reference (identical math to flax GroupNorm + silu), laid
    out for the TPU:

    - statistics via per-CHANNEL reductions in the original (B, ..., C)
      layout (lane-dim friendly), then a cheap [B, C] -> [B, G] fold;
    - the elementwise normalize/affine/SiLU as ONE multiply-add in x's
      dtype with per-channel broadcast — never reshaping the big tensor.

    Two earlier variants were measurably worse on v5e (bench.py): an
    all-f32 version (~45% slower UNet forward: doubled HBM traffic) and a
    (B, N, G, C/G)-reshaped bf16 version (lane dim C/G = 2 forces a
    relayout of the full activation; 44 vs 27 ms/fwd)."""
    orig_shape = x.shape
    B = orig_shape[0]
    C = orig_shape[-1]
    cpg = C // groups
    n_tokens = 1
    for d in orig_shape[1:-1]:
        n_tokens *= d

    xf = x.astype(jnp.float32).reshape(B, -1, C)
    ch_sum = xf.sum(axis=1)  # [B, C]
    ch_sq = (xf * xf).sum(axis=1)  # [B, C]
    g_sum = ch_sum.reshape(B, groups, cpg).sum(axis=-1)  # [B, G]
    g_sq = ch_sq.reshape(B, groups, cpg).sum(axis=-1)
    count = n_tokens * cpg
    mean_g = g_sum / count
    # One-pass variance can go slightly negative from f32 cancellation when
    # |mean| >> std; clamp at 0 like flax does (rsqrt(neg) would be NaN).
    var_g = jnp.maximum(g_sq / count - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)  # [B, G]

    # Per-channel mul/add vectors, folded with scale/bias (f32), cast once.
    inv_c = jnp.repeat(inv_g, cpg, axis=-1)  # [B, C]
    mean_c = jnp.repeat(mean_g, cpg, axis=-1)
    mul = (inv_c * scale.astype(jnp.float32)[None, :]).astype(x.dtype)
    add = (
        bias.astype(jnp.float32)[None, :] - mean_c * inv_c * scale.astype(jnp.float32)[None, :]
    ).astype(x.dtype)
    bshape = (B,) + (1,) * (len(orig_shape) - 2) + (C,)
    y = x * mul.reshape(bshape) + add.reshape(bshape)
    return jax.nn.silu(y)
