"""UNet2D denoiser in flax.linen, NHWC, bf16 activations / fp32 params.

Architecture mirrors the semantics of the reference's diffusers UNet2DModel
(reference: scripts/train.py:39-57): conv_in -> 4 DownBlock2D (2 ResNet
layers each, stride-2 conv downsample between blocks) -> mid block
(ResNet, self-attention, ResNet) -> 4 UpBlock2D (3 ResNet layers each with
skip concatenation, nearest-neighbor upsample between blocks) ->
GroupNorm/SiLU/conv_out. GroupNorm(32)+SiLU throughout; time embedding is
sinusoidal followed by a 2-layer MLP injected into every ResNet block.

TPU-first deviations from the reference (documented, not accidental):
- NHWC layout (XLA's native conv layout on TPU).
- attention_head_dim defaults to 64 (not diffusers' 8): 8-dim heads waste
  the 128-lane MXU; head count = channels // head_dim either way.
- Optional `cond` input channel-concatenated for map-conditioned agent
  inpainting with classifier-free guidance (BASELINE.json config-5).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from drivescenegen_tpu.config import ModelConfig


def timestep_embedding(
    timesteps: jax.Array, dim: int, max_period: float = 10000.0
) -> jax.Array:
    """Sinusoidal embeddings (diffusers get_timestep_embedding,
    flip_sin_to_cos=True, downscale_freq_shift=0)."""
    timesteps = jnp.atleast_1d(timesteps).astype(jnp.float32)
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    freqs = jnp.exp(exponent)
    args = timesteps[:, None] * freqs[None, :]
    # flip_sin_to_cos=True -> [cos, sin]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TimeMLP(nn.Module):
    """2-layer SiLU MLP over the sinusoidal embedding (diffusers
    TimestepEmbedding). Named dense1/dense2 for the tensor-parallel rules in
    parallel/mesh.py."""

    embed_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, t_emb: jax.Array) -> jax.Array:
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="dense1")(t_emb)
        h = nn.silu(h)
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="dense2")(h)
        return h


class GroupNormSiLU(nn.Module):
    """GroupNorm followed by SiLU. Param layout matches nn.GroupNorm
    ({scale, bias} under this module's name), so the flax path (training,
    autodiff) and the fused Pallas kernel (sampling) share checkpoints."""

    groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False
    # return_params=True declares the same {scale, bias} tree but returns
    # the raw params instead of computing — for the fused GN+SiLU+conv
    # path, which consumes them directly (checkpoints stay identical).
    return_params: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, x2: Optional[jax.Array] = None):
        """Normal mode: GN+SiLU over x. Pair mode (x2 given): numerically
        the GN+SiLU of concat(x, x2) WITHOUT materializing the concat,
        returned as the two halves (for SplitInputConv). Group statistics
        are folded from per-channel partial sums, so groups may straddle
        the input boundary (they do in real up blocks, e.g. 512+256
        channels under 32 groups). Parameters are the full-width
        {scale, bias} either way, so checkpoints are shared."""
        from drivescenegen_tpu.ops.pallas.group_norm import (
            fused_group_norm_silu,
            reference_group_norm_silu,
            reference_group_norm_silu_multi,
        )

        C = x.shape[-1] + (x2.shape[-1] if x2 is not None else 0)
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)

        if self.return_params:
            return scale, bias
        if x2 is None:
            if self.use_pallas and jax.devices()[0].platform == "tpu":
                return fused_group_norm_silu(x, scale, bias, self.groups, self.eps)
            return reference_group_norm_silu(x, scale, bias, self.groups, self.eps)
        return reference_group_norm_silu_multi(
            (x, x2), scale, bias, self.groups, self.eps
        )


class SplitInputConv(nn.Module):
    """nn.Conv(SAME) over concat(a, b) without materializing the concat:
    conv(concat(a, b), K) == conv(a, K[:, :, :Ca]) + conv(b, K[:, :, Ca:]).
    Parameter names ({kernel, bias}), shapes, dtypes, and initializers match
    nn.Conv exactly, so checkpoints are interchangeable with the concat
    path. Saves the full-resolution concat tensor's HBM round trip on the
    UNet up path (docs/PERF_ANALYSIS.md, "skip-concat elimination")."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        in_c = a.shape[-1] + b.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, in_c, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        a, b, kernel, bias = nn.dtypes.promote_dtype(
            a, b, kernel, bias, dtype=self.dtype
        )
        ca = a.shape[-1]
        dn = jax.lax.conv_dimension_numbers(
            a.shape, kernel[:, :, :ca, :].shape, ("NHWC", "HWIO", "NHWC")
        )
        ya = jax.lax.conv_general_dilated(
            a, kernel[:, :, :ca, :], (1, 1), "SAME", dimension_numbers=dn
        )
        yb = jax.lax.conv_general_dilated(
            b, kernel[:, :, ca:, :], (1, 1), "SAME", dimension_numbers=dn
        )
        return ya + yb + bias


class ConvParams(nn.Module):
    """Declares exactly nn.Conv's {kernel, bias} parameters (same names,
    shapes, dtypes, initializers — so the init values and checkpoints are
    bit-identical to nn.Conv under the same module name) and returns them
    instead of convolving, for ops that consume the raw kernel (the fused
    GN+SiLU+conv Pallas path)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, in_channels: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            self.kernel_size + (in_channels, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


def _fused_gn_silu_conv(x, scale, bias, kernel, conv_bias, groups):
    """Dispatch the fused GN+SiLU+conv3x3: compiled Pallas on TPU,
    interpret mode elsewhere (slow; the flag is a sampling-path opt-in)."""
    from drivescenegen_tpu.ops.pallas.gn_silu_conv import gn_silu_conv3x3

    on_tpu = jax.devices()[0].platform == "tpu"
    return gn_silu_conv3x3(
        x, scale, bias, kernel, conv_bias, groups=groups,
        interpret=not on_tpu,
    )


class ResnetBlock(nn.Module):
    """GroupNorm -> SiLU -> conv -> (+time) -> GroupNorm -> SiLU -> conv,
    with a 1x1 shortcut when channel counts change (diffusers ResnetBlock2D).

    Pair mode (`skip` given): consumes what would be concat(x, skip) without
    building the concat — GroupNorm splits per input (groups never straddle
    the boundary) and conv1/shortcut split their kernels along the
    input-channel dim (SplitInputConv). Same parameters either way."""

    out_channels: int
    groups: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False
    use_pallas_gn_conv: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        temb: jax.Array,
        deterministic: bool = True,
        skip: Optional[jax.Array] = None,
    ):
        # Fused GN+SiLU+conv pairs (sampling path): same params, one Pallas
        # kernel per pair instead of a materialized normalized tensor + a
        # separate conv. dropout>0 keeps the unfused path (mask between
        # norm2 and conv2).
        fuse = self.use_pallas_gn_conv and self.dropout == 0.0
        norm1 = GroupNormSiLU(self.groups, dtype=self.dtype,
                              use_pallas=self.use_pallas,
                              return_params=fuse and skip is None,
                              name="norm1")
        if skip is None:
            in_channels = x.shape[-1]
            if fuse:
                g_scale, g_bias = norm1(x)
                k, kb = ConvParams(self.out_channels, (3, 3), name="conv1")(
                    in_channels
                )
                h = _fused_gn_silu_conv(
                    x.astype(self.dtype), g_scale, g_bias, k, kb, self.groups
                )
            else:
                h = norm1(x)
                h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                            name="conv1")(h)
        else:
            in_channels = x.shape[-1] + skip.shape[-1]
            ha, hb = norm1(x, skip)
            h = SplitInputConv(
                self.out_channels, (3, 3), dtype=self.dtype, name="conv1"
            )(ha, hb)

        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]

        norm2 = GroupNormSiLU(self.groups, dtype=self.dtype,
                              use_pallas=self.use_pallas,
                              return_params=fuse, name="norm2")
        if fuse:
            g_scale, g_bias = norm2(h)
            k, kb = ConvParams(self.out_channels, (3, 3), name="conv2")(
                self.out_channels
            )
            h = _fused_gn_silu_conv(
                h.astype(self.dtype), g_scale, g_bias, k, kb, self.groups
            )
        else:
            h = norm2(h)
            if self.dropout > 0.0:
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                        name="conv2")(h)

        if in_channels != self.out_channels:
            if skip is None:
                x = nn.Conv(
                    self.out_channels, (1, 1), dtype=self.dtype, name="shortcut"
                )(x)
            else:
                x = SplitInputConv(
                    self.out_channels, (1, 1), dtype=self.dtype, name="shortcut"
                )(x, skip)
        return x + h


class AttentionBlock(nn.Module):
    """Spatial self-attention over HxW tokens (diffusers Attention in
    UNetMidBlock2D). Fused qkv projection; residual add.

    impl="flash" uses JAX's production Pallas flash-attention kernel
    (jax.experimental.pallas.ops.tpu.flash_attention) — online-softmax
    tiling, no materialized [heads, q, k] logits. At the default mid-block
    size (1024 tokens) XLA attention is already small; flash matters for
    higher-resolution/conditional variants with more tokens."""

    head_dim: int = 64
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        num_heads = max(1, C // self.head_dim)
        head_dim = C // num_heads

        h = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype, name="norm")(x)
        h = h.reshape(B, H * W, C)
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, H * W, num_heads, head_dim)

        q, k, v = heads(q), heads(k), heads(v)
        # head_dim is a static Python int, so keep the softmax scale a
        # Python float: pallas flash_attention requires a concrete sm_scale
        # even under trace (a jnp scalar here is a tracer inside scan).
        scale = 1.0 / float(head_dim) ** 0.5

        if self.impl not in ("xla", "flash"):
            raise ValueError(
                f"unknown attention impl {self.impl!r}; expected 'xla' or 'flash'"
            )
        if self.impl == "flash" and jax.devices()[0].platform == "tpu":
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention,
            )

            # flash_attention wants [B, heads, seq, head_dim].
            qh = q.transpose(0, 2, 1, 3)
            kh = k.transpose(0, 2, 1, 3)
            vh = v.transpose(0, 2, 1, 3)
            out = flash_attention(qh, kh, vh, causal=False, sm_scale=float(scale))
            out = out.transpose(0, 2, 1, 3)
        else:
            # f32 accumulation on the MXU for the logits (bf16 accumulate
            # loses ~3 decimal digits over 1024 keys).
            logits = (
                jnp.einsum(
                    "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
                )
                * scale
            )
            weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = out.reshape(B, H * W, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj_out")(out)
        return x + out.reshape(B, H, W, C)


class Downsample(nn.Module):
    """Stride-2 3x3 conv (diffusers Downsample2D with use_conv=True).

    torch_pad selects diffusers' exact padding ((1,1) per side, torch
    padding=1) instead of XLA SAME (which pads (0,1) at stride 2 on even
    inputs) — required for numerical parity with imported reference
    checkpoints (models/import_diffusers.py); params are identical."""

    channels: int
    dtype: jnp.dtype = jnp.bfloat16
    torch_pad: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        padding = ((1, 1), (1, 1)) if self.torch_pad else "SAME"
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=padding,
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """Nearest-neighbor x2 then 3x3 conv (diffusers Upsample2D)."""

    channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
        return nn.Conv(self.channels, (3, 3), dtype=self.dtype, name="conv")(x)


class UNet2D(nn.Module):
    """The flagship denoiser. __call__(x_noisy, t, cond=None) -> eps_hat.

    x: [B, H, W, C_in] (NHWC), t: [B] or scalar int timesteps.
    cond: optional [B, H, W, C_cond] conditioning, channel-concatenated
    (zeros = unconditional branch for classifier-free guidance).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        cond: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        channels = tuple(cfg.block_out_channels)
        n_blocks = len(channels)
        embed_dim = channels[0] * 4

        t = jnp.broadcast_to(jnp.atleast_1d(t), (x.shape[0],))
        temb = timestep_embedding(t, channels[0]).astype(dtype)
        temb = TimeMLP(embed_dim, dtype=dtype, name="time_mlp")(temb)

        x = x.astype(dtype)
        if cfg.cond_channels > 0:
            if cond is None:
                cond = jnp.zeros(x.shape[:-1] + (cfg.cond_channels,), dtype)
            x = jnp.concatenate([x, cond.astype(dtype)], axis=-1)

        h = nn.Conv(channels[0], (3, 3), dtype=dtype, name="conv_in")(x)
        skips = [h]

        res_kw = dict(
            groups=cfg.norm_num_groups, dropout=cfg.dropout, dtype=dtype,
            use_pallas=cfg.use_pallas_gn,
            use_pallas_gn_conv=cfg.use_pallas_gn_conv,
        )

        # Down path.
        for i, ch in enumerate(channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, name=f"down_{i}_res_{j}", **res_kw)(
                    h, temb, deterministic
                )
                skips.append(h)
            if i != n_blocks - 1:
                h = Downsample(ch, dtype=dtype, torch_pad=cfg.torch_pad_downsample,
                               name=f"down_{i}_downsample")(h)
                skips.append(h)

        # Mid block: ResNet -> attention -> ResNet.
        h = ResnetBlock(channels[-1], name="mid_res_0", **res_kw)(h, temb, deterministic)
        h = AttentionBlock(
            head_dim=cfg.attention_head_dim, groups=cfg.norm_num_groups,
            dtype=dtype, impl=cfg.attention_impl, name="mid_attn",
        )(h)
        h = ResnetBlock(channels[-1], name="mid_res_1", **res_kw)(h, temb, deterministic)

        # Up path (mirrored, layers_per_block+1 resnets with skip concat;
        # split_skip_conv feeds the pair straight into the resnet so the
        # full-resolution concat never hits HBM — same params, same math).
        for i, ch in enumerate(reversed(channels)):
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                if cfg.split_skip_conv:
                    h = ResnetBlock(ch, name=f"up_{i}_res_{j}", **res_kw)(
                        h, temb, deterministic, skip=skip
                    )
                else:
                    h = jnp.concatenate([h, skip], axis=-1)
                    h = ResnetBlock(ch, name=f"up_{i}_res_{j}", **res_kw)(
                        h, temb, deterministic
                    )
            if i != n_blocks - 1:
                h = Upsample(ch, dtype=dtype, name=f"up_{i}_upsample")(h)

        h = GroupNormSiLU(
            cfg.norm_num_groups, dtype=dtype, use_pallas=cfg.use_pallas_gn,
            name="norm_out",
        )(h)
        h = nn.Conv(cfg.out_channels, (3, 3), dtype=dtype, name="conv_out")(h)
        return h.astype(jnp.float32)
