"""Parity tests for the fused GN+SiLU+conv3x3 Pallas kernel
(ops/pallas/gn_silu_conv.py), run in interpret mode on the CPU mesh.
Compiled-TPU parity is exercised by tools/probe_sweep.py's gn_conv arm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drivescenegen_tpu.ops.pallas.gn_silu_conv import (
    gn_silu_conv3x3,
    reference_gn_silu_conv3x3,
)


def _flax_oracle(x, scale, bias, kernel, conv_bias, groups):
    """Independent oracle: flax GroupNorm -> silu -> lax conv in f32."""
    import flax.linen as nn

    gn = nn.GroupNorm(num_groups=groups, epsilon=1e-6)
    y = gn.apply(
        {"params": {"scale": scale, "bias": bias}}, x.astype(jnp.float32)
    )
    y = jax.nn.silu(y)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    out = jax.lax.conv_general_dilated(
        y, kernel.astype(jnp.float32), (1, 1), "SAME", dimension_numbers=dn
    )
    return out + conv_bias


def _rand_case(rng, B, H, W, C, Co, groups, dtype=jnp.float32):
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), dtype)
    scale = jnp.asarray(rng.normal(size=(C,)) * 0.2 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(3, 3, C, Co)) * 0.1, jnp.float32)
    conv_bias = jnp.asarray(rng.normal(size=(Co,)) * 0.1, jnp.float32)
    return x, scale, bias, kernel, conv_bias


@pytest.mark.parametrize(
    "B,H,W,C,Co,groups",
    [
        (2, 16, 16, 8, 8, 4),     # multi-tile (TH<H) exercised via budget? no — small
        (1, 8, 8, 8, 16, 2),      # Co != C
        (2, 32, 8, 16, 16, 4),    # tall
    ],
)
def test_fused_matches_flax_oracle(rng, B, H, W, C, Co, groups):
    x, scale, bias, kernel, conv_bias = _rand_case(rng, B, H, W, C, Co, groups)
    got = gn_silu_conv3x3(
        x, scale, bias, kernel, conv_bias, groups=groups, interpret=True
    )
    want = _flax_oracle(x, scale, bias, kernel, conv_bias, groups)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_multi_tile_halo_rows(rng):
    """Force several row tiles so the halo path (pre-transformed rows +
    zero borders) carries real data across tile boundaries."""
    from drivescenegen_tpu.ops.pallas import gn_silu_conv as m

    orig = m._pick_tile
    m._pick_tile = lambda *a, **k: 4  # 4-row tiles -> 8 tiles at H=32
    try:
        x, scale, bias, kernel, conv_bias = _rand_case(rng, 2, 32, 8, 8, 8, 4)
        got = gn_silu_conv3x3(
            x, scale, bias, kernel, conv_bias, groups=4, interpret=True
        )
    finally:
        m._pick_tile = orig
    want = _flax_oracle(x, scale, bias, kernel, conv_bias, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_reference_composition_matches_oracle(rng):
    x, scale, bias, kernel, conv_bias = _rand_case(rng, 2, 16, 16, 8, 8, 4)
    got = reference_gn_silu_conv3x3(x, scale, bias, kernel, conv_bias, groups=4)
    want = _flax_oracle(x, scale, bias, kernel, conv_bias, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_bf16_activations(rng):
    """bf16 x: fused and reference compositions agree to bf16 tolerance."""
    x, scale, bias, kernel, conv_bias = _rand_case(
        rng, 2, 16, 8, 8, 8, 4, dtype=jnp.bfloat16
    )
    got = gn_silu_conv3x3(
        x, scale, bias, kernel, conv_bias, groups=4, interpret=True
    )
    assert got.dtype == jnp.bfloat16
    want = reference_gn_silu_conv3x3(x, scale, bias, kernel, conv_bias, groups=4)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_border_zero_padding_semantics(rng):
    """A constant-one input makes padding mistakes (silu(affine(0)) vs 0)
    show up directly in the border rows/cols."""
    C = 8
    x = jnp.ones((1, 8, 8, C), jnp.float32)
    # Constant input -> GN output = bias; pick bias so silu(bias) != 0.
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.full((C,), 2.0, jnp.float32)
    kernel = jnp.ones((3, 3, C, C), jnp.float32)
    conv_bias = jnp.zeros((C,), jnp.float32)
    got = gn_silu_conv3x3(x, scale, bias, kernel, conv_bias, groups=4,
                          interpret=True)
    want = _flax_oracle(x, scale, bias, kernel, conv_bias, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # Corners see 4 taps, edges 6, interior 9 — if padding leaked, these
    # ratios would be wrong.
    g = np.asarray(got)[0, :, :, 0]
    assert abs(g[0, 0] / g[4, 4] - 4.0 / 9.0) < 1e-3
    assert abs(g[0, 4] / g[4, 4] - 6.0 / 9.0) < 1e-3
