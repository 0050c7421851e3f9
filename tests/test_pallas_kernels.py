"""Pallas kernel correctness (interpret mode on the CPU mesh; the compiled
path is exercised on real TPU by bench.py and the sampling scripts)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drivescenegen_tpu.ops.pallas.group_norm import (
    fused_group_norm_silu,
    reference_group_norm_silu,
)


@pytest.mark.parametrize("shape,groups", [
    ((2, 16, 16, 64), 32),    # token packing path (C < 128)
    ((1, 8, 8, 128), 32),
    ((2, 4, 4, 256), 32),
    ((1, 10, 10, 64), 8),     # N not power of two -> reference fallback
])
def test_pallas_gn_silu_matches_reference(shape, groups):
    x = jax.random.normal(jax.random.key(0), shape, jnp.float32) * 2 + 0.3
    C = shape[-1]
    scale = jax.random.normal(jax.random.key(1), (C,)) * 0.5 + 1.0
    bias = jax.random.normal(jax.random.key(2), (C,)) * 0.1
    out = fused_group_norm_silu(x, scale, bias, groups, interpret=True)
    ref = reference_group_norm_silu(x, scale, bias, groups)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_reference_matches_flax_groupnorm():
    x = jax.random.normal(jax.random.key(3), (2, 8, 8, 64), jnp.float32)
    scale = jax.random.normal(jax.random.key(4), (64,)) * 0.5 + 1.0
    bias = jnp.zeros((64,))
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6)
    flax_out = nn.silu(gn.apply({"params": {"scale": scale, "bias": bias}}, x))
    ours = reference_group_norm_silu(x, scale, bias, 32)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(flax_out), atol=1e-5)


def test_unet_params_identical_across_gn_modes():
    """use_pallas_gn must not change the param tree (checkpoint compat)."""
    from drivescenegen_tpu.config import ModelConfig
    from drivescenegen_tpu.models import UNet2D

    kw = dict(sample_size=16, block_out_channels=(8, 16), layers_per_block=1,
              norm_num_groups=4, attention_head_dim=8, dtype="float32")
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    p1 = UNet2D(ModelConfig(**kw, use_pallas_gn=False)).init(jax.random.key(0), x, t)
    p2 = UNet2D(ModelConfig(**kw, use_pallas_gn=True)).init(jax.random.key(0), x, t)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gn_module_is_differentiable():
    from drivescenegen_tpu.models.unet2d import GroupNormSiLU

    m = GroupNormSiLU(groups=4, dtype=jnp.float32, use_pallas=False)
    x = jax.random.normal(jax.random.key(5), (2, 4, 4, 8))
    params = m.init(jax.random.key(6), x)

    def loss(p):
        return jnp.sum(m.apply(p, x) ** 2)

    grads = jax.grad(loss)(params)
    for g in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0
