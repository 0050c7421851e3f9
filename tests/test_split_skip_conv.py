"""split_skip_conv (skip-concat elimination) must be a pure program
rewrite: identical parameter tree, outputs equal to float tolerance.

The rewrite (models/unet2d.py SplitInputConv + GroupNormSiLU pair mode)
replaces concat(h, skip) -> GN -> conv with per-input GN and a kernel split
along the input-channel dim; valid because GroupNorm groups never straddle
the concat boundary and convolution is linear in its input channels.
"""

import jax
import jax.numpy as jnp
import numpy as np

from drivescenegen_tpu.config import ModelConfig
from drivescenegen_tpu.models import UNet2D


def _cfg(split, dtype="float32"):
    return ModelConfig(
        sample_size=32,
        block_out_channels=(8, 16),
        layers_per_block=1,
        norm_num_groups=4,
        attention_head_dim=8,
        dtype=dtype,
        split_skip_conv=split,
    )


def test_same_param_tree_and_outputs_fp32():
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    t = jnp.array([3, 977], jnp.int32)

    base = UNet2D(_cfg(False))
    split = UNet2D(_cfg(True))
    params = base.init(jax.random.key(0), x, t)
    params_split = split.init(jax.random.key(0), x, t)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_split = jax.tree_util.tree_flatten_with_path(params_split)[0]
    assert [(p, v.shape) for p, v in flat] == [
        (p, v.shape) for p, v in flat_split
    ], "parameter trees must be identical (checkpoint compatibility)"
    # Same init RNG -> bitwise-identical initial parameters.
    for (pa, va), (pb, vb) in zip(flat, flat_split):
        np.testing.assert_array_equal(va, vb, err_msg=str(pa))

    y_base = base.apply(params, x, t)
    y_split = split.apply(params, x, t)  # base params through the split path
    np.testing.assert_allclose(
        np.asarray(y_split), np.asarray(y_base), atol=2e-5, rtol=2e-5
    )


def test_outputs_close_bf16():
    """With bf16 activations the reassociation error is bounded by bf16
    resolution of the activations, not drift."""
    x = jax.random.normal(jax.random.key(2), (1, 32, 32, 3))
    t = jnp.array([11], jnp.int32)
    base = UNet2D(_cfg(False, "bfloat16"))
    split = UNet2D(_cfg(True, "bfloat16"))
    params = base.init(jax.random.key(0), x, t)
    y_base = np.asarray(base.apply(params, x, t))
    y_split = np.asarray(split.apply(params, x, t))
    scale = np.abs(y_base).max()
    assert np.abs(y_split - y_base).max() <= 0.05 * max(scale, 1e-3)


def test_multi_gn_matches_concat_gn_with_straddling_groups():
    """The pair-mode GN must equal GN(concat) even when a group straddles
    the input boundary (6+10 channels under 4 groups: group size 4, the
    first input ends mid-group) — the real flagship up blocks hit this
    (512+256 channels under 32 groups)."""
    from drivescenegen_tpu.ops.pallas.group_norm import (
        reference_group_norm_silu,
        reference_group_norm_silu_multi,
    )

    k = jax.random.key(3)
    a = jax.random.normal(k, (2, 8, 8, 6))
    b = jax.random.normal(jax.random.fold_in(k, 1), (2, 8, 8, 10))
    scale = jax.random.normal(jax.random.fold_in(k, 2), (16,))
    bias = jax.random.normal(jax.random.fold_in(k, 3), (16,))
    want = reference_group_norm_silu(
        jnp.concatenate([a, b], axis=-1), scale, bias, groups=4
    )
    got_a, got_b = reference_group_norm_silu_multi(
        (a, b), scale, bias, groups=4
    )
    got = jnp.concatenate([got_a, got_b], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_split_mode_sharded_matches_unsharded(eight_devices):
    """DP4xTP2 forward through the split path equals the single-device
    result (the TP rules pattern-match conv1/shortcut by name and the
    SplitInputConv kernels keep nn.Conv's exact param layout)."""
    from drivescenegen_tpu.config import MeshConfig
    from drivescenegen_tpu.parallel import make_mesh, param_shardings, shard_batch

    cfg = _cfg(True)
    model = UNet2D(cfg)
    x = jax.random.normal(jax.random.key(4), (4, 32, 32, 3))
    t = jnp.array([1, 2, 3, 4], jnp.int32)
    params = model.init(jax.random.key(0), x, t)
    y_ref = np.asarray(model.apply(params, x, t))

    mesh = make_mesh(MeshConfig(data=4, model=2))
    sharded_params = jax.device_put(params, param_shardings(params, mesh))
    y_sh = np.asarray(
        jax.jit(model.apply)(sharded_params, shard_batch(mesh, x), t)
    )
    np.testing.assert_allclose(y_sh, y_ref, atol=2e-5, rtol=2e-5)
