"""ModelConfig.use_pallas_gn_conv: the fused GN+SiLU+conv ResnetBlock path
must share checkpoints (identical param trees, including init values) and
match the flax composition's outputs. Runs in interpret mode on CPU; the
compiled-TPU A/B is tools/probe_sweep.py's gn_conv arm."""

import jax
import jax.numpy as jnp
import numpy as np

from drivescenegen_tpu.config import ModelConfig
from drivescenegen_tpu.models import UNet2D

TINY = dict(
    sample_size=16,
    block_out_channels=(8, 16),
    layers_per_block=1,
    norm_num_groups=2,
    attention_head_dim=8,
    dtype="float32",
)


def _init_and_run(flag: bool):
    model = UNet2D(ModelConfig(use_pallas_gn_conv=flag, **TINY))
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3), jnp.float32)
    t = jnp.array([3, 500], jnp.int32)
    params = model.init(jax.random.key(0), x, t)
    return params, model.apply(params, x, t)


def test_param_tree_identical_and_outputs_match():
    p_off, y_off = _init_and_run(False)
    p_on, y_on = _init_and_run(True)

    flat_off = jax.tree_util.tree_flatten_with_path(p_off)[0]
    flat_on = jax.tree_util.tree_flatten_with_path(p_on)[0]
    assert [k for k, _ in flat_off] == [k for k, _ in flat_on]
    for (k, a), (_, b) in zip(flat_off, flat_on):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=str(k)
        )

    np.testing.assert_allclose(
        np.asarray(y_off), np.asarray(y_on), rtol=2e-4, atol=2e-4
    )


def test_bf16_outputs_match():
    cfg = dict(TINY, dtype="bfloat16")
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 3), jnp.float32)
    t = jnp.array([250], jnp.int32)
    m_off = UNet2D(ModelConfig(use_pallas_gn_conv=False, **cfg))
    m_on = UNet2D(ModelConfig(use_pallas_gn_conv=True, **cfg))
    params = m_off.init(jax.random.key(0), x, t)
    y_off = m_off.apply(params, x, t)
    y_on = m_on.apply(params, x, t)  # same params tree by the test above
    np.testing.assert_allclose(
        np.asarray(y_off), np.asarray(y_on), rtol=0.05, atol=0.05
    )


def test_dropout_keeps_unfused_path():
    """dropout>0 must silently keep the flax path (mask sits between norm2
    and conv2), not fail or change params."""
    cfg = dict(TINY)
    m = UNet2D(ModelConfig(use_pallas_gn_conv=True, dropout=0.1, **cfg))
    x = jnp.ones((1, 16, 16, 3), jnp.float32)
    t = jnp.array([5], jnp.int32)
    params = m.init(jax.random.key(0), x, t)
    y = m.apply(params, x, t, deterministic=True)
    assert np.isfinite(np.asarray(y)).all()
