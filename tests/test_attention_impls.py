import jax
import jax.numpy as jnp
import numpy as np

from drivescenegen_tpu.config import ModelConfig
from drivescenegen_tpu.models import UNet2D


def _cfg(impl):
    return ModelConfig(
        sample_size=16, block_out_channels=(8, 16), layers_per_block=1,
        norm_num_groups=4, attention_head_dim=8, dtype="float32",
        attention_impl=impl,
    )


def test_flash_config_param_compatible_and_falls_back_on_cpu():
    """attention_impl must not change the param tree; on CPU 'flash'
    silently uses the XLA path, so outputs are identical."""
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    m_xla = UNet2D(_cfg("xla"))
    m_flash = UNet2D(_cfg("flash"))
    p1 = m_xla.init(jax.random.key(0), x, t)
    p2 = m_flash.init(jax.random.key(0), x, t)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)

    xin = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
    out1 = m_xla.apply(p1, xin, jnp.array([3, 7]))
    out2 = m_flash.apply(p1, xin, jnp.array([3, 7]))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
