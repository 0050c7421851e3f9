"""Batch-parallel sampling over the mesh: the generation path constrains the
sampler output to be sharded over "data" and XLA partitions the whole scan
(scripts/generation.py). Validated here on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from drivescenegen_tpu.config import DiffusionConfig, MeshConfig, ModelConfig
from drivescenegen_tpu.diffusion import ddim_sample, make_schedule
from drivescenegen_tpu.models import UNet2D
from drivescenegen_tpu.parallel import batch_sharding, make_mesh

TINY = ModelConfig(
    sample_size=16, block_out_channels=(8, 16), layers_per_block=1,
    norm_num_groups=4, attention_head_dim=8, dtype="float32",
)


def _setup():
    model = UNet2D(TINY)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,), jnp.int32)
    )
    schedule = make_schedule(DiffusionConfig())

    def denoise(x, t):
        return model.apply(params, x, t)

    return denoise, schedule


def test_sharded_sampling_matches_single_device(eight_devices):
    denoise, schedule = _setup()
    shape = (8, 16, 16, 3)
    key = jax.random.key(3)

    plain = jax.jit(lambda k: ddim_sample(denoise, schedule, shape, k, 5))(key)

    mesh = make_mesh(MeshConfig())
    sharded_fn = jax.jit(
        lambda k: ddim_sample(denoise, schedule, shape, k, 5),
        out_shardings=batch_sharding(mesh, 4),
    )
    sharded = sharded_fn(key)

    # Output is actually distributed across all 8 devices.
    assert len(sharded.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(1, 16, 16, 3)}
    # And numerically identical to the unsharded run (partitionable threefry).
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(plain), atol=2e-5
    )


def test_sharded_dpm_sampling_matches_single_device(eight_devices):
    """The DPM-Solver++(2M) scan partitions over the data axis exactly like
    DDIM (its carry adds the previous data prediction, sharded the same
    way); sharded output must equal the single-device run."""
    from drivescenegen_tpu.diffusion import dpmpp_2m_sample

    denoise, schedule = _setup()
    shape = (8, 16, 16, 3)
    key = jax.random.key(9)

    plain = jax.jit(lambda k: dpmpp_2m_sample(denoise, schedule, shape, k, 6))(key)

    mesh = make_mesh(MeshConfig())
    sharded = jax.jit(
        lambda k: dpmpp_2m_sample(denoise, schedule, shape, k, 6),
        out_shardings=batch_sharding(mesh, 4),
    )(key)

    assert len(sharded.sharding.device_set) == 8
    # Slightly looser than the DDIM test: the second-order multistep
    # combination (w_c*x0 + w_p*x0_prev with |w_p| up to ~0.5) amplifies the
    # sharded-vs-unsharded compilation's fusion/reassociation noise across
    # steps; observed max diff ~3e-5 on the CPU mesh.
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain), atol=1e-4)


def test_sharded_sde_sampling_matches_single_device(eight_devices):
    """SDE-DPM-Solver++(2M) adds a per-step noise draw to the scan body;
    with partitionable threefry the sharded draw equals the single-device
    one, so batch-sharded sampling must stay numerically identical."""
    from drivescenegen_tpu.diffusion import dpmpp_2m_sde_sample

    denoise, schedule = _setup()
    shape = (8, 16, 16, 3)
    key = jax.random.key(7)

    plain = jax.jit(
        lambda k: dpmpp_2m_sde_sample(denoise, schedule, shape, k, 5)
    )(key)

    mesh = make_mesh(MeshConfig())
    sharded_fn = jax.jit(
        lambda k: dpmpp_2m_sde_sample(denoise, schedule, shape, k, 5),
        out_shardings=batch_sharding(mesh, 4),
    )
    sharded = sharded_fn(key)

    assert len(sharded.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain), atol=2e-5)
