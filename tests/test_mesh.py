import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from drivescenegen_tpu.config import MeshConfig
from drivescenegen_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
)


def test_make_mesh_all_data(eight_devices):
    mesh = make_mesh(MeshConfig())
    assert mesh.shape == {"data": 8, "model": 1}


def test_make_mesh_2d(eight_devices):
    mesh = make_mesh(MeshConfig(data=4, model=2))
    assert mesh.shape == {"data": 4, "model": 2}


def test_shard_batch_places_on_data_axis(eight_devices):
    mesh = make_mesh(MeshConfig())
    batch = jnp.ones((16, 8, 8, 3))
    sharded = shard_batch(mesh, batch)
    assert sharded.sharding.is_equivalent_to(batch_sharding(mesh, 4), 4)
    # Each device holds 16/8 = 2 rows of the batch.
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(2, 8, 8, 3)}


def test_param_shardings_tp_rules(eight_devices):
    mesh = make_mesh(MeshConfig(data=4, model=2))
    params = {
        "mid_attn": {"qkv": {"kernel": jnp.zeros((64, 192))}},
        "time_mlp": {"dense1": {"kernel": jnp.zeros((64, 256))},
                     "dense2": {"kernel": jnp.zeros((256, 256))}},
        "conv_in": {"kernel": jnp.zeros((3, 3, 3, 64))},
    }
    shardings = param_shardings(params, mesh)
    assert shardings["mid_attn"]["qkv"]["kernel"].spec == P(None, "model")
    assert shardings["time_mlp"]["dense1"]["kernel"].spec == P(None, "model")
    assert shardings["time_mlp"]["dense2"]["kernel"].spec == P("model", None)
    assert shardings["conv_in"]["kernel"].spec == P()


def test_param_shardings_uneven_falls_back(eight_devices):
    mesh = make_mesh(MeshConfig(data=4, model=2))
    params = {"mid_attn": {"qkv": {"kernel": jnp.zeros((64, 63))}}}  # 63 % 2 != 0
    shardings = param_shardings(params, mesh)
    assert shardings["mid_attn"]["qkv"]["kernel"].spec == P()


def test_dp_matmul_matches_single_device(eight_devices):
    """A sharded computation must be numerically identical to unsharded."""
    mesh = make_mesh(MeshConfig())
    x = np.random.default_rng(0).normal(size=(16, 32)).astype(np.float32)
    w = np.random.default_rng(1).normal(size=(32, 8)).astype(np.float32)

    def f(x, w):
        return jnp.tanh(x @ w).sum(axis=1)

    expected = jax.jit(f)(x, w)
    xs = shard_batch(mesh, jnp.asarray(x))
    got = jax.jit(f)(xs, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-6)
