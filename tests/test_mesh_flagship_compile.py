"""Flagship-shape tensor-parallel compile coverage (VERDICT r4 next #7).

tests/test_mesh.py and __graft_entry__.dryrun_multichip exercise TP at toy
channel counts (8-16); shard-rule gaps that only appear at real widths
(e.g. a norm param on a split path whose size doesn't divide, or an SPMD
propagation conflict between a sharded conv and a replicated neighbor)
would previously surface only on real multi-chip hardware. These tests
lower the FULL flagship config (256x256, channels 64-512, bf16, batch 16)
over a data=4 x model=2 mesh, and run the XLA SPMD partitioner to
completion at full channel counts on a reduced spatial size — compile
only, nothing is executed.
"""

import re

import jax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from drivescenegen_tpu.config import DiffusionConfig, MeshConfig, ModelConfig, TrainConfig
from drivescenegen_tpu.diffusion import make_schedule
from drivescenegen_tpu.models import UNet2D
from drivescenegen_tpu.parallel import batch_sharding, make_mesh, param_shardings
from drivescenegen_tpu.training import create_optimizer, init_train_state, make_train_step


def _abstract_sharded_step(mesh, model_cfg, batch_size):
    """Lowered (not compiled) sharded train step on abstract inputs."""
    model = UNet2D(model_cfg)
    schedule = make_schedule(DiffusionConfig())
    tx, lr_sched = create_optimizer(TrainConfig(), total_steps=100)

    s = model_cfg.sample_size
    state_abs = jax.eval_shape(
        lambda k: init_train_state(model, tx, k, (s, s, 3)), jax.random.key(0)
    )
    shardings = param_shardings(state_abs.params, mesh)
    repl = NamedSharding(mesh, P())

    def attach(leaf, shard):
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=shard)

    state_abs = state_abs._replace(
        params=jax.tree.map(attach, state_abs.params, shardings),
        opt_state=jax.tree.map(lambda l: attach(l, repl), state_abs.opt_state),
        step=attach(state_abs.step, repl),
    )
    batch_abs = jax.ShapeDtypeStruct(
        (batch_size, s, s, 3), "float32", sharding=batch_sharding(mesh, 4)
    )
    step = make_train_step(model, schedule, tx, lr_sched)
    lowered = jax.jit(step).lower(state_abs, batch_abs, jax.random.key(1))
    return lowered, shardings


def test_flagship_shape_tp_lowers(eight_devices):
    """The real flagship (256^2, 64-512ch, bf16, batch 16) lowers under
    DP4xTP2 with the TP rules actually applied — not all fallen back."""
    mesh = make_mesh(MeshConfig(data=4, model=2), devices=eight_devices)
    lowered, shardings = _abstract_sharded_step(mesh, ModelConfig(), batch_size=16)

    leaves = jax.tree.leaves(
        shardings, is_leaf=lambda x: isinstance(x, NamedSharding)
    )
    n_model_sharded = sum(
        1 for s in leaves if any(ax is not None for ax in s.spec)
    )
    # Flagship has 22 ResnetBlocks (conv1+conv2+time_proj+norm2 each) plus
    # attention qkv/out and the time MLP — well over 30 sharded leaves.
    assert n_model_sharded > 30, f"only {n_model_sharded} params TP-sharded"
    text = lowered.as_text()
    assert "sharding" in text  # annotations survived into StableHLO


@pytest.mark.slow
def test_full_channel_tp_compiles_spmd(eight_devices):
    """Run the SPMD partitioner to completion at FULL channel counts
    (64-512, norm groups 32, head dim 64) — spatial size reduced to 32 so
    the CPU compile stays bounded; channel-dim shard rules are what the
    partitioner validates, and those are at flagship width here."""
    mesh = make_mesh(MeshConfig(data=4, model=2), devices=eight_devices)
    cfg = ModelConfig(sample_size=32)
    lowered, _ = _abstract_sharded_step(mesh, cfg, batch_size=8)
    compiled = lowered.compile()  # raises on SPMD propagation conflicts
    hlo = compiled.as_text()
    # TP inserts cross-"model" all-reduces (the Megatron psum per block).
    assert re.search(r"all-reduce", hlo), "no all-reduce in compiled SPMD HLO"
