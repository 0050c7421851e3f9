"""DP scaling record on the virtual CPU mesh (VERDICT r2 item 6).

Runs the real sharded train step (same code path as scripts/train.py) for
mesh data={1,2,4,8} x model=1 at tiny shapes on an 8-device virtual CPU
mesh, with the SAME global batch and RNG, and records:
  - per-step loss sequence (bit-equality across mesh sizes = the DP
    sharding changes the schedule of the same SPMD program, not its math)
  - steps/s over the timed window (CPU-mesh scaling shape; the absolute
    numbers are meaningless, the monotonic trend + equality is the record)

Usage:  python outputs/dp_scaling.py <data_axis>   (prints one JSON line)
        bash loop in STATUS.md regenerates the table.
"""

import json
import os
import sys
import time

if __name__ == "__main__" and os.environ.get("_DSG_DP_REEXEC") != "1":
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    env["_DSG_DP_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GLOBAL_BATCH = 8
STEPS = 12
WARMUP = 2


def main(n_data: int):
    from drivescenegen_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    from drivescenegen_tpu.config import (
        DiffusionConfig, MeshConfig, ModelConfig, TrainConfig,
    )
    from drivescenegen_tpu.diffusion import make_schedule
    from drivescenegen_tpu.models import UNet2D
    from drivescenegen_tpu.parallel import make_mesh, param_shardings, shard_batch
    from drivescenegen_tpu.training import (
        create_optimizer, init_train_state, make_train_step,
    )

    devices = jax.devices("cpu")[:n_data]
    mesh = make_mesh(MeshConfig(data=n_data, model=1), devices=devices)

    model_cfg = ModelConfig(
        sample_size=16, block_out_channels=(8, 16), layers_per_block=1,
        norm_num_groups=2, attention_head_dim=8, dtype="float32",
    )
    model = UNet2D(model_cfg)
    schedule = make_schedule(DiffusionConfig())
    tx, lr_sched = create_optimizer(TrainConfig(), total_steps=100)
    state = init_train_state(model, tx, jax.random.key(0), (16, 16, 3))
    state = state._replace(
        params=jax.device_put(state.params, param_shardings(state.params, mesh)),
        opt_state=jax.device_put(
            state.opt_state,
            jax.tree.map(
                lambda _: jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec()
                ),
                state.opt_state,
                is_leaf=lambda x: hasattr(x, "shape"),
            ),
        ),
    )

    step = jax.jit(make_train_step(model, schedule, tx, lr_sched))
    losses = []
    t0 = None
    for i in range(STEPS):
        batch = shard_batch(
            mesh,
            jax.random.normal(jax.random.key(100 + i), (GLOBAL_BATCH, 16, 16, 3)),
        )
        state, metrics = step(state, batch, jax.random.key(200 + i))
        losses.append(float(jnp.asarray(metrics["loss"])))
        if i == WARMUP - 1:
            jax.block_until_ready(state.params)
            t0 = time.perf_counter()
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "data_axis": n_data,
        "global_batch": GLOBAL_BATCH,
        "steps_per_s": round((STEPS - WARMUP) / dt, 3),
        "losses": losses,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
