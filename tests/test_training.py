import jax
import jax.numpy as jnp
import numpy as np

from drivescenegen_tpu.config import DiffusionConfig, MeshConfig, ModelConfig, TrainConfig
from drivescenegen_tpu.diffusion import make_schedule
from drivescenegen_tpu.models import UNet2D
from drivescenegen_tpu.parallel import make_mesh, param_shardings, shard_batch
from drivescenegen_tpu.training import (
    create_optimizer,
    init_train_state,
    make_train_step,
)

TINY = ModelConfig(
    sample_size=16,
    block_out_channels=(8, 16),
    layers_per_block=1,
    norm_num_groups=4,
    attention_head_dim=8,
    dtype="float32",
)


def _setup(batch=4, lr=1e-3):
    model = UNet2D(TINY)
    schedule = make_schedule(DiffusionConfig())
    cfg = TrainConfig(batch_size=batch, learning_rate=lr, lr_warmup_steps=10)
    tx, lr_sched = create_optimizer(cfg, total_steps=1000)
    state = init_train_state(model, tx, jax.random.key(0), (16, 16, 3))
    step = make_train_step(model, schedule, tx, lr_sched)
    return model, schedule, state, step


def test_loss_decreases_overfit_one_batch():
    """Tiny-UNet overfit check: loss on a fixed batch must drop substantially."""
    _, _, state, step = _setup(lr=2e-3)
    batch = jax.random.normal(jax.random.key(7), (4, 16, 16, 3)) * 0.5
    jstep = jax.jit(step)
    key = jax.random.key(1)
    losses = []
    for _ in range(60):
        state, metrics = jstep(state, batch, key)
        losses.append(float(metrics["loss"]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first * 0.7, f"loss did not decrease: {first:.4f} -> {last:.4f}"
    assert np.isfinite(losses).all()


def test_metrics_and_step_counter():
    _, _, state, step = _setup()
    batch = jnp.zeros((4, 16, 16, 3))
    state, metrics = jax.jit(step)(state, batch, jax.random.key(0))
    assert int(state.step) == 1
    assert set(metrics) == {"loss", "grad_norm", "lr"}
    assert float(metrics["grad_norm"]) > 0


def test_dp_step_matches_single_device(eight_devices):
    """The DP-sharded train step must match the unsharded step numerically."""
    _, _, state, step = _setup(batch=8)
    batch = jax.random.normal(jax.random.key(3), (8, 16, 16, 3))
    key = jax.random.key(9)

    state_a, metrics_a = jax.jit(step)(state, batch, key)

    mesh = make_mesh(MeshConfig())
    sharded_batch = shard_batch(mesh, batch)
    state_b, metrics_b = jax.jit(step)(state, sharded_batch, key)

    np.testing.assert_allclose(
        float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=2e-5
    )
    la = jax.tree.leaves(state_a.params)
    lb = jax.tree.leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_step_matches_single_device(eight_devices):
    """Conv/attention TP shardings (model=2) must not change training
    numerics: same loss and same updated params as the unsharded step."""
    _, _, state, step = _setup(batch=8)
    batch = jax.random.normal(jax.random.key(3), (8, 16, 16, 3))
    key = jax.random.key(9)

    state_a, metrics_a = jax.jit(step)(state, batch, key)

    mesh = make_mesh(MeshConfig(data=4, model=2))
    shardings = param_shardings(state.params, mesh)
    state_b0 = state._replace(params=jax.device_put(state.params, shardings))
    state_b, metrics_b = jax.jit(step)(state_b0, shard_batch(mesh, batch), key)

    np.testing.assert_allclose(
        float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=2e-5
    )
    for a, b in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tp_sharded_params_compile_and_run(eight_devices):
    """Tensor-parallel param shardings (model axis = 2) execute a full step."""
    mesh = make_mesh(MeshConfig(data=4, model=2))
    _, _, state, step = _setup(batch=8)
    shardings = param_shardings(state.params, mesh)
    params = jax.device_put(state.params, shardings)
    state = state._replace(params=params)
    batch = shard_batch(mesh, jax.random.normal(jax.random.key(4), (8, 16, 16, 3)))
    state2, metrics = jax.jit(step)(state, batch, jax.random.key(5))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_supervise_retries_until_success(tmp_path):
    """The failure-recovery wrapper relaunches a crashed trainer until it
    succeeds (device-health gate stubbed healthy)."""
    import sys

    from drivescenegen_tpu.scripts.train import supervise

    marker = tmp_path / "attempts"
    cmd = [sys.executable, "-c",
           "import os,sys; p=%r; n=int(open(p).read()) if os.path.exists(p) "
           "else 0; open(p,'w').write(str(n+1)); sys.exit(0 if n>=2 else 1)"
           % str(marker)]
    rc = supervise(cmd, retries=5, health_check=lambda: True, sleep_s=0.01)
    assert rc == 0
    assert marker.read_text() == "3"  # two crashes + one success


def test_supervise_gives_up_after_budget(tmp_path):
    import sys

    from drivescenegen_tpu.scripts.train import supervise

    cmd = [sys.executable, "-c", "import sys; sys.exit(3)"]
    rc = supervise(cmd, retries=2, health_check=lambda: True, sleep_s=0.01)
    assert rc == 3


def test_supervise_kills_hung_child_on_stalled_progress(tmp_path):
    """A child that hangs without exiting (dead device tunnel: futex-wait at
    0% CPU, step log frozen) is killed once the progress dir goes stale for
    stall_s, and treated as a crash."""
    import sys
    import time

    from drivescenegen_tpu.scripts.train import supervise

    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "drivescenegen.log").write_text("step 1\n")
    t0 = time.time()
    cmd = [sys.executable, "-c", "import time; time.sleep(600)"]
    rc = supervise(cmd, retries=0, health_check=lambda: True,
                   progress_path=str(logs), stall_s=0.5)
    assert rc == -9
    assert time.time() - t0 < 120  # killed by the watchdog, not wait()


def test_supervise_waits_while_progress_advances(tmp_path):
    """Fresh mtimes under progress_path keep the watchdog quiet; a clean
    exit is returned normally."""
    import sys

    from drivescenegen_tpu.scripts.train import supervise

    logs = tmp_path / "logs"
    logs.mkdir()
    # Child writes progress itself then exits 0.
    cmd = [sys.executable, "-c",
           "import pathlib,time\n"
           "p = pathlib.Path(%r)/'drivescenegen.log'\n"
           "for i in range(3):\n"
           "    p.write_text(str(i)); time.sleep(0.2)\n"
           % str(logs)]
    rc = supervise(cmd, retries=0, health_check=lambda: True,
                   progress_path=str(logs), stall_s=3600.0)
    assert rc == 0
