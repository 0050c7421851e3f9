import jax
import jax.numpy as jnp
import numpy as np

from drivescenegen_tpu.config import DiffusionConfig, ModelConfig, TrainConfig
from drivescenegen_tpu.diffusion import make_schedule
from drivescenegen_tpu.models import UNet2D
from drivescenegen_tpu.training import create_optimizer, init_train_state, make_train_step
from drivescenegen_tpu.training.checkpoint import restore_checkpoint, save_checkpoint

TINY = ModelConfig(
    sample_size=16, block_out_channels=(8, 16), layers_per_block=1,
    norm_num_groups=4, attention_head_dim=8, dtype="float32",
)


def _setup(ema_decay):
    model = UNet2D(TINY)
    schedule = make_schedule(DiffusionConfig())
    tx, lrs = create_optimizer(TrainConfig(learning_rate=1e-3, lr_warmup_steps=2), 100)
    state = init_train_state(model, tx, jax.random.key(0), (16, 16, 3),
                             ema=ema_decay > 0)
    step = jax.jit(make_train_step(model, schedule, tx, lrs, ema_decay=ema_decay))
    return state, step


def test_ema_tracks_params_slowly():
    state, step = _setup(ema_decay=0.9)
    batch = jax.random.normal(jax.random.key(1), (4, 16, 16, 3))
    p0 = jax.tree.map(np.asarray, state.params)
    for _ in range(5):
        state, _ = step(state, batch, jax.random.key(2))
    # Params moved; EMA moved less but in the same direction.
    leaf = lambda t: np.asarray(jax.tree.leaves(t)[0])
    d_param = np.abs(leaf(state.params) - leaf(p0)).max()
    d_ema = np.abs(leaf(state.ema_params) - leaf(p0)).max()
    assert d_param > 0
    assert 0 < d_ema < d_param


def test_ema_disabled_is_none():
    state, step = _setup(ema_decay=0.0)
    assert state.ema_params is None
    batch = jnp.zeros((4, 16, 16, 3))
    state, _ = step(state, batch, jax.random.key(0))
    assert state.ema_params is None


def test_ema_checkpoint_roundtrip(tmp_path):
    state, step = _setup(ema_decay=0.99)
    batch = jax.random.normal(jax.random.key(3), (4, 16, 16, 3))
    state, _ = step(state, batch, jax.random.key(4))
    save_checkpoint(str(tmp_path), state, wait=True)

    template, _ = _setup(ema_decay=0.99)
    restored = restore_checkpoint(str(tmp_path), template)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.ema_params)[0]),
        np.asarray(jax.tree.leaves(state.ema_params)[0]),
    )
    assert int(restored.step) == 1
