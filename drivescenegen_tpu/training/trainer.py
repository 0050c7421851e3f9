"""Training step for the DDPM UNet (reference: pipeline/training_pipeline.py:46-97).

Per step (matching the reference semantics exactly):
  noise ~ N(0, I); t ~ U[0, num_train_timesteps); x_t = add_noise(x0, noise, t);
  loss = MSE(model(x_t, t), noise); grad-clip global-norm 1.0; AdamW with
  cosine-warmup LR decaying to 0 over the full run (diffusers
  get_cosine_schedule_with_warmup, scripts/train.py:67-71).

TPU-native: the step is a pure jitted function; the global batch is sharded
over the mesh "data" axis and XLA turns the gradient reduction into a psum
over ICI. Loss math in fp32, model activations bf16.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from drivescenegen_tpu.config import DiffusionConfig, ModelConfig, TrainConfig
from drivescenegen_tpu.diffusion.schedule import DiffusionSchedule
from drivescenegen_tpu.models.unet2d import UNet2D


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array
    # EMA of params (None when disabled). Standard diffusion practice the
    # reference lacks: sampling from the average is markedly more stable.
    ema_params: Optional[dict] = None


def create_optimizer(
    cfg: TrainConfig, total_steps: int
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    lr = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=cfg.lr_warmup_steps,
        decay_steps=max(total_steps, cfg.lr_warmup_steps + 1),
        end_value=0.0,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adamw(
            learning_rate=lr,
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
        ),
    )
    return tx, lr


def init_train_state(
    model: UNet2D,
    tx: optax.GradientTransformation,
    key: jax.Array,
    sample_shape: Tuple[int, ...],
    ema: bool = False,
) -> TrainState:
    x = jnp.zeros((1,) + tuple(sample_shape), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    params = model.init(key, x, t)
    opt_state = tx.init(params)
    return TrainState(
        params=params,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
    )


def make_train_step(
    model: UNet2D,
    schedule: DiffusionSchedule,
    tx: optax.GradientTransformation,
    lr_schedule: Optional[optax.Schedule] = None,
    cond_dropout: float = 0.1,
    ema_decay: float = 0.0,
) -> Callable:
    """Returns step(state, batch, key) -> (state, metrics). Jit outside.

    Conditional models (model.cfg.cond_channels > 0) split the batch by
    channel: the conditioning channels come first (map R/G), the diffusion
    target follows (agent B), matching the raster layout. Cond-dropout
    zeroes the map per-sample to train the CFG null branch.
    """
    cond_ch = model.cfg.cond_channels

    use_dropout = model.cfg.dropout > 0.0

    def train_step(state: TrainState, batch: jax.Array, key: jax.Array):
        if batch.dtype == jnp.uint8:
            # Raw 8-bit batch (RasterDataset raw mode): normalize on device,
            # exactly (x/255 - 0.5)/0.5 for 8-bit sources.
            batch = batch.astype(jnp.float32) / 127.5 - 1.0
        step_key = jax.random.fold_in(key, state.step)
        noise_key, t_key, drop_key, do_key = jax.random.split(step_key, 4)

        if cond_ch > 0:
            from drivescenegen_tpu.diffusion.cfg import apply_cond_dropout

            cond = apply_cond_dropout(batch[..., :cond_ch], drop_key, cond_dropout)
            target = batch[..., cond_ch:]
        else:
            cond = None
            target = batch

        B = target.shape[0]
        noise = jax.random.normal(noise_key, target.shape, jnp.float32)
        t = jax.random.randint(t_key, (B,), 0, schedule.num_train_timesteps)
        noisy = schedule.add_noise(target, noise, t)

        def loss_fn(params):
            if use_dropout:
                eps_hat = model.apply(
                    params, noisy, t, cond, deterministic=False,
                    rngs={"dropout": do_key},
                )
            else:
                eps_hat = model.apply(params, noisy, t, cond)
            return jnp.mean((eps_hat.astype(jnp.float32) - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = state.ema_params
        if ema_decay > 0.0 and ema_params is not None:
            # Decay warmup (diffusers EMAModel-style): early steps use a
            # much smaller decay so the average forgets the random init;
            # without this a 5k-step run at decay 0.9999 would export
            # weights that are still ~60% random init.
            step_f = state.step.astype(jnp.float32) + 1.0
            decay = jnp.minimum(ema_decay, (1.0 + step_f) / (10.0 + step_f))
            ema_params = jax.tree.map(
                lambda e, p: e * decay + p * (1.0 - decay), ema_params, params
            )
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1,
            ema_params=ema_params,
        )

        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        return new_state, metrics

    return train_step
