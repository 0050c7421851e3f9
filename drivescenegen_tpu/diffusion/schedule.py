"""DDPM noise schedule, matching diffusers DDPMScheduler() defaults
(reference: scripts/train.py:65 instantiates DDPMScheduler() with
num_train_timesteps=1000, linear betas 1e-4..0.02, epsilon prediction,
clip_sample=True, variance_type="fixed_small").

Everything is a pure function of precomputed coefficient arrays so the whole
schedule lives on-device and the samplers can lax.scan over timesteps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from drivescenegen_tpu.config import DiffusionConfig


def _bcast(coef: jax.Array, x: jax.Array) -> jax.Array:
    """Broadcast a scalar or [B] coefficient against x's trailing dims."""
    coef = jnp.asarray(coef)
    return coef.reshape(coef.shape + (1,) * (x.ndim - coef.ndim))


class DiffusionSchedule(NamedTuple):
    betas: jax.Array  # [T]
    alphas: jax.Array  # [T]
    alphas_cumprod: jax.Array  # [T]
    sqrt_alphas_cumprod: jax.Array  # [T]
    sqrt_one_minus_alphas_cumprod: jax.Array  # [T]
    num_train_timesteps: int
    clip_sample: bool
    prediction_type: str

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """Forward diffusion q(x_t | x_0) (diffusers DDPMScheduler.add_noise).

        `t` may be a scalar (one timestep for the whole batch) or [B].
        """
        sqrt_acp = _bcast(self.sqrt_alphas_cumprod[t], x0)
        sqrt_1macp = _bcast(self.sqrt_one_minus_alphas_cumprod[t], x0)
        return sqrt_acp * x0.astype(jnp.float32) + sqrt_1macp * noise

    def pred_x0_from_eps(self, x_t: jax.Array, eps: jax.Array, t: jax.Array) -> jax.Array:
        sqrt_acp = _bcast(self.sqrt_alphas_cumprod[t], x_t)
        sqrt_1macp = _bcast(self.sqrt_one_minus_alphas_cumprod[t], x_t)
        x0 = (x_t - sqrt_1macp * eps) / sqrt_acp
        if self.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0


def make_schedule(cfg: DiffusionConfig | None = None) -> DiffusionSchedule:
    cfg = cfg or DiffusionConfig()
    T = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        betas = jnp.linspace(cfg.beta_start, cfg.beta_end, T, dtype=jnp.float32)
    elif cfg.beta_schedule == "scaled_linear":
        betas = (
            jnp.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, T, dtype=jnp.float32)
            ** 2
        )
    elif cfg.beta_schedule == "squaredcos_cap_v2":
        # Nichol & Dhariwal cosine schedule.
        def alpha_bar(s):
            return jnp.cos((s + 0.008) / 1.008 * jnp.pi / 2) ** 2

        s = jnp.arange(T, dtype=jnp.float32)
        betas = jnp.clip(1.0 - alpha_bar((s + 1) / T) / alpha_bar(s / T), 0.0, 0.999)
    else:
        raise ValueError(f"unknown beta schedule {cfg.beta_schedule!r}")

    alphas = 1.0 - betas
    alphas_cumprod = jnp.cumprod(alphas)
    return DiffusionSchedule(
        betas=betas,
        alphas=alphas,
        alphas_cumprod=alphas_cumprod,
        sqrt_alphas_cumprod=jnp.sqrt(alphas_cumprod),
        sqrt_one_minus_alphas_cumprod=jnp.sqrt(1.0 - alphas_cumprod),
        num_train_timesteps=T,
        clip_sample=cfg.clip_sample,
        prediction_type=cfg.prediction_type,
    )
