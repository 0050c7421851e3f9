"""Classifier-free guidance for the map-conditioned model
(BASELINE.json config-5 — a capability beyond the reference, which is
unconditional only).

The conditional UNet takes the map layers (R/G lane-direction channels) as
channel-concatenated conditioning; the unconditional branch sees zero
conditioning (the same null token used by cond-dropout during training).
Guided prediction: eps = eps_uncond + g * (eps_cond - eps_uncond), evaluated
in ONE batched forward pass (batch doubling, TPU-friendly).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def make_guided_denoise(
    apply_fn: Callable,
    params,
    cond: jax.Array,  # [B, H, W, C_cond]
    guidance_scale: float = 1.0,
) -> Callable:
    """Returns denoise_fn(x, t) -> eps with classifier-free guidance.

    guidance_scale semantics (standard CFG):
      0 -> unconditional, 1 -> plain conditional, >1 -> amplified guidance.
    """
    if guidance_scale == 1.0:

        def denoise_cond(x, t):
            return apply_fn(params, x, t, cond)

        return denoise_cond

    null_cond = jnp.zeros_like(cond)

    def denoise_guided(x, t):
        x2 = jnp.concatenate([x, x], axis=0)
        c2 = jnp.concatenate([cond, null_cond], axis=0)
        eps2 = apply_fn(params, x2, t, c2)
        eps_c, eps_u = jnp.split(eps2, 2, axis=0)
        return eps_u + guidance_scale * (eps_c - eps_u)

    return denoise_guided


def apply_cond_dropout(
    cond: jax.Array, key: jax.Array, dropout_prob: float
) -> jax.Array:
    """Zero the conditioning per-sample with probability dropout_prob
    (trains the null branch used by CFG)."""
    if dropout_prob <= 0.0:
        return cond
    B = cond.shape[0]
    keep = jax.random.bernoulli(key, 1.0 - dropout_prob, (B,))
    shape = (B,) + (1,) * (cond.ndim - 1)
    return cond * keep.reshape(shape).astype(cond.dtype)
