"""DDPM ancestral and DDIM samplers as lax.scan loops.

Semantics match diffusers' DDPMScheduler.step (variance "fixed_small",
clip_sample) and DDIMScheduler.step (leading timestep spacing, eta,
set_alpha_to_one) — the samplers the reference drives via DDPMPipeline
(reference: scripts/generation.py:14-20, pipeline/training_pipeline.py:26-31).

The denoise function is traced ONCE: the scan body indexes a precomputed
timestep array, so a 750-step DDPM chain compiles as a single loop.

`denoise_fn(x, t) -> eps` where x is [B, H, W, C] and t is a scalar int32.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from drivescenegen_tpu.diffusion.schedule import DiffusionSchedule


def ddpm_timesteps(schedule: DiffusionSchedule, num_inference_steps: int) -> jnp.ndarray:
    """Descending timestep array (diffusers DDPMScheduler.set_timesteps)."""
    T = schedule.num_train_timesteps
    num_inference_steps = min(num_inference_steps, T)
    step_ratio = T // num_inference_steps
    ts = (jnp.arange(0, num_inference_steps) * step_ratio).round().astype(jnp.int32)
    return ts[::-1]


def ddim_timesteps(
    schedule: DiffusionSchedule,
    num_inference_steps: int,
    spacing: str = "leading",
) -> jnp.ndarray:
    """Descending timestep array. "leading" is the diffusers DDIMScheduler
    default (starts at T - T//n, parity with the reference's pipeline);
    "trailing" starts at T-1 so the chain's first step matches the pure-
    noise prior exactly — at low step counts leading spacing never visits
    the highest-noise timesteps and leaves a signal-leak artifact (Lin et
    al., "Common Diffusion Noise Schedules and Sample Steps are Flawed",
    arXiv:2305.08891)."""
    if spacing == "leading":
        return ddpm_timesteps(schedule, num_inference_steps)
    if spacing != "trailing":
        raise ValueError(f"unknown timestep spacing {spacing!r}")
    T = schedule.num_train_timesteps
    n = min(num_inference_steps, T)
    step_ratio = T / n
    ts = (jnp.round(jnp.arange(T, 0, -step_ratio)) - 1).astype(jnp.int32)
    return ts


def ddpm_step(
    schedule: DiffusionSchedule,
    x_t: jax.Array,
    eps: jax.Array,
    t: jax.Array,
    prev_t: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """One ancestral DDPM step x_t -> x_{t-1} (DDPMScheduler.step)."""
    acp_t = schedule.alphas_cumprod[t]
    acp_prev = jnp.where(prev_t >= 0, schedule.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)
    beta_prod_t = 1.0 - acp_t
    beta_prod_prev = 1.0 - acp_prev
    alpha_t = acp_t / acp_prev  # current (possibly strided) alpha
    beta_t = 1.0 - alpha_t

    x0 = schedule.pred_x0_from_eps(x_t, eps, t)

    x0_coeff = jnp.sqrt(acp_prev) * beta_t / beta_prod_t
    xt_coeff = jnp.sqrt(alpha_t) * beta_prod_prev / beta_prod_t
    mean = x0_coeff * x0 + xt_coeff * x_t

    # variance_type == "fixed_small"
    variance = jnp.clip(beta_prod_prev / beta_prod_t * beta_t, 1e-20, None)
    sigma = jnp.where(t > 0, jnp.sqrt(variance), 0.0)
    return mean + sigma * noise


def ddim_step(
    schedule: DiffusionSchedule,
    x_t: jax.Array,
    eps: jax.Array,
    t: jax.Array,
    prev_t: jax.Array,
    noise: jax.Array,
    eta: float = 0.0,
) -> jax.Array:
    """One DDIM step (DDIMScheduler.step, set_alpha_to_one=True)."""
    acp_t = schedule.alphas_cumprod[t]
    acp_prev = jnp.where(prev_t >= 0, schedule.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)

    x0 = schedule.pred_x0_from_eps(x_t, eps, t)
    # Recompute eps from the (possibly clipped) x0, as diffusers does.
    eps = (x_t - jnp.sqrt(acp_t) * x0) / jnp.sqrt(1.0 - acp_t)

    variance = (1.0 - acp_prev) / (1.0 - acp_t) * (1.0 - acp_t / acp_prev)
    sigma = eta * jnp.sqrt(jnp.clip(variance, 0.0, None))

    dir_xt = jnp.sqrt(jnp.clip(1.0 - acp_prev - sigma**2, 0.0, None)) * eps
    x_prev = jnp.sqrt(acp_prev) * x0 + dir_xt
    if eta > 0:
        x_prev = x_prev + sigma * noise
    return x_prev


def _sample_loop(
    denoise_fn: Callable,
    schedule: DiffusionSchedule,
    shape,
    key: jax.Array,
    timesteps: jnp.ndarray,
    step_fn,
    unroll: int = 1,
) -> jax.Array:
    x_T_key, loop_key = jax.random.split(key)
    x = jax.random.normal(x_T_key, shape, dtype=jnp.float32)
    n = timesteps.shape[0]
    # Step to the timestep the chain actually visits next (final target -1 =
    # alpha_bar 1, the set_alpha_to_one convention). For uniform grids this
    # equals diffusers' `t - T // num_steps`; for non-divisor trailing grids
    # (stride alternates, e.g. 62/63 at T=1000, n=16) diffusers' constant
    # stride aims at timesteps the chain never visits, skewing every
    # alpha_prev lookup — self-consistent pairs are the correct ODE
    # discretization and are what DPM-Solver++ uses too.
    prev_timesteps = jnp.concatenate(
        [timesteps[1:], jnp.array([-1], timesteps.dtype)]
    )

    def body(x, inputs):
        t, prev_t, i = inputs
        eps = denoise_fn(x, t).astype(jnp.float32)
        noise = jax.random.normal(jax.random.fold_in(loop_key, i), shape, jnp.float32)
        x = step_fn(x, eps, t, prev_t, noise)
        return x, ()

    xs = (timesteps, prev_timesteps, jnp.arange(n, dtype=jnp.int32))
    # unroll>1 widens the scan body so XLA can fuse elementwise chains
    # across adjacent denoise steps (the per-iteration x/RNG hand-off is
    # otherwise a fusion barrier — docs/PERF_ANALYSIS.md gap item 3).
    # Identical math at any unroll; compile time grows with the factor.
    x, _ = jax.lax.scan(body, x, xs, unroll=unroll)
    return x


def ddpm_sample(
    denoise_fn: Callable,
    schedule: DiffusionSchedule,
    shape,
    key: jax.Array,
    num_inference_steps: int = 750,
    unroll: int = 1,
) -> jax.Array:
    """Ancestral DDPM sampling from pure noise. Returns x0 in [-1, 1]."""
    ts = ddpm_timesteps(schedule, num_inference_steps)

    def step_fn(x, eps, t, prev_t, noise):
        return ddpm_step(schedule, x, eps, t, prev_t, noise)

    return _sample_loop(denoise_fn, schedule, shape, key, ts, step_fn, unroll=unroll)


def ddim_sample(
    denoise_fn: Callable,
    schedule: DiffusionSchedule,
    shape,
    key: jax.Array,
    num_inference_steps: int = 50,
    eta: float = 0.0,
    spacing: str = "leading",
    unroll: int = 1,
) -> jax.Array:
    """DDIM sampling — the fast path (50 steps vs the reference's 750)."""
    ts = ddim_timesteps(schedule, num_inference_steps, spacing=spacing)

    def step_fn(x, eps, t, prev_t, noise):
        return ddim_step(schedule, x, eps, t, prev_t, noise, eta=eta)

    return _sample_loop(denoise_fn, schedule, shape, key, ts, step_fn, unroll=unroll)


def dpmpp_2m_sample(
    denoise_fn: Callable,
    schedule: DiffusionSchedule,
    shape,
    key: jax.Array,
    num_inference_steps: int = 20,
    spacing: str = "trailing",
    unroll: int = 1,
) -> jax.Array:
    """DPM-Solver++(2M): deterministic second-order multistep solver for the
    probability-flow ODE in data-prediction form (Lu et al.,
    arXiv:2211.01095, Algorithm 2; semantics of diffusers
    DPMSolverMultistepScheduler with algorithm_type="dpmsolver++",
    solver_order=2, final_sigmas_type="zero", lower_order_final).

    Integrating in log-SNR (lambda) with an exponential integrator makes the
    linear part of the ODE exact, so ~20 steps reach the sample quality DDIM
    needs ~50 for — 2.5x fewer UNet evaluations per scene, which is the
    whole cost on TPU (each step is one fused denoise in the same
    single-trace lax.scan as the other samplers; capability beyond the
    reference, whose pipeline exposes only ancestral DDPM —
    scripts/generation.py:14-20).

    All per-step coefficients are precomputed host-side and scanned over;
    the first and last steps fall back to first order (the last target has
    sigma=0, where the second-order weight h_{i-1}/h_i degenerates).
    """
    ts = ddim_timesteps(schedule, num_inference_steps, spacing=spacing)
    n = int(ts.shape[0])

    acp = schedule.alphas_cumprod
    acp_cur = acp[ts]
    # Targets: the next visited timestep; the final target is t=-1 with
    # alpha=1, sigma=0 (set_alpha_to_one / final_sigmas_type="zero") — the
    # last update then returns the data prediction exactly.
    acp_prev = jnp.concatenate([acp[ts[1:]], jnp.ones((1,), acp.dtype)])
    alpha_c, sigma_c = jnp.sqrt(acp_cur), jnp.sqrt(1.0 - acp_cur)
    alpha_p, sigma_p = jnp.sqrt(acp_prev), jnp.sqrt(1.0 - acp_prev)
    lam_c = jnp.log(alpha_c) - jnp.log(sigma_c)
    lam_p = jnp.log(alpha_p) - jnp.log(sigma_p)  # +inf at the final target
    h = lam_p - lam_c  # [n], positive; +inf at the final step
    c_x = sigma_p / sigma_c  # first-order carry coefficient; 0 at the end
    c_d = alpha_p * (1.0 - jnp.exp(-h))  # exp(-inf)=0 -> exactly alpha_p=1

    # Second-order combination D = w_c * x0_i + w_p * x0_{i-1} with
    # r_i = h_{i-1} / h_i. Steps 0 (no history) and n-1 (h=inf) run first
    # order: w_c=1, w_p=0.
    h_prev = jnp.concatenate([h[:1], h[:-1]])
    r = h_prev / jnp.maximum(h, 1e-20)
    w_c = 1.0 + 1.0 / (2.0 * jnp.maximum(r, 1e-20))
    w_p = -1.0 / (2.0 * jnp.maximum(r, 1e-20))
    first_order = jnp.zeros((n,), bool).at[0].set(True)
    if n > 1:
        first_order = first_order.at[n - 1].set(True)
    w_c = jnp.where(first_order, 1.0, w_c)
    w_p = jnp.where(first_order, 0.0, w_p)

    # Same key-split convention as _sample_loop so every sampler started
    # from one seed integrates the SAME x_T (clean A/B comparisons).
    x_T_key, _ = jax.random.split(key)
    x = jax.random.normal(x_T_key, shape, dtype=jnp.float32)

    def body(carry, inputs):
        x, x0_prev = carry
        t, cx_i, cd_i, wc_i, wp_i = inputs
        eps = denoise_fn(x, t).astype(jnp.float32)
        x0 = schedule.pred_x0_from_eps(x, eps, t)
        d = wc_i * x0 + wp_i * x0_prev
        x = cx_i * x + cd_i * d
        return (x, x0), ()

    xs = (ts, c_x, c_d, w_c, w_p)
    (x, _), _ = jax.lax.scan(
        body, (x, jnp.zeros(shape, jnp.float32)), xs, unroll=unroll
    )
    return x


def dpmpp_2m_sde_sample(
    denoise_fn: Callable,
    schedule: DiffusionSchedule,
    shape,
    key: jax.Array,
    num_inference_steps: int = 25,
    spacing: str = "trailing",
    unroll: int = 1,
) -> jax.Array:
    """SDE-DPM-Solver++(2M): the STOCHASTIC second-order multistep solver
    (Lu et al., arXiv:2211.01095 §4; semantics of diffusers
    DPMSolverMultistepScheduler with algorithm_type="sde-dpmsolver++",
    solver_order=2, final_sigmas_type="zero").

    Why it exists here: deterministic ODE solvers (DDIM eta=0, DPM++(2M))
    integrate the model's epsilon error coherently step to step, which on
    this model family shows up as high-frequency lane speckle (round-2/3
    failure mode, docs/samples/model_ddim50_eta0_speckle.png) — while
    ancestral sampling (DDIM eta=1 / the reference's 750-step DDPM,
    scripts/generation.py:14-20) re-injects noise each step and washes the
    correlated error out. This sampler keeps the ancestral noise injection
    AND second-order accuracy, targeting DDIM-100-eta1 quality at ~25 steps
    (4x fewer UNet evals — the whole cost on TPU).

    Per-step update (h = lambda_prev - lambda_cur > 0):
      x <- (sigma_p/sigma_c) e^{-h} x + alpha_p (1 - e^{-2h}) D
           + sigma_p sqrt(1 - e^{-2h}) z,   z ~ N(0, I)
    with the same second-order data combination D as the deterministic 2M
    (D = w_c x0_i + w_p x0_{i-1}). At the final sigma=0 target h=inf, so
    the carry and noise coefficients vanish and the update returns D
    exactly; step 0 (no history) and the final step run first order.
    """
    ts = ddim_timesteps(schedule, num_inference_steps, spacing=spacing)
    n = int(ts.shape[0])

    acp = schedule.alphas_cumprod
    acp_cur = acp[ts]
    acp_prev = jnp.concatenate([acp[ts[1:]], jnp.ones((1,), acp.dtype)])
    alpha_c, sigma_c = jnp.sqrt(acp_cur), jnp.sqrt(1.0 - acp_cur)
    alpha_p, sigma_p = jnp.sqrt(acp_prev), jnp.sqrt(1.0 - acp_prev)
    lam_c = jnp.log(alpha_c) - jnp.log(sigma_c)
    lam_p = jnp.log(alpha_p) - jnp.log(sigma_p)  # +inf at the final target
    h = lam_p - lam_c
    e2h = jnp.exp(-2.0 * h)  # exp(-inf) = 0 at the final step
    c_x = sigma_p / sigma_c * jnp.exp(-h)  # 0 at the end (sigma_p=0)
    c_d = alpha_p * (1.0 - e2h)  # exactly alpha_p = 1 at the end
    c_n = sigma_p * jnp.sqrt(jnp.clip(1.0 - e2h, 0.0, None))  # 0 at the end

    h_prev = jnp.concatenate([h[:1], h[:-1]])
    r = h_prev / jnp.maximum(h, 1e-20)
    w_c = 1.0 + 1.0 / (2.0 * jnp.maximum(r, 1e-20))
    w_p = -1.0 / (2.0 * jnp.maximum(r, 1e-20))
    first_order = jnp.zeros((n,), bool).at[0].set(True)
    if n > 1:
        first_order = first_order.at[n - 1].set(True)
    w_c = jnp.where(first_order, 1.0, w_c)
    w_p = jnp.where(first_order, 0.0, w_p)

    # Same key-split convention as _sample_loop: sampler A/Bs from one seed
    # integrate the SAME x_T, and per-step noise uses the loop_key stream.
    x_T_key, loop_key = jax.random.split(key)
    x = jax.random.normal(x_T_key, shape, dtype=jnp.float32)

    def body(carry, inputs):
        x, x0_prev = carry
        t, i, cx_i, cd_i, cn_i, wc_i, wp_i = inputs
        eps = denoise_fn(x, t).astype(jnp.float32)
        x0 = schedule.pred_x0_from_eps(x, eps, t)
        d = wc_i * x0 + wp_i * x0_prev
        z = jax.random.normal(jax.random.fold_in(loop_key, i), shape, jnp.float32)
        x = cx_i * x + cd_i * d + cn_i * z
        return (x, x0), ()

    xs = (ts, jnp.arange(n, dtype=jnp.int32), c_x, c_d, c_n, w_c, w_p)
    (x, _), _ = jax.lax.scan(
        body, (x, jnp.zeros(shape, jnp.float32)), xs, unroll=unroll
    )
    return x
