import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drivescenegen_tpu.config import DiffusionConfig
from drivescenegen_tpu.diffusion import (
    ddim_sample,
    ddim_timesteps,
    ddpm_sample,
    ddpm_timesteps,
    make_schedule,
)


@pytest.fixture(scope="module")
def schedule():
    return make_schedule(DiffusionConfig())


def test_schedule_matches_ddpm_defaults(schedule):
    # DDPMScheduler() defaults: linear betas 1e-4 .. 0.02 over 1000 steps.
    assert schedule.betas.shape == (1000,)
    np.testing.assert_allclose(float(schedule.betas[0]), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(schedule.betas[-1]), 0.02, rtol=1e-6)
    acp = np.asarray(schedule.alphas_cumprod)
    assert np.all(np.diff(acp) < 0) and acp[0] < 1.0 and acp[-1] > 0.0
    # Known value: cumprod of (1 - linspace) at t=999 is ~4e-5 for these betas.
    assert acp[-1] < 1e-3


def test_add_noise_interpolates(schedule):
    x0 = jnp.ones((2, 8, 8, 3))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0, 999])
    noisy = schedule.add_noise(x0, noise, t)
    # With zero noise, x_t = sqrt(acp_t) * x0.
    np.testing.assert_allclose(
        np.asarray(noisy[0, 0, 0, 0]), float(schedule.sqrt_alphas_cumprod[0]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(noisy[1, 0, 0, 0]), float(schedule.sqrt_alphas_cumprod[999]), rtol=1e-6
    )


def test_timestep_arrays(schedule):
    ts = ddpm_timesteps(schedule, 750)
    assert ts.shape == (750,)
    assert int(ts[0]) == 749 and int(ts[-1]) == 0  # step_ratio = 1000//750 = 1
    ts50 = ddim_timesteps(schedule, 50)
    assert ts50.shape == (50,)
    assert int(ts50[0]) == 980 and int(ts50[-1]) == 0  # leading spacing, ratio 20
    tr50 = ddim_timesteps(schedule, 50, spacing="trailing")
    assert tr50.shape == (50,)
    # Trailing spacing visits t=T-1 (the pure-noise prior) and descends in
    # the same stride; the final step's prev_t = 19 - 20 < 0 -> acp_prev=1.
    assert int(tr50[0]) == 999 and int(tr50[-1]) == 19
    assert int(tr50[0] - tr50[1]) == 20


def _perfect_denoiser(schedule, x_target):
    """An oracle eps-predictor for a known x0: eps = (x_t - sqrt(acp) x0) / sqrt(1-acp)."""

    def denoise_fn(x, t):
        acp = schedule.alphas_cumprod[t]
        return (x - jnp.sqrt(acp) * x_target) / jnp.sqrt(1.0 - acp)

    return denoise_fn


def test_ddim_recovers_target(schedule):
    """With an oracle denoiser, DDIM (eta=0) must converge to the target x0."""
    target = jnp.full((1, 8, 8, 3), 0.35)
    fn = _perfect_denoiser(schedule, target)
    out = ddim_sample(fn, schedule, (1, 8, 8, 3), jax.random.key(0), 50)
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-3)
    out_tr = ddim_sample(
        fn, schedule, (1, 8, 8, 3), jax.random.key(0), 50, spacing="trailing"
    )
    np.testing.assert_allclose(np.asarray(out_tr), np.asarray(target), atol=1e-3)


def test_ddpm_recovers_target(schedule):
    """Ancestral DDPM with an oracle denoiser lands near the target."""
    target = jnp.full((1, 8, 8, 3), -0.5)
    fn = _perfect_denoiser(schedule, target)
    out = ddpm_sample(fn, schedule, (1, 8, 8, 3), jax.random.key(1), 100)
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=5e-2)


def test_samplers_finite_and_bounded(schedule):
    fn = _perfect_denoiser(schedule, jnp.zeros((2, 8, 8, 3)))
    out = ddpm_sample(fn, schedule, (2, 8, 8, 3), jax.random.key(2), 20)
    assert np.all(np.isfinite(np.asarray(out)))


def test_sampling_deterministic_given_key(schedule):
    fn = _perfect_denoiser(schedule, jnp.zeros((1, 4, 4, 3)))
    a = ddim_sample(fn, schedule, (1, 4, 4, 3), jax.random.key(3), 10)
    b = ddim_sample(fn, schedule, (1, 4, 4, 3), jax.random.key(3), 10)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_unroll_bit_identical(schedule):
    """unroll only widens the compiled scan body; the math (and RNG stream)
    is identical at any factor, including non-divisor remainders."""
    fn = _perfect_denoiser(schedule, jnp.full((1, 4, 4, 3), 0.25))
    base_ddim = ddim_sample(fn, schedule, (1, 4, 4, 3), jax.random.key(5), 10,
                            eta=1.0)
    base_ddpm = ddpm_sample(fn, schedule, (1, 4, 4, 3), jax.random.key(6), 10)
    for unroll in (2, 3, 5):
        u = ddim_sample(fn, schedule, (1, 4, 4, 3), jax.random.key(5), 10,
                        eta=1.0, unroll=unroll)
        np.testing.assert_array_equal(np.asarray(base_ddim), np.asarray(u))
        u = ddpm_sample(fn, schedule, (1, 4, 4, 3), jax.random.key(6), 10,
                        unroll=unroll)
        np.testing.assert_array_equal(np.asarray(base_ddpm), np.asarray(u))
