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


# ---------------- DPM-Solver++(2M) ----------------

def test_dpm_recovers_target(schedule):
    """With an oracle denoiser, DPM-Solver++(2M) converges to the target x0
    at far fewer steps than DDIM needs."""
    from drivescenegen_tpu.diffusion import dpmpp_2m_sample

    target = jnp.full((1, 8, 8, 3), 0.35)
    fn = _perfect_denoiser(schedule, target)
    out = dpmpp_2m_sample(fn, schedule, (1, 8, 8, 3), jax.random.key(0), 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-3)


def test_dpm_single_step_equals_ddim(schedule):
    """At one step (trailing), both solvers return the data prediction from
    t=T-1 — the final-sigma-zero convention must agree exactly."""
    from drivescenegen_tpu.diffusion import dpmpp_2m_sample

    target = jnp.full((1, 4, 4, 3), 0.2)
    fn = _perfect_denoiser(schedule, target)
    a = dpmpp_2m_sample(fn, schedule, (1, 4, 4, 3), jax.random.key(7), 1)
    b = ddim_sample(
        fn, schedule, (1, 4, 4, 3), jax.random.key(7), 1, spacing="trailing"
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dpm_second_order_convergence(schedule):
    """Probability-flow-ODE convergence order: for Gaussian data
    (x0 ~ N(0, s2 I)) the optimal eps-predictor is linear and the ODE map
    x_T -> x_0 is exactly x_T * s / sqrt(abar_T s2 + 1 - abar_T). Against
    that analytic solution DPM-Solver++(2M) must (a) be far more accurate
    than first-order DDIM at equal steps and (b) shrink its error
    ~quadratically when the step count doubles, where DDIM only halves it.
    (Measured on this toy: DDIM 0.052 -> 0.027 from 64 -> 128 steps; DPM
    0.0108 -> 0.0017.)"""
    from drivescenegen_tpu.diffusion import dpmpp_2m_sample

    s = 0.25
    s2 = s * s

    def gaussian_oracle(x, t):
        acp = schedule.alphas_cumprod[t]
        return jnp.sqrt(1.0 - acp) * x / (acp * s2 + (1.0 - acp))

    shape = (2, 4, 4, 3)
    key = jax.random.key(11)
    x_T = jax.random.normal(jax.random.split(key)[0], shape)
    acp_T = schedule.alphas_cumprod[-1]
    exact = x_T * s / jnp.sqrt(acp_T * s2 + (1.0 - acp_T))

    def err(x):
        return float(jnp.max(jnp.abs(x - exact)))

    e_dpm64 = err(dpmpp_2m_sample(gaussian_oracle, schedule, shape, key, 64))
    e_dpm128 = err(dpmpp_2m_sample(gaussian_oracle, schedule, shape, key, 128))
    e_ddim64 = err(ddim_sample(gaussian_oracle, schedule, shape, key, 64,
                               spacing="trailing"))
    e_ddim128 = err(ddim_sample(gaussian_oracle, schedule, shape, key, 128,
                                spacing="trailing"))
    assert e_dpm64 < 0.25 * e_ddim64, (e_dpm64, e_ddim64)
    # Order: doubling steps must cut DPM's error by ~4x (allow 2.5x for the
    # non-asymptotic constant); DDIM's by ~2x.
    assert e_dpm128 < e_dpm64 / 2.5, (e_dpm64, e_dpm128)
    assert e_ddim128 < e_ddim64 / 1.5, (e_ddim64, e_ddim128)


def test_dpm_deterministic_and_unroll_invariant(schedule):
    from drivescenegen_tpu.diffusion import dpmpp_2m_sample

    fn = _perfect_denoiser(schedule, jnp.full((1, 4, 4, 3), -0.1))
    a = dpmpp_2m_sample(fn, schedule, (1, 4, 4, 3), jax.random.key(3), 12)
    b = dpmpp_2m_sample(fn, schedule, (1, 4, 4, 3), jax.random.key(3), 12)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for unroll in (2, 5):
        u = dpmpp_2m_sample(fn, schedule, (1, 4, 4, 3), jax.random.key(3), 12,
                            unroll=unroll)
        # Unrolling lets XLA re-fuse the two-term D combination into
        # different FMA groupings; 1-ULP drift is expected (the ddpm/ddim
        # bodies happen to fuse identically, hence their stricter test).
        np.testing.assert_allclose(np.asarray(a), np.asarray(u), atol=1e-6)


def test_dpm_starts_from_same_xT_as_ddim(schedule):
    """One seed -> one x_T across samplers (the split convention), so
    sampler A/Bs compare trajectories, not priors: with an identity-free
    oracle pinned to a constant target both land on the target, but at a
    sharper check, 1-step DPM == 1-step DDIM (same x0(x_T)) requires the
    identical x_T draw."""
    from drivescenegen_tpu.diffusion import dpmpp_2m_sample

    # A denoiser that returns eps=0 makes the final x depend only on x_T's
    # propagated data prediction: x0 = x_T / sqrt(acp_T).
    def zero_eps(x, t):
        return jnp.zeros_like(x)

    key = jax.random.key(21)
    a = dpmpp_2m_sample(zero_eps, schedule, (1, 4, 4, 3), key, 1)
    b = ddim_sample(zero_eps, schedule, (1, 4, 4, 3), key, 1,
                    spacing="trailing")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


# ---------------- SDE-DPM-Solver++(2M) ----------------

def test_sde_recovers_target(schedule):
    """With an oracle denoiser pinned to a point mass, every x0 prediction
    is the target, so the injected per-step noise must wash out and the
    final sigma=0 update returns the target exactly."""
    from drivescenegen_tpu.diffusion import dpmpp_2m_sde_sample

    target = jnp.full((1, 8, 8, 3), 0.35)
    fn = _perfect_denoiser(schedule, target)
    out = dpmpp_2m_sde_sample(fn, schedule, (1, 8, 8, 3), jax.random.key(0), 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-3)


def test_sde_single_step_equals_ddim(schedule):
    """At one step the carry and noise coefficients vanish (h=inf) and the
    update returns the data prediction from t=T-1 — exactly DDIM-1."""
    from drivescenegen_tpu.diffusion import dpmpp_2m_sde_sample

    def zero_eps(x, t):
        return jnp.zeros_like(x)

    key = jax.random.key(23)
    a = dpmpp_2m_sde_sample(zero_eps, schedule, (1, 4, 4, 3), key, 1)
    b = ddim_sample(zero_eps, schedule, (1, 4, 4, 3), key, 1,
                    spacing="trailing")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sde_gaussian_marginal(schedule):
    """THE property that distinguishes the SDE solver from the deterministic
    ones: it must land on the correct DATA MARGINAL, not just transport a
    fixed x_T. For Gaussian data x0 ~ N(0, s^2 I) the optimal eps-predictor
    is linear and the true marginal is exactly N(0, s^2 I); the sampled
    population's mean/std must match it. Deterministic DDIM from the same
    x_T population also passes this (it is the exact linear-ODE map), so
    additionally pin that the SDE chain is NOT the deterministic map: its
    output must decorrelate from DDIM's given the same keys."""
    from drivescenegen_tpu.diffusion import dpmpp_2m_sde_sample

    s = 0.25
    s2 = s * s

    def gaussian_oracle(x, t):
        acp = schedule.alphas_cumprod[t]
        return jnp.sqrt(1.0 - acp) * x / (acp * s2 + (1.0 - acp))

    shape = (64, 4, 4, 3)
    out = dpmpp_2m_sde_sample(gaussian_oracle, schedule, shape,
                              jax.random.key(31), 64)
    arr = np.asarray(out).ravel()
    assert abs(arr.mean()) < 0.02, arr.mean()
    np.testing.assert_allclose(arr.std(), s, rtol=0.06)

    det = np.asarray(ddim_sample(gaussian_oracle, schedule, shape,
                                 jax.random.key(31), 64,
                                 spacing="trailing")).ravel()
    corr = np.corrcoef(arr, det)[0, 1]
    assert abs(corr) < 0.35, corr  # stochastic path, not the ODE transport


def test_sde_deterministic_given_key_and_unroll_invariant(schedule):
    from drivescenegen_tpu.diffusion import dpmpp_2m_sde_sample

    fn = _perfect_denoiser(schedule, jnp.full((1, 4, 4, 3), -0.1))
    a = dpmpp_2m_sde_sample(fn, schedule, (1, 4, 4, 3), jax.random.key(3), 12)
    b = dpmpp_2m_sde_sample(fn, schedule, (1, 4, 4, 3), jax.random.key(3), 12)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = dpmpp_2m_sde_sample(fn, schedule, (1, 4, 4, 3), jax.random.key(4), 12)
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    for unroll in (2, 5):
        u = dpmpp_2m_sde_sample(fn, schedule, (1, 4, 4, 3), jax.random.key(3),
                                12, unroll=unroll)
        np.testing.assert_allclose(np.asarray(a), np.asarray(u), atol=1e-6)


def test_sde_finite_at_all_step_counts(schedule):
    """h=inf at the final target and the r=h_prev/h weights must never leak
    a NaN/Inf into the output at any step count, including non-divisor
    grids."""
    from drivescenegen_tpu.diffusion import dpmpp_2m_sde_sample

    fn = _perfect_denoiser(schedule, jnp.zeros((1, 4, 4, 3)))
    for n in (1, 2, 3, 7, 16):
        out = dpmpp_2m_sde_sample(fn, schedule, (1, 4, 4, 3),
                                  jax.random.key(n), n)
        assert np.all(np.isfinite(np.asarray(out))), n
