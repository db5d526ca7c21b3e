"""Scheduler tests: golden timesteps/alphas + oracle-sampler convergence."""

import jax
import jax.numpy as jnp
import numpy as np

from aether_tpu.config import SchedulerConfig
from aether_tpu.schedule import (
    compute_alphas_cumprod,
    dpm_step,
    make_sampling_plan,
    set_timesteps,
)


def test_alphas_cumprod_zero_terminal_snr():
    cfg = SchedulerConfig.aetherv1()
    ac = compute_alphas_cumprod(cfg)
    assert ac.shape == (1000,)
    assert abs(ac[-1]) < 1e-12  # zero terminal SNR
    assert 0.99 < ac[0] < 1.0
    assert np.all(np.diff(ac) < 0)  # strictly decreasing


def test_alphas_cumprod_golden_values():
    """Golden values computed from the published CogVideoX schedule recipe:
    scaled-linear betas (0.00085 -> 0.012), SNR shift s=3, zero-SNR rescale."""
    cfg = SchedulerConfig.aetherv1()
    ac = compute_alphas_cumprod(cfg)

    # independent recomputation in raw numpy (no shared code paths)
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    raw = np.cumprod(1 - betas)
    shifted = raw / (3.0 + (1 - 3.0) * raw)
    sq = np.sqrt(shifted)
    sq = (sq - sq[-1]) * sq[0] / (sq[0] - sq[-1])
    expected = sq**2
    np.testing.assert_allclose(ac, expected, rtol=1e-12)


def test_trailing_timesteps():
    cfg = SchedulerConfig.aetherv1()
    np.testing.assert_array_equal(set_timesteps(cfg, 4), [999, 749, 499, 249])
    ts50 = set_timesteps(cfg, 50)
    assert ts50[0] == 999 and ts50[-1] == 19 and len(ts50) == 50
    np.testing.assert_array_equal(np.diff(ts50), -20)


def test_plan_terminal_step_returns_x0():
    cfg = SchedulerConfig.aetherv1()
    plan = make_sampling_plan(cfg, 4)
    # last step: prev_timestep < 0 -> x_prev = x0 exactly
    assert float(plan.mult1[-1]) == 0.0
    assert float(plan.mult2[-1]) == -1.0
    assert float(plan.mult_noise[-1]) == 0.0
    assert not bool(plan.second_order[-1])
    # first step from pure noise: mult1 = 0 (alpha_t = 0), re-noises x0
    assert float(plan.mult1[0]) == 0.0
    assert not bool(plan.second_order[0])
    # step 1's second-order gate degenerates to first order (r = inf)
    assert bool(plan.second_order[1])
    np.testing.assert_allclose(float(plan.mult3[1]), 1.0)
    np.testing.assert_allclose(float(plan.mult4[1]), 0.0)


def test_oracle_sampler_recovers_x0():
    """With a perfect v-oracle, the SDE-DPM-Solver++ chain must return x0 exactly:
    the final step emits the x0 prediction, which the oracle keeps exact."""
    cfg = SchedulerConfig.aetherv1()
    for steps in (4, 50):
        plan = make_sampling_plan(cfg, steps)
        key = jax.random.PRNGKey(0)
        x0_true = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8)), jnp.float32)

        x = jax.random.normal(key, x0_true.shape)  # alpha_T = 0 -> x_T is pure noise
        old_x0 = jnp.zeros_like(x)
        for i in range(steps):
            # oracle: recover eps from the current x and true x0, emit exact v
            a, b = plan.sqrt_alpha[i], plan.sqrt_one_minus_alpha[i]
            eps = (x - a * x0_true) / jnp.maximum(b, 1e-12)
            v = a * eps - b * x0_true
            noise = jax.random.normal(jax.random.fold_in(key, i), x.shape)
            x, old_x0 = dpm_step(plan, jnp.asarray(i), x, v, old_x0, noise)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0_true), atol=2e-4)


def test_dpm_step_is_scan_compatible():
    cfg = SchedulerConfig.aetherv1()
    plan = make_sampling_plan(cfg, 8)
    x0_true = jnp.ones((4, 4), jnp.float32) * 0.5

    def body(carry, i):
        x, old = carry
        a, b = plan.sqrt_alpha[i], plan.sqrt_one_minus_alpha[i]
        eps = (x - a * x0_true) / jnp.maximum(b, 1e-12)
        v = a * eps - b * x0_true
        noise = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(3), i), x.shape)
        x, old = dpm_step(plan, i, x, v, old, noise)
        return (x, old), None

    x_init = jax.random.normal(jax.random.PRNGKey(2), (4, 4))
    (x_final, _), _ = jax.lax.scan(body, (x_init, jnp.zeros_like(x_init)),
                                   jnp.arange(8))
    np.testing.assert_allclose(np.asarray(x_final), 0.5, atol=2e-4)


def test_dynamic_cfg_ramp_reference_quirk():
    """The reference evaluates the cosine ramp on the TIMESTEP VALUE (0..999),
    not the step index (``pipeline:879-893``) — with 50 steps and t=999 the
    exponent (50-999)/50 = -18.98 raised to the 5th power is astronomically
    negative, so cos(pi * x^5) oscillates; reproduce the float64 math exactly."""
    import math

    from aether_tpu.pipeline.aether import dynamic_cfg_schedule

    timesteps = np.array([999, 500, 19, 0])
    steps, g = 50, 3.0
    out = dynamic_cfg_schedule(timesteps, steps, g)
    expected = [
        1.0 + g * (1.0 - math.cos(math.pi * ((steps - float(t)) / steps) ** 5.0)) / 2.0
        for t in timesteps
    ]
    np.testing.assert_allclose(out, np.asarray(expected, np.float32), rtol=1e-6)
    # at t=0 the ramp reaches full strength: 1 + g*(1-cos(pi))/2 = 1 + g
    np.testing.assert_allclose(out[3], 1.0 + g, rtol=1e-6)
