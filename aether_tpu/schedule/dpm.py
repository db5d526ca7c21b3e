"""CogVideoX noise schedule + SDE-DPM-Solver++(2M) sampler, TPU-native.

The reference drives sampling through diffusers' ``CogVideoXDPMScheduler``
(consumed at ``aetherv1_pipeline_cogvideox.py:780-783,901-915``): a scaled-linear
beta schedule with an SD3-style SNR shift and zero-terminal-SNR rescale,
v-prediction, "trailing" timestep spacing, and a stochastic multistep
DPM-Solver++(2M) update carrying ``old_pred_original_sample`` second-order state.

The TPU-native design splits that object into:

1. :func:`make_sampling_plan` — host-side float64 precomputation of *all* per-step
   coefficients (the log-SNR gaps ``h``, the 2M multipliers, the noise scale),
   stacked into arrays indexed by step. Nothing data-dependent remains.
2. :func:`dpm_step` — a pure function ``(plan, i, x, v, old_x0, noise) -> (x', x0)``
   that a ``jax.lax.scan`` over the denoise loop can call with traced ``i``.

The final step (prev_timestep < 0) degenerates to returning the predicted x0
exactly (mult1 = mult_noise = 0, mult2 = -1), matching the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from aether_tpu.config import SchedulerConfig


def compute_alphas_cumprod(cfg: SchedulerConfig) -> np.ndarray:
    """Training-time cumulative alpha schedule (float64, length num_train_timesteps)."""
    n = cfg.num_train_timesteps
    if cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, n, dtype=np.float64) ** 2
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, n, dtype=np.float64)
    else:
        raise ValueError(f"Unsupported beta schedule: {cfg.beta_schedule}")
    alphas_cumprod = np.cumprod(1.0 - betas)

    # SD3-style SNR shift.
    s = cfg.snr_shift_scale
    alphas_cumprod = alphas_cumprod / (s + (1.0 - s) * alphas_cumprod)

    if cfg.rescale_betas_zero_snr:
        sqrt_ac = np.sqrt(alphas_cumprod)
        sqrt_0, sqrt_t = sqrt_ac[0], sqrt_ac[-1]
        sqrt_ac = (sqrt_ac - sqrt_t) * (sqrt_0 / (sqrt_0 - sqrt_t))
        alphas_cumprod = sqrt_ac**2
    return alphas_cumprod


def set_timesteps(cfg: SchedulerConfig, num_inference_steps: int) -> np.ndarray:
    """Descending inference timesteps (int64) for the given spacing policy."""
    n = cfg.num_train_timesteps
    if cfg.timestep_spacing == "trailing":
        step_ratio = n / num_inference_steps
        timesteps = np.round(np.arange(n, 0, -step_ratio)).astype(np.int64) - 1
    elif cfg.timestep_spacing == "linspace":
        timesteps = (
            np.linspace(0, n - 1, num_inference_steps).round()[::-1].astype(np.int64)
        )
    elif cfg.timestep_spacing == "leading":
        step_ratio = n // num_inference_steps
        timesteps = (
            (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
        )
        timesteps = timesteps + cfg.steps_offset
    else:
        raise ValueError(f"Unsupported timestep spacing: {cfg.timestep_spacing}")
    return timesteps


@dataclasses.dataclass(frozen=True)
class SamplingPlan:
    """Per-step sampler coefficients; every field has leading dim num_steps."""

    timesteps: jnp.ndarray  # int32, the t fed to the DiT
    sqrt_alpha: jnp.ndarray  # sqrt(alpha_prod_t)
    sqrt_one_minus_alpha: jnp.ndarray  # sqrt(1 - alpha_prod_t)
    mult1: jnp.ndarray  # x coefficient
    mult2: jnp.ndarray  # denoised coefficient (subtracted)
    mult3: jnp.ndarray  # second-order x0 coefficient (1 + 1/2r)
    mult4: jnp.ndarray  # second-order old_x0 coefficient (1/2r)
    mult_noise: jnp.ndarray  # fresh-noise scale (SDE term)
    second_order: jnp.ndarray  # bool: use the 2M update at this step
    init_noise_sigma: float = 1.0

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])


def tree_flatten_plan(plan: SamplingPlan):  # pragma: no cover - pytree plumbing
    children = (
        plan.timesteps,
        plan.sqrt_alpha,
        plan.sqrt_one_minus_alpha,
        plan.mult1,
        plan.mult2,
        plan.mult3,
        plan.mult4,
        plan.mult_noise,
        plan.second_order,
    )
    return children, plan.init_noise_sigma


def tree_unflatten_plan(aux, children):  # pragma: no cover - pytree plumbing
    return SamplingPlan(*children, init_noise_sigma=aux)


import jax.tree_util as _tree_util  # noqa: E402

_tree_util.register_pytree_node(SamplingPlan, tree_flatten_plan, tree_unflatten_plan)


def make_sampling_plan(
    cfg: SchedulerConfig,
    num_inference_steps: int,
    timesteps: Optional[np.ndarray] = None,
) -> SamplingPlan:
    """Precompute all DPM-Solver++(2M) step coefficients on host in float64."""
    alphas_cumprod = compute_alphas_cumprod(cfg)
    if timesteps is None:
        timesteps = set_timesteps(cfg, num_inference_steps)
    else:
        timesteps = np.asarray(timesteps, dtype=np.int64)
        num_inference_steps = len(timesteps)
    final_alpha = 1.0 if cfg.set_alpha_to_one else float(alphas_cumprod[0])

    n_steps = len(timesteps)
    step_gap = cfg.num_train_timesteps // num_inference_steps

    sqrt_a = np.zeros(n_steps)
    sqrt_1ma = np.zeros(n_steps)
    m1 = np.zeros(n_steps)
    m2 = np.zeros(n_steps)
    m3 = np.zeros(n_steps)
    m4 = np.zeros(n_steps)
    m_noise = np.zeros(n_steps)
    second = np.zeros(n_steps, dtype=bool)

    def lamb_of(alpha: float) -> float:
        with np.errstate(divide="ignore"):
            return float(np.log(np.sqrt(alpha / max(1.0 - alpha, 0.0)))) if alpha < 1.0 else np.inf

    for i, t in enumerate(timesteps):
        prev_t = int(t) - step_gap
        alpha_t = float(alphas_cumprod[t])
        alpha_prev = float(alphas_cumprod[prev_t]) if prev_t >= 0 else final_alpha

        sqrt_a[i] = np.sqrt(alpha_t)
        sqrt_1ma[i] = np.sqrt(1.0 - alpha_t)

        lamb = lamb_of(alpha_t)
        lamb_next = lamb_of(alpha_prev)
        h = lamb_next - lamb
        # IEEE inf arithmetic reproduces the reference's torch behavior at the two
        # degenerate ends: first step (alpha_t = 0, h = +inf -> pure re-noising of
        # x0) and terminal step (alpha_prev = 1, h = +inf, mult1 = mult_noise = 0,
        # mult2 = -1 -> x_prev = x0 exactly).
        with np.errstate(over="ignore"):
            m1[i] = np.sqrt((1.0 - alpha_prev) / (1.0 - alpha_t)) * np.exp(-h)
            m2[i] = np.expm1(-2.0 * h) * np.sqrt(alpha_prev)
            m_noise[i] = np.sqrt(1.0 - alpha_prev) * np.sqrt(1.0 - np.exp(-2.0 * h))

        if i > 0 and prev_t >= 0:
            t_back = int(timesteps[i - 1])
            alpha_back = float(alphas_cumprod[t_back])
            lamb_prev = lamb_of(alpha_back)
            h_last = lamb - lamb_prev
            r = h_last / h  # r = inf at i=1 when t_back is the zero-SNR terminal
            m3[i] = 1.0 + 1.0 / (2.0 * r)
            m4[i] = 1.0 / (2.0 * r)
            second[i] = True

    return SamplingPlan(
        timesteps=jnp.asarray(timesteps, dtype=jnp.int32),
        sqrt_alpha=jnp.asarray(sqrt_a, dtype=jnp.float32),
        sqrt_one_minus_alpha=jnp.asarray(sqrt_1ma, dtype=jnp.float32),
        mult1=jnp.asarray(m1, dtype=jnp.float32),
        mult2=jnp.asarray(m2, dtype=jnp.float32),
        mult3=jnp.asarray(m3, dtype=jnp.float32),
        mult4=jnp.asarray(m4, dtype=jnp.float32),
        mult_noise=jnp.asarray(m_noise, dtype=jnp.float32),
        second_order=jnp.asarray(second),
        init_noise_sigma=cfg.init_noise_sigma,
    )


def predicted_x0(
    plan: SamplingPlan, i: jnp.ndarray, sample: jnp.ndarray, model_output: jnp.ndarray,
    prediction_type: str = "v_prediction",
) -> jnp.ndarray:
    """x0 estimate from the model output at step i."""
    if prediction_type == "v_prediction":
        return plan.sqrt_alpha[i] * sample - plan.sqrt_one_minus_alpha[i] * model_output
    if prediction_type == "epsilon":
        return (sample - plan.sqrt_one_minus_alpha[i] * model_output) / plan.sqrt_alpha[i]
    if prediction_type == "sample":
        return model_output
    raise ValueError(f"Unsupported prediction type: {prediction_type}")


def dpm_step(
    plan: SamplingPlan,
    i: jnp.ndarray,
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    old_x0: jnp.ndarray,
    noise: jnp.ndarray,
    prediction_type: str = "v_prediction",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One SDE-DPM-Solver++(2M) update. Returns (x_{t_prev}, x0_pred).

    ``old_x0`` is the previous step's x0 prediction (zeros at i=0 — it is gated off
    by ``second_order[0] = False``). ``noise`` is a standard normal draw shaped like
    ``sample``; the terminal step has mult_noise = 0 so it is ignored there.
    """
    x0 = predicted_x0(plan, i, sample, model_output, prediction_type)
    x0_f32 = x0.astype(jnp.float32)
    d_second = plan.mult3[i] * x0_f32 - plan.mult4[i] * old_x0.astype(jnp.float32)
    denoised = jnp.where(plan.second_order[i], d_second, x0_f32)
    prev = (
        plan.mult1[i] * sample.astype(jnp.float32)
        - plan.mult2[i] * denoised
        + plan.mult_noise[i] * noise.astype(jnp.float32)
    )
    return prev.astype(sample.dtype), x0_f32
