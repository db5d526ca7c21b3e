"""Diffusion fine-tuning: v-prediction loss + pjit-sharded train step.

The reference repository ships no training code (SURVEY.md section 0) — AetherV1
was produced by fine-tuning CogVideoX upstream. This module restores that
capability TPU-natively: the CogVideoX zero-terminal-SNR schedule from
``aether_tpu.schedule`` supplies (sqrt_alpha, sqrt_1m_alpha); the loss is the
standard v-prediction MSE; the train step is a pure function designed to be jitted
over a ('dp', 'tp') mesh — batch sharded on dp, DiT feature dims sharded on tp via
``aether_tpu.parallel.dit_param_sharding`` (GSPMD inserts the ICI collectives).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aether_tpu.config import DiTConfig, SchedulerConfig
from aether_tpu.models.dit import dit_forward
from aether_tpu.schedule.dpm import compute_alphas_cumprod


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Dict[str, Any]
    opt_state: Any

    def tree_flatten(self):
        return (self.step, self.params, self.opt_state), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def create_train_state(
    params: Dict[str, Any],
    learning_rate: float = 1e-5,
    weight_decay: float = 1e-4,
    b1: float = 0.9,
    b2: float = 0.95,
) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = optax.adamw(learning_rate, b1=b1, b2=b2, weight_decay=weight_decay)
    return TrainState(jnp.zeros((), jnp.int32), params, tx.init(params)), tx


def diffusion_loss(
    params: Dict[str, Any],
    cfg: DiTConfig,
    sqrt_alphas: jnp.ndarray,
    sqrt_one_minus_alphas: jnp.ndarray,
    clean_latents: jnp.ndarray,  # [B, F, 56, h, w] target (rgb+disp+camera)
    condition_latents: jnp.ndarray,  # [B, F, 40, h, w]
    text_embeds: jnp.ndarray,  # [B, S_text, text_dim]
    rope_cos: Optional[jnp.ndarray],
    rope_sin: Optional[jnp.ndarray],
    key: jax.Array,
    attn_impl: str = "xla",
    t: Optional[jnp.ndarray] = None,
    eps: Optional[jnp.ndarray] = None,
    block_scan=None,
) -> jnp.ndarray:
    """v-prediction MSE at uniformly sampled timesteps.

    ``t`` / ``eps`` default to draws from ``key``; passing them explicitly
    makes the loss deterministic for cross-framework parity tests."""
    b = clean_latents.shape[0]
    key_t, key_eps = jax.random.split(key)
    if t is None:
        t = jax.random.randint(key_t, (b,), 0, sqrt_alphas.shape[0])
    if eps is None:
        eps = jax.random.normal(key_eps, clean_latents.shape, jnp.float32)

    x0 = clean_latents.astype(jnp.float32)
    a = sqrt_alphas[t][:, None, None, None, None]
    s = sqrt_one_minus_alphas[t][:, None, None, None, None]
    x_t = a * x0 + s * eps
    v_target = a * eps - s * x0

    model_in = jnp.concatenate(
        [x_t.astype(clean_latents.dtype), condition_latents], axis=2
    )
    v_pred = dit_forward(
        params, cfg, model_in, text_embeds, t, rope_cos, rope_sin, attn_impl,
        block_scan=block_scan,
    ).astype(jnp.float32)
    return jnp.mean(jnp.square(v_pred - v_target))


def make_train_step(
    cfg: DiTConfig,
    scheduler_cfg: SchedulerConfig,
    tx: optax.GradientTransformation,
    attn_impl: str = "xla",
    block_scan=None,
) -> Callable:
    """Build a pure (state, batch, key) -> (state, loss) step.

    ``batch`` is a dict with clean_latents / condition_latents / text_embeds /
    rope_cos / rope_sin. Jit it with param shardings from
    ``aether_tpu.parallel.dit_param_sharding`` and batch sharding P('dp') to run
    dp x tp on a mesh.

    ``block_scan`` swaps the DiT's block executor for the GPipe pipeline
    schedule (``parallel.pipeline.make_pipeline_block_scan``): block params +
    their adamw moments then live stage-sharded ``P('pp')`` and the backward
    pass pipelines through the stages automatically (grad of ppermute).
    """
    alphas_cumprod = compute_alphas_cumprod(scheduler_cfg)
    sqrt_a = jnp.asarray(np.sqrt(alphas_cumprod), jnp.float32)
    sqrt_1ma = jnp.asarray(np.sqrt(1.0 - alphas_cumprod), jnp.float32)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], key: jax.Array):
        def loss_fn(params):
            return diffusion_loss(
                params, cfg, sqrt_a, sqrt_1ma,
                batch["clean_latents"], batch["condition_latents"],
                batch["text_embeds"],
                batch.get("rope_cos"), batch.get("rope_sin"),
                key, attn_impl, block_scan=block_scan,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, new_params, new_opt_state), loss

    return train_step
