#!/usr/bin/env python
"""Bisect the batch-2 (CFG pair) TPU worker crash.

The 50-step AND 4-step CFG-batched prediction runs crash the TPU worker
("UNAVAILABLE: TPU worker process crashed ... kernel fault") while batch-1
reconstruction is consistently fine. Suspects: the flash kernel at
(2, 48, 15302, 64) (grid doubles), the int8 w8a8 path at batch 2, or the
full batch-2 DiT graph. This probe runs each in isolation with loud
checkpoints so the crash point is unambiguous.

Run ON the TPU: python scripts/probe_batch2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(f"[probe] {time.strftime('%H:%M:%S')} {msg}", flush=True)


def fence(x):
    return float(jnp.mean(jnp.asarray(x, jnp.float32).ravel()[:64]))


def main():
    from aether_tpu.ops.flash_attention import flash_attention
    from aether_tpu.utils.profiling import warm_transfer_channel

    log("warming channel")
    log(f"warm {warm_transfer_channel():.1f}s")

    B, H, S, D = 2, 48, 15302, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, S, D),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, S, D),
                          jnp.bfloat16)

    for name, kw in [
        ("flash b2 denom=vpu", dict(denom="vpu")),
        ("flash b2 denom=mxu", dict(denom="mxu")),
        ("flash b2 fixed_max", dict(fixed_max=True)),
    ]:
        log(f"START {name}")
        out = flash_attention(q, k, v, **kw)
        log(f"OK    {name} fence={fence(out):.4f}")

    # full batch-2 DiT forward, int8 + w8a8 (the prediction denoise body)
    from aether_tpu.config import DiTConfig
    from aether_tpu.models.dit import dit_forward, init_quantized_dit_params
    from aether_tpu.models.rope import prepare_rotary_positional_embeddings

    cfg = DiTConfig.aetherv1()
    log("init int8 params")
    params = init_quantized_dit_params(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.int8)
    f_lat, hh, ww = 11, 480, 720
    hidden = jax.random.normal(jax.random.fold_in(key, 3),
                               (2, f_lat, cfg.in_channels, hh // 8, ww // 8),
                               jnp.bfloat16)
    text = jax.random.normal(jax.random.fold_in(key, 4),
                             (2, cfg.max_text_seq_length, cfg.text_embed_dim),
                             jnp.bfloat16)
    cos, sin = prepare_rotary_positional_embeddings(cfg, hh, ww, f_lat, fps=12)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    t = jnp.array([999, 999], jnp.int32)

    log("START dit b2 int8 w8a8 flash")
    out = dit_forward(params, cfg, hidden, text, t, cos, sin,
                      attn_impl="flash", act_quant=True)
    log(f"OK    dit b2 fence={fence(out):.4f}")

    log("START dit b2 int8 weight-only flash")
    out = dit_forward(params, cfg, hidden, text, t, cos, sin,
                      attn_impl="flash", act_quant=False)
    log(f"OK    dit b2 weight-only fence={fence(out):.4f}")

    log("ALL PROBES PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
