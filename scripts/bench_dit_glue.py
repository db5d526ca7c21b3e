#!/usr/bin/env python
"""Bisect the per-step attention glue of the 42L DiT forward on-chip.

BASELINE.md's DiT-step ablation leaves ~200 ms/step of non-projection glue
between (flash - identity) and 42x the bare kernel: qk LayerNorm, RoPE,
int8 quant reductions, head transposes, v ones-column packing. This bench
times semantically-INVALID but cost-identical variants (identity qk-norm,
identity rope, reshape-only head layout) to attribute that gap op by op.
Numbers land in BASELINE.md; outputs are garbage by construction.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, kwargs, n=3):
    fence = jax.jit(lambda x: jnp.mean(x.astype(jnp.float32)))
    out = fn(**kwargs)
    float(fence(out))
    t0 = time.perf_counter()
    float(fence(out))
    fence_ms = (time.perf_counter() - t0) * 1e3
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fence(fn(**kwargs)))
        ts.append((time.perf_counter() - t0) * 1e3 - fence_ms)
    return float(np.median(ts))


def main():
    from aether_tpu.config import DiTConfig
    import aether_tpu.models.dit as dit_mod
    from aether_tpu.models.dit import dit_forward, init_quantized_dit_params
    from aether_tpu.models.rope import prepare_rotary_positional_embeddings
    from aether_tpu.utils.profiling import warm_transfer_channel

    warm_transfer_channel()
    cfg = DiTConfig.aetherv1()
    height, width, num_frames = 480, 720, 41
    f_lat = (num_frames - 1) // 4 + 1

    params = init_quantized_dit_params(jax.random.PRNGKey(0), cfg)
    hidden = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, f_lat, cfg.in_channels, height // 8, width // 8), jnp.bfloat16)
    text = jax.random.normal(
        jax.random.PRNGKey(2),
        (1, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.bfloat16)
    timestep = jnp.array([999], jnp.int32)
    cos, sin = prepare_rotary_positional_embeddings(cfg, height, width, f_lat,
                                                    fps=12)
    kwargs = dict(params=params, hidden_states=hidden,
                  encoder_hidden_states=text, timestep=timestep,
                  rope_cos=jnp.asarray(cos), rope_sin=jnp.asarray(sin))

    orig_ln = dit_mod.layer_norm
    orig_rope = dit_mod.apply_rotary_emb

    def ln_skip_qknorm(x, scale=None, bias=None, eps=1e-5):
        # qk-norm calls are the only layer_norm calls on 4-D inputs
        if x.ndim == 4:
            return x
        return orig_ln(x, scale, bias, eps)

    variants = {
        "baseline": {},
        "no_qknorm": {"layer_norm": ln_skip_qknorm},
        "no_rope": {"apply_rotary_emb": lambda x, c, s: x},
        "no_qknorm_no_rope": {"layer_norm": ln_skip_qknorm,
                              "apply_rotary_emb": lambda x, c, s: x},
    }
    for name, patches in variants.items():
        for attr, repl in patches.items():
            setattr(dit_mod, attr, repl)
        try:
            fn = jax.jit(functools.partial(dit_forward, cfg=cfg,
                                           attn_impl="flash"))
            ms = timeit(fn, kwargs)
            print(f"dit_forward[{name}]: {ms:.0f} ms", flush=True)
        finally:
            dit_mod.layer_norm = orig_ln
            dit_mod.apply_rotary_emb = orig_rope


if __name__ == "__main__":
    main()
