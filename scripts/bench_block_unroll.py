#!/usr/bin/env python
"""A/B the 42-block scan unroll factor on-chip (AETHER_BLOCK_UNROLL).

Motivation: the round-5 DiT-step trace shows in-graph int8 matmul fusions at
161-188 TF/s vs 271 TF/s isolated — weight dynamic-slices serializing with
compute inside the scan body. Unroll lets XLA prefetch the next iteration's
weights under the current one's compute.
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


def timeit(fn, args, n=5):
    fence = jax.jit(lambda x: jnp.mean(x.astype(jnp.float32)))
    out = fn(*args)
    float(fence(out))
    t0 = time.perf_counter()
    float(fence(out))
    fence_ms = (time.perf_counter() - t0) * 1e3
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fence(fn(*args)))
        ts.append((time.perf_counter() - t0) * 1e3 - fence_ms)
    return float(np.median(ts))


def main():
    from aether_tpu.config import DiTConfig
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
    args = (params, hidden, text, timestep, jnp.asarray(cos),
            jnp.asarray(sin))

    unrolls = [int(u) for u in
               os.environ.get("UNROLLS", "1,2,3,6").split(",")]
    ref = None
    for u in unrolls:
        fn = jax.jit(functools.partial(dit_forward, cfg=cfg,
                                       attn_impl="flash", block_unroll=u))
        wrapped = lambda p, h, t, ts, c, s: fn(
            p, hidden_states=h, encoder_hidden_states=t, timestep=ts,
            rope_cos=c, rope_sin=s)
        t0 = time.perf_counter()
        out = wrapped(*args)
        out.block_until_ready()
        compile_s = time.perf_counter() - t0
        ms = timeit(wrapped, args)
        chk = float(jnp.mean(jnp.abs(out.astype(jnp.float32))))
        if ref is None:
            ref = chk
        print(f"unroll={u}: {ms:.0f} ms  (first-call {compile_s:.0f} s, "
              f"mean|out| {chk:.6f}, drift {abs(chk - ref):.2e})",
              flush=True)


if __name__ == "__main__":
    main()
