#!/usr/bin/env python
"""Ablation bench of one DiT forward at the AetherV1 window shape.

Times the 42-layer forward with (a) flash attention, (b) attention replaced by
identity (isolates linears+elementwise), and reports where the denoise step's
time goes. fp8 weight layout (the deployment config).
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


def timeit(fn, args, n=3):
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
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    args = (params, hidden, text, timestep, cos, sin)

    for impl in ["flash", "identity", "nokernel", "norope"]:
        if impl == "identity":
            # bypass the WHOLE attention path (prologue+kernel+epilogue):
            # isolates linears+elementwise. The shipping path is the fused
            # prologue (AETHER_ATTN_FUSED default-on), whose seam is
            # attn_prologue.fused_joint_attention — patching
            # dit.flash_attention alone no longer ablates anything (the
            # round-4 version of this bench measured flash==identity for
            # exactly that reason).
            import aether_tpu.models.dit as dit_mod
            import aether_tpu.ops.attn_prologue as prol_mod
            orig = dit_mod.flash_attention
            orig_fused = prol_mod.fused_joint_attention
            dit_mod.flash_attention = lambda q, k, v, **kw: v
            prol_mod.fused_joint_attention = (
                lambda xq, xk, xv, *a, **kw: xv)
            fn = jax.jit(functools.partial(
                dit_forward, cfg=cfg, attn_impl="flash"),
                static_argnames=())
            try:
                ms = timeit(lambda p, h, t, ts, c, s: fn(
                    p, hidden_states=h, encoder_hidden_states=t, timestep=ts,
                    rope_cos=c, rope_sin=s), args)
            finally:
                dit_mod.flash_attention = orig
                prol_mod.fused_joint_attention = orig_fused
        elif impl == "nokernel":
            # prologue + epilogue run, flash kernel bypassed (returns the
            # packed v lanes): flash - nokernel = pure kernel time in-graph
            import aether_tpu.ops.attn_prologue as prol_mod
            orig_prepacked = prol_mod.flash_attention_prepacked

            def _bypass(q, k, v_ext, *, dim, out_dtype, **kw):
                return v_ext[:, :, :dim].astype(out_dtype)

            prol_mod.flash_attention_prepacked = _bypass
            fn = jax.jit(functools.partial(
                dit_forward, cfg=cfg, attn_impl="flash"))
            try:
                ms = timeit(lambda p, h, t, ts, c, s: fn(
                    p, hidden_states=h, encoder_hidden_states=t, timestep=ts,
                    rope_cos=c, rope_sin=s), args)
            finally:
                prol_mod.flash_attention_prepacked = orig_prepacked
        elif impl == "norope":
            fn = jax.jit(functools.partial(
                dit_forward, cfg=cfg, attn_impl="flash"))
            ms = timeit(lambda p, h, t, ts, c, s: fn(
                p, hidden_states=h, encoder_hidden_states=t, timestep=ts,
                rope_cos=None, rope_sin=None), args)
        else:
            fn = jax.jit(functools.partial(
                dit_forward, cfg=cfg, attn_impl=impl))
            ms = timeit(lambda p, h, t, ts, c, s: fn(
                p, hidden_states=h, encoder_hidden_states=t, timestep=ts,
                rope_cos=c, rope_sin=s), args)
        print(f"dit_forward[{impl}]: {ms:.0f} ms", flush=True)

    profile_dir = os.environ.get("AETHER_PROFILE_DIR")
    if profile_dir:
        # one traced flash forward for the glue hunt: the ~330 ms/step gap
        # between (flash - identity) and 42x the bare kernel time
        # (BASELINE.md DiT step ablation) — open with xprof/tensorboard
        fn = jax.jit(functools.partial(dit_forward, cfg=cfg,
                                       attn_impl="flash"))
        out = fn(params, hidden_states=hidden, encoder_hidden_states=text,
                 timestep=timestep, rope_cos=cos, rope_sin=sin)
        out.block_until_ready()
        with jax.profiler.trace(profile_dir):
            out = fn(params, hidden_states=hidden, encoder_hidden_states=text,
                     timestep=timestep, rope_cos=cos, rope_sin=sin)
            out.block_until_ready()
        print(f"trace written to {profile_dir}", flush=True)


if __name__ == "__main__":
    main()
