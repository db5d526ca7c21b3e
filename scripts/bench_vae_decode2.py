#!/usr/bin/env python
"""Ablate VAE decode: single-chunk time vs whole-decode time."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from aether_tpu.config import PipelineConfig
    from aether_tpu.models import init_vae_params
    from aether_tpu.models.vae import decode_frames
    from aether_tpu.pipeline.aether import _decode_chunk, _decode_pixels_tiled
    from aether_tpu.utils.profiling import warm_transfer_channel

    warm_transfer_channel()
    cfg = PipelineConfig.aetherv1()
    dtype = jnp.bfloat16
    vae_params = init_vae_params(jax.random.PRNGKey(0), cfg.vae, dtype=dtype)

    fence = jax.jit(lambda x: jnp.mean(x.astype(jnp.float32)))

    def timeit(fn, n=3):
        out = fn()
        float(fence(out[0] if isinstance(out, tuple) else out))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            float(fence(out[0] if isinstance(out, tuple) else out))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # single chunk, (32,90) strip tile, channels-last latent input
    z2 = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 32, 90, 16), dtype)
    z3 = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 32, 90, 16), dtype)

    s = timeit(lambda: _decode_chunk(cfg, dtype, vae_params, z3, None))
    print(f"first chunk (3 lat frames, no cache): {s:.3f} s", flush=True)
    _, cache = _decode_chunk(cfg, dtype, vae_params, z3, None)
    jax.block_until_ready(cache)
    s2 = timeit(lambda: _decode_chunk(cfg, dtype, vae_params, z2, cache))
    print(f"later chunk (2 lat frames, cached): {s2:.3f} s", flush=True)
    est = 2 * (s + 4 * s2)
    print(f"sum-of-chunks estimate for 2 strips x (1+4) chunks: {est:.2f} s",
          flush=True)

    latents = jax.random.normal(jax.random.PRNGKey(3), (1, 11, 16, 60, 90),
                                dtype) * 0.7
    s3 = timeit(lambda: _decode_pixels_tiled(cfg, dtype, vae_params, latents,
                                             2, (32, 90), (4, 6)))
    print(f"tiled(32,90) fbs2 whole decode: {s3:.2f} s", flush=True)

    # batch=2 chunk (rgb+disparity fused decode)
    z3b = jnp.concatenate([z3, z3], axis=0)
    sb = timeit(lambda: _decode_chunk(cfg, dtype, vae_params, z3b, None))
    print(f"batch=2 first chunk: {sb:.3f} s (vs 2x{s:.3f}={2*s:.3f})",
          flush=True)


if __name__ == "__main__":
    main()
