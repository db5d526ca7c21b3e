#!/usr/bin/env python
"""Bench VAE decode variants: temporal chunk size x spatial tile shape.

Finds the fastest memory-safe configuration for the 41f x 480p window decode.
"""

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
    from aether_tpu.pipeline.aether import _decode_pixels, _decode_pixels_tiled
    from aether_tpu.utils.profiling import warm_transfer_channel

    warm_transfer_channel()
    cfg = PipelineConfig.aetherv1()
    dtype = jnp.bfloat16
    vae_params = init_vae_params(jax.random.PRNGKey(0), cfg.vae, dtype=dtype)
    latents = jax.random.normal(jax.random.PRNGKey(1), (1, 11, 16, 60, 90),
                                dtype) * 0.7

    def timeit(fn, n=3):
        fence = jax.jit(lambda x: jnp.mean(x.astype(jnp.float32)))
        float(fence(fn()))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(fence(fn()))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    variants = [
        ("tiled(32,48) fbs2 [current]",
         lambda: _decode_pixels_tiled(cfg, dtype, vae_params, latents, 2,
                                      (32, 48), (4, 6))),
        ("tiled(32,48) fbs5",
         lambda: _decode_pixels_tiled(cfg, dtype, vae_params, latents, 5,
                                      (32, 48), (4, 6))),
        ("tiled(32,90) fbs2",
         lambda: _decode_pixels_tiled(cfg, dtype, vae_params, latents, 2,
                                      (32, 90), (4, 6))),
        ("tiled(32,90) fbs5",
         lambda: _decode_pixels_tiled(cfg, dtype, vae_params, latents, 5,
                                      (32, 90), (4, 6))),
        ("tiled(32,90) fbs11",
         lambda: _decode_pixels_tiled(cfg, dtype, vae_params, latents, 11,
                                      (32, 90), (4, 6))),
        ("untiled fbs2",
         lambda: _decode_pixels(cfg, dtype, vae_params, latents, 2)),
    ]
    for name, fn in variants:
        try:
            s = timeit(fn)
            print(f"{name}: {s:.2f} s", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
