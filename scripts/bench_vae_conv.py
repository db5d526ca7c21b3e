#!/usr/bin/env python
"""Microbench: conv3d shapes that dominate the VAE decoder, on the TPU.

Reports achieved TFLOP/s per shape so we know whether XLA's conv lowering is
the bottleneck or the chunk/tile structure is.
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


def timeit(fn, *args, n=3):
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


def conv3d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((2, 0), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def main():
    # (T, H, W, C) per decode chunk at each decoder stage, 2-latent-frame
    # chunks, 32x48-latent spatial tiles (256x384 px)
    shapes = [
        ("final 480p stage", (1, 8, 256, 384, 128), (3, 3, 3, 128, 128)),
        ("240p stage", (1, 4, 128, 192, 256), (3, 3, 3, 256, 256)),
        ("120p stage", (1, 2, 64, 96, 256), (3, 3, 3, 256, 256)),
        ("latent stage", (1, 2, 32, 48, 512), (3, 3, 3, 512, 512)),
        # what if chunks were 4 latent frames (2x fewer chunks)?
        ("final, fbs4", (1, 16, 256, 384, 128), (3, 3, 3, 128, 128)),
        # untiled full frame at final stage
        ("final, untiled", (1, 8, 480, 720, 128), (3, 3, 3, 128, 128)),
    ]
    fn = jax.jit(conv3d)
    for name, xs, ws in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), xs, jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), ws, jnp.bfloat16) * 0.02
        ms = timeit(fn, x, w)
        flops = 2 * np.prod(xs) * ws[-1] * 27
        print(f"{name}: {ms:.1f} ms  {flops / ms * 1e-9:.0f} GFLOP/s "
              f"({flops / ms * 1e-9 / 197e3 * 100:.0f}% peak)", flush=True)


if __name__ == "__main__":
    main()
