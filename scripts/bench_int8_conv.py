#!/usr/bin/env python
"""Probe: do int8 convolutions hit the v5e int8 MXU (2x bf16 peak) at the
VAE decode's hot shapes? Decode's conv work runs at 185 TF/s (94% of bf16
peak, BASELINE r5) — int8 convs are the only lever below that floor.
Chained timing, decode top-stage shape."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/conv8_cache")


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from aether_tpu.utils.profiling import warm_transfer_channel

    warm_transfer_channel()
    N, H, W = 8, 256, 720
    shapes = [((N, H, W, 384), (3, 3, 384, 128)),
              ((N, H // 2, W // 2, 768), (3, 3, 768, 256))]
    for (xs, ws) in shapes:
        flops = 2.0 * xs[0] * xs[1] * xs[2] * ws[0] * ws[1] * ws[2] * ws[3]
        xb = jax.random.normal(jax.random.PRNGKey(0), xs, jnp.bfloat16)
        wb = jax.random.normal(jax.random.PRNGKey(1), ws, jnp.bfloat16) * 0.05
        xi = (xb * 10).astype(jnp.int8)
        wi = (wb * 100).astype(jnp.int8)
        jax.block_until_ready((xb, wb, xi, wi))

        @jax.jit
        def conv_bf16(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def conv_int8(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)

        @jax.jit
        def conv_int8_bf16out(x, w):
            # int8 operands, f32 accumulate via preferred type
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        for name, fn, a, b in [("bf16", conv_bf16, xb, wb),
                               ("int8->s32", conv_int8, xi, wi),
                               ("int8->f32->bf16", conv_int8_bf16out, xi, wi)]:
            try:
                ms = timeit(fn, a, b)
                print(f"{xs}x{ws} {name:16s} {ms:7.2f} ms "
                      f"({flops / (ms / 1e3) / 1e12:5.0f} TF/s)", flush=True)
            except Exception as e:
                print(f"{xs}x{ws} {name:16s} FAIL {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
