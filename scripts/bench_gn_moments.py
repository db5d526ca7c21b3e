#!/usr/bin/env python
"""Round-5 microbench: GroupNorm moment-reduction variants on-chip.

The decode profile measured the per-channel moments fusion at ~94 GB/s
(8 ms per [8,256,720,256] execution, 8.7x under HBM roofline) — a ~1 s/window
suspect. Times isolated variants with chained fences."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gn_cache")


def timeit(fn, x, iters=20):
    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from aether_tpu.utils.profiling import warm_transfer_channel

    warm_transfer_channel()
    T, H, W, C, G = 8, 256, 720, 256, 32
    cg = C // G
    x = jax.random.normal(jax.random.PRNGKey(0), (T, H, W, C), jnp.bfloat16)
    x.block_until_ready()
    gb = x.size * 2 / 2**30

    def cur_loop(x4):
        # current group_norm_tm moment structure (B=1): shifted per-frame loop
        first = x4[:1, 0, 0, :].astype(jnp.float32)
        c0 = jnp.repeat(first.reshape(1, G, cg)[:, :, 0], cg, axis=-1)
        c0r = c0[:, None, None, :]
        s1 = jnp.zeros((1, C), jnp.float32)
        s2 = jnp.zeros((1, C), jnp.float32)
        for ti in range(T):
            yt = x4[ti:ti + 1].astype(jnp.float32) - c0r
            s1 = s1 + jnp.sum(yt, axis=(1, 2))
            s2 = s2 + jnp.sum(jnp.square(yt), axis=(1, 2))
        return s1, s2

    def one_reduce(x4):
        y = x4.astype(jnp.float32)
        return jnp.sum(y, axis=(0, 1, 2)), jnp.sum(jnp.square(y), axis=(0, 1, 2))

    def two_stage(x4):
        z = x4.reshape(T * H, W, C).astype(jnp.float32)
        p1 = jnp.sum(z, axis=1)          # [T*H, C]
        p2 = jnp.sum(jnp.square(z), axis=1)
        return jnp.sum(p1, axis=0), jnp.sum(p2, axis=0)

    def matmul_ones(x4):
        z = x4.reshape(-1, C)
        ones = jnp.ones((1, z.shape[0]), jnp.bfloat16)
        s1 = jnp.matmul(ones, z, preferred_element_type=jnp.float32)
        s2 = jnp.matmul(ones, jnp.square(z), preferred_element_type=jnp.float32)
        return s1, s2

    def matmul_blocked(x4):
        # [K, M/K, C]: K-row left operand gives the MXU real tiles
        z = x4.reshape(128, -1, C)
        ones = jnp.ones((z.shape[1],), jnp.bfloat16)
        s1 = jnp.einsum("kmc,m->kc", z, ones,
                        preferred_element_type=jnp.float32).sum(0)
        s2 = jnp.einsum("kmc,m->kc", jnp.square(z), ones,
                        preferred_element_type=jnp.float32).sum(0)
        return s1, s2

    for name, fn in [("cur_loop", cur_loop), ("one_reduce", one_reduce),
                     ("two_stage", two_stage), ("matmul_ones", matmul_ones),
                     ("matmul_blocked", matmul_blocked)]:
        try:
            ms = timeit(jax.jit(fn), x)
            print(f"{name:16s} {ms:7.2f} ms  ({gb / (ms / 1e3):5.0f} GB/s read)",
                  flush=True)
        except Exception as e:
            print(f"{name:16s} FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)

    # the normalize/apply pass for reference (read+write full tensor)
    def apply_pass(x4):
        return (x4.astype(jnp.float32) * 1.01 - 0.5).astype(jnp.bfloat16)

    ms = timeit(jax.jit(apply_pass), x)
    print(f"{'apply_pass':16s} {ms:7.2f} ms  ({2 * gb / (ms / 1e3):5.0f} GB/s r+w)")


if __name__ == "__main__":
    main()
