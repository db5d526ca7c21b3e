#!/usr/bin/env python
"""Probe: process H_PER heads per grid cell (batched matmuls) to amortize
per-cell overhead in the flash kernel. Same MXU work, fewer grid cells,
H_PER x the VMEM scratch."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
_LOG2E = 1.4426950408889634


def timeit(fn, *args, n=3, chain=4):
    fence = jax.jit(lambda x: jnp.mean(x.astype(jnp.float32)))
    out = fn(*args)
    float(fence(out))
    t0 = time.perf_counter()
    float(fence(out))
    fence_ms = (time.perf_counter() - t0) * 1e3
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        cur = fn(*args)
        for _ in range(chain - 1):
            cur = fn(cur, *args[1:])
        float(fence(cur))
        ts.append(((time.perf_counter() - t0) * 1e3 - fence_ms) / chain)
    return float(np.median(ts)), out


def _kernel(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s, *,
            kv_len, block_k, num_kv_blocks, hper):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, -jnp.inf)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    q = q_ref[...]  # (hper, bq, d)
    k = k_ref[...]  # (hper, bk, d)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (hper, bq, bk)

    if kv_len < num_kv_blocks * block_k:
        col = kv_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_s[...]          # (hper, bq, 128)
    l_prev = l_s[...]
    m_curr = jnp.max(s, axis=2, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(s - m_next[:, :, :1])
    l_s[...] = alpha * l_prev + jnp.sum(p, axis=2, keepdims=True)
    m_s[...] = m_next

    v = v_ref[...]  # (hper, bk, d)
    o_curr = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    acc_s[...] = acc_s[...] * alpha[:, :, :1] + o_curr

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l_final = l_s[...][:, :, :1]
        l_inv = jnp.where(l_final <= 0.0, 1.0, 1.0 / l_final)
        o_ref[...] = (acc_s[...] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "hper"))
def flash_mh(q, k, v, block_q=1024, block_k=1024, hper=2):
    batch, heads, seq, dim = q.shape
    scale = 1.0 / dim**0.5 * _LOG2E
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    import math
    step = math.lcm(block_q, block_k)
    seq_pad = -(-seq // step) * step

    def _pad(x):
        return x if seq_pad == seq else jnp.pad(
            x, ((0, 0), (0, 0), (0, seq_pad - seq), (0, 0)))

    bh = batch * heads
    qp = _pad(q).reshape(bh, seq_pad, dim)
    kp = _pad(k).reshape(bh, seq_pad, dim)
    vp = _pad(v).reshape(bh, seq_pad, dim)
    num_q, num_kv = seq_pad // block_q, seq_pad // block_k

    out = pl.pallas_call(
        functools.partial(_kernel, kv_len=seq, block_k=block_k,
                          num_kv_blocks=num_kv, hper=hper),
        out_shape=jax.ShapeDtypeStruct((bh, seq_pad, dim), q.dtype),
        grid=(bh // hper, num_q, num_kv),
        in_specs=[
            pl.BlockSpec((hper, block_q, dim), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((hper, block_k, dim), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((hper, block_k, dim), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((hper, block_q, dim),
                               lambda b, qi, ki: (b, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((hper, block_q, 128), jnp.float32),
            pltpu.VMEM((hper, block_q, 128), jnp.float32),
            pltpu.VMEM((hper, block_q, dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * seq_pad * seq_pad * dim,
            bytes_accessed=4 * bh * seq_pad * dim * q.dtype.itemsize,
            transcendentals=bh * seq_pad * seq_pad,
        ),
    )(qp, kp, vp)
    out = out.reshape(batch, heads, seq_pad, dim)
    return out[:, :, :seq] if seq_pad != seq else out


def main():
    from aether_tpu.ops.flash_attention import flash_attention
    from aether_tpu.utils.profiling import warm_transfer_channel

    warm_transfer_channel()
    b, h, s, d = 1, 48, 15076, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, s, d), jnp.bfloat16)

    ms, ref = timeit(flash_attention, q, k, v)
    refn = np.asarray(ref[0, :2, -256:].astype(jnp.float32))
    print(f"prod kernel (1536): {ms:7.1f} ms", flush=True)

    for hper, bq, bk in [(4, 1024, 1024), (8, 1024, 1024), (12, 1024, 1024),
                         (4, 1280, 1280), (4, 768, 1024), (16, 1024, 1024),
                         (4, 1024, 1024)]:
        if (48 % hper):
            continue
        fn = functools.partial(flash_mh, block_q=bq, block_k=bk, hper=hper)
        try:
            ms, out = timeit(fn, q, k, v)
            err = float(np.max(np.abs(
                np.asarray(out[0, :2, -256:].astype(jnp.float32)) - refn)))
            print(f"mh hper={hper} {bq}x{bk}: {ms:7.1f} ms  maxdiff={err:.4f}",
                  flush=True)
        except Exception as e:
            print(f"mh hper={hper} {bq}x{bk}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
