#!/usr/bin/env python
"""Bisect which flash-kernel change regressed perf, at (1,48,15076,64) bf16.

Variants (all at 1024x1024 blocks unless noted):
  base        : aether_tpu.ops.flash_attention as-is (56 ms prior measurement)
  fold        : sm_scale folded into q outside the kernel; exp; where-mask
  fold2       : fold + exp2 (log2-domain softmax)
  padfix      : fold + exp2 + NO in-kernel mask at all — zero-padded keys give
                score 0 and zero V-rows, so the only softmax corruption is
                pad_count * exp2(-m_final) extra mass in l, subtracted exactly
                once at the final store.
  padfix_exp  : padfix but with exp (isolates exp vs exp2)
Then block sweep of the winner with a raised scoped-vmem limit.
"""

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
LOG2E = 1.4426950408889634


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
            kv_len, block_k, num_kv_blocks, mode):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, -jnp.inf)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    if mode in ("fold", "fold2") and kv_len < num_kv_blocks * block_k:
        col = kv_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)

    exp = jnp.exp if mode in ("fold", "padfix_exp") else jnp.exp2

    m_prev = m_s[...]
    l_prev = l_s[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = exp(m_prev - m_next)
    p = exp(s - m_next[:, :1])
    l_s[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_s[...] = m_next

    v = v_ref[0]
    o_curr = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    acc_s[...] = acc_s[...] * alpha[:, :1] + o_curr

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l_final = l_s[...][:, :1]
        if mode in ("padfix", "padfix_exp"):
            pad = num_kv_blocks * block_k - kv_len
            if pad:
                l_final = l_final - pad * exp(-m_s[...][:, :1])
        l_inv = jnp.where(l_final <= 0.0, 1.0, 1.0 / l_final)
        o_ref[0] = (acc_s[...] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "mode"))
def flash_x(q, k, v, block_q=1024, block_k=1024, mode="fold"):
    batch, heads, seq, dim = q.shape
    scale = 1.0 / dim**0.5
    if mode != "fold" and mode != "padfix_exp":
        scale = scale * LOG2E
    elif mode == "padfix_exp":
        pass
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)

    seq_pad = -(-seq // block_q) * block_q
    seq_pad = -(-seq_pad // block_k) * block_k
    if seq_pad % block_q:
        seq_pad += block_q - seq_pad % block_q

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
                          num_kv_blocks=num_kv, mode=mode),
        out_shape=jax.ShapeDtypeStruct((bh, seq_pad, dim), q.dtype),
        grid=(bh, num_q, num_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, dim), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, dim), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, dim), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dim), lambda b, qi, ki: (b, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
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

    ms, ref = timeit(functools.partial(flash_attention, block_q=1024,
                                       block_k=1024), q, k, v)
    refn = np.asarray(ref[0, :2, -256:].astype(jnp.float32))
    print(f"base 1024x1024: {ms:7.1f} ms", flush=True)

    for mode in ["fold", "fold2", "padfix", "padfix_exp"]:
        fn = functools.partial(flash_x, block_q=1024, block_k=1024, mode=mode)
        try:
            ms, out = timeit(fn, q, k, v)
            err = float(np.max(np.abs(
                np.asarray(out[0, :2, -256:].astype(jnp.float32)) - refn)))
            print(f"{mode:11s} 1024x1024: {ms:7.1f} ms  maxdiff={err:.4f}",
                  flush=True)
        except Exception as e:
            print(f"{mode}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    # block sweep on the pad-corrected kernel
    for bq, bk in [(512, 1024), (1024, 512), (512, 512), (2048, 512),
                   (512, 2048), (256, 1024), (1024, 256)]:
        fn = functools.partial(flash_x, block_q=bq, block_k=bk, mode="padfix")
        try:
            ms, out = timeit(fn, q, k, v)
            err = float(np.max(np.abs(
                np.asarray(out[0, :2, -256:].astype(jnp.float32)) - refn)))
            print(f"padfix {bq}x{bk}: {ms:7.1f} ms  maxdiff={err:.4f}",
                  flush=True)
        except Exception as e:
            print(f"padfix {bq}x{bk}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
