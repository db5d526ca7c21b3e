#!/usr/bin/env python
"""Bench flash-attention kernel variants at the AetherV1 attention shape.

Shape: [1, 48, 15076, 64] bf16 (226 text + 14850 video tokens). Baseline is
``aether_tpu.ops.flash_attention`` (56 ms measured on v5e). Variants probe:
  - exp2 with sm_scale*log2(e) folded into q (kills one S^2 multiply pass and
    uses the cheaper base-2 exponential)
  - masking only the straddling kv block (static pl.when instead of a where
    in every grid cell)
  - K passed pre-transposed [bh, d, S] so the MXU gets an nn-layout matmul
    without a per-(q-block, k-block) in-kernel transpose
  - block-size sweep incl. 1536 (15076 -> 15360: 1.9% pad vs 8.7% at 2048)
  - the jax library TPU flash kernel as a yardstick
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


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


# ---------------------------------------------------------------- variant kernel
def _kernel_v2(
    q_ref, k_ref, v_ref, o_ref, m_scratch, l_scratch, acc_scratch,
    *, kv_len, block_k, num_kv_blocks, mask_last_only, kt,
):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]
    if kt:
        k = k_ref[0]  # (d, block_k)
        s = jax.lax.dot_general(
            q, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    else:
        k = k_ref[0]  # (block_k, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    needs_mask = kv_len < num_kv_blocks * block_k

    def masked(si):
        col = kv_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, si.shape, 1)
        return jnp.where(col < kv_len, si, _NEG_INF)

    if needs_mask and not mask_last_only:
        s = masked(s)
    if needs_mask and mask_last_only:
        # padding only ever lives in the final kv block (pad < block_k)
        s = jax.lax.cond(kv_idx == num_kv_blocks - 1, masked, lambda si: si, s)

    m_prev = m_scratch[...]
    l_prev = l_scratch[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(s - m_next[:, :1])
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scratch[...] = m_next
    l_scratch[...] = l_next

    v = v_ref[0]
    o_curr = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + o_curr

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l_final = l_scratch[...][:, :1]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "block_q", "block_k", "mask_last_only", "kt"),
)
def flash_v2(q, k, v, sm_scale=None, block_q=1024, block_k=1024,
             mask_last_only=True, kt=False):
    batch, heads, seq, dim = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / (dim**0.5)
    # fold scale AND the exp2 conversion into q: one S*d pass instead of S^2
    q = (q.astype(jnp.float32) * (sm_scale * LOG2E)).astype(q.dtype)

    seq_pad = -(-seq // block_q) * block_q
    seq_pad = -(-seq_pad // block_k) * block_k
    if seq_pad % block_q:
        seq_pad += block_q - seq_pad % block_q
    if mask_last_only:
        assert seq_pad - seq < block_k, (seq_pad, seq, block_k)

    def _pad(x):
        if seq_pad == seq:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, seq_pad - seq), (0, 0)))

    qp, kp, vp = _pad(q), _pad(k), _pad(v)
    bh = batch * heads
    qp = qp.reshape(bh, seq_pad, dim)
    kp = kp.reshape(bh, seq_pad, dim)
    vp = vp.reshape(bh, seq_pad, dim)
    if kt:
        kp = kp.transpose(0, 2, 1)  # (bh, d, S) once, in XLA

    num_q, num_kv = seq_pad // block_q, seq_pad // block_k
    kernel = functools.partial(
        _kernel_v2, kv_len=seq, block_k=block_k, num_kv_blocks=num_kv,
        mask_last_only=mask_last_only, kt=kt,
    )
    k_spec = (
        pl.BlockSpec((1, dim, block_k), lambda b, qi, ki: (b, 0, ki))
        if kt else pl.BlockSpec((1, block_k, dim), lambda b, qi, ki: (b, ki, 0))
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, seq_pad, dim), q.dtype),
        grid=(bh, num_q, num_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, dim), lambda b, qi, ki: (b, qi, 0)),
            k_spec,
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

    ref = None

    def check(out):
        nonlocal ref
        if ref is None:
            ref = np.asarray(out[0, :2, :64].astype(jnp.float32))
            return 0.0
        return float(np.max(np.abs(np.asarray(out[0, :2, :64].astype(jnp.float32)) - ref)))

    base = functools.partial(flash_attention, block_q=1024, block_k=1024)
    out = base(q, k, v)
    check(out)
    print(f"baseline 1024x1024: {timeit(base, q, k, v):7.1f} ms", flush=True)

    for bq, bk, kt in [
        (1024, 1024, False),
        (1024, 1024, True),
        (1536, 1536, False),
        (1536, 1536, True),
        (2048, 1024, False),
        (1024, 2048, False),
        (2048, 2048, False),
        (3072, 1536, False),
        (1536, 3072, False),
        (512, 1536, False),
    ]:
        fn = functools.partial(flash_v2, block_q=bq, block_k=bk, kt=kt)
        try:
            err = check(fn(q, k, v))
            ms = timeit(fn, q, k, v)
            print(f"v2 {bq}x{bk} kt={int(kt)}: {ms:7.1f} ms  maxdiff={err:.4f}",
                  flush=True)
        except Exception as e:
            print(f"v2 {bq}x{bk} kt={int(kt)}: FAILED {type(e).__name__}: {e}",
                  flush=True)

    # jax library kernel yardstick
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention as jax_flash)

        bs = BlockSizes(block_q=1024, block_k_major=1024, block_k=1024,
                        block_b=1)
        fn = functools.partial(jax_flash, causal=False,
                               sm_scale=1.0 / d**0.5, block_sizes=bs)
        err = check(fn(q, k, v))
        print(f"jax library 1024: {timeit(fn, q, k, v):7.1f} ms  "
              f"maxdiff={err:.4f}", flush=True)
    except Exception as e:
        print(f"jax library kernel: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
