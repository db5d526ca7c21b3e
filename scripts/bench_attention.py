#!/usr/bin/env python
"""Microbenchmark: attention kernels at the AetherV1 shape (1,48,15076,64) bf16.

Compares our Pallas flash kernel (several block configs) against the
jax-bundled pallas flash_attention and splash_attention, to direct kernel
tuning. Run on the TPU; prints ms per call (median of 5 after warmup).
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


def timeit(fn, *args, n=3, chain=4):
    # On the tunneled backend block_until_ready can return before remote
    # execution completes; pulling a scalar reduction is the reliable fence.
    # Chain several calls (output feeds back as q) so the tunnel round-trip
    # amortizes, and subtract the fence-only latency.
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


def main():
    B, H, S, D = 1, 48, 15076, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, S, D), jnp.bfloat16)
    flops = 4 * B * H * S * S * D

    from aether_tpu.ops.flash_attention import flash_attention

    results = {}
    ref_out = None
    variants = [
        # (block_q, block_k, denom, fixed_max, hper, noshift, qk8, pv8)
        (1024, 1024, "mxu", True, 4, False, True, False),  # qk8 DiT default
        (1024, 1024, "mxu", True, 4, False, True, True),   # full-int8 cell
        (1024, 1024, "mxu", True, 4, False, False, True),  # pv8 only
        (1024, 2048, "mxu", True, 4, False, True, True),   # pv8: bigger k
        (2048, 1024, "mxu", True, 2, False, True, True),   # pv8: bigger q
        (1024, 1024, "mxu", True, 4, False, False, False), # bf16 fixed-max
    ]
    for bq, bk, denom, fmax, hper, ns, qk8, pv8 in variants:
        name = (f"ours bq={bq} bk={bk} denom={denom} fmax={int(fmax)} "
                f"hper={hper} ns={int(bool(ns))} qk8={int(qk8)} "
                f"pv8={int(pv8)}")
        try:
            ms, out = timeit(functools.partial(
                flash_attention, block_q=bq, block_k=bk, denom=denom,
                fixed_max=fmax, heads_per_cell=hper, noshift=ns,
                qk_int8=qk8, pv_int8=pv8), q, k, v)
            results[name] = ms
            if ref_out is None:
                ref_out = out
            else:
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                            - ref_out.astype(jnp.float32))))
                if err > 0.05:
                    print(f"  !! {name} maxerr {err}", file=sys.stderr)
        except Exception as e:
            results[name] = f"FAIL {type(e).__name__}"
        print(f"{name}: {results[name]}", flush=True)

    # jax-bundled flash attention (expects [B, H, S, D])
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention as jax_flash)

        for bq, bk in [(1024, 1024), (1024, 512)]:
            bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=min(bk, 1024),
                            block_b=1)
            fn = functools.partial(jax_flash, causal=False,
                                   sm_scale=1.0 / D**0.5, block_sizes=bs)
            name = f"jax-flash bq={bq} bk={bk}"
            try:
                # bundled kernel needs S % block == 0: pad
                Sp = ((S + bk - 1) // bk) * bk
                qp = jnp.pad(q, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
                kp = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
                vp = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
                ms, out = timeit(fn, qp, kp, vp)
                results[name] = ms
            except Exception as e:
                results[name] = f"FAIL {type(e).__name__}: {e}"
            print(f"{name}: {results[name]}", flush=True)
    except Exception as e:
        print(f"jax-flash import failed: {e}")

    # splash attention (full mask)
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )

        Sp = ((S + 2047) // 2048) * 2048
        qp = jnp.pad(q[0], ((0, 0), (0, Sp - S), (0, 0)))
        kp = jnp.pad(k[0], ((0, 0), (0, Sp - S), (0, 0)))
        vp = jnp.pad(v[0], ((0, 0), (0, Sp - S), (0, 0)))
        mask = sm.MultiHeadMask([sm.FullMask((Sp, Sp)) for _ in range(H)])
        for bq, bkv in [(1024, 1024), (512, 1024)]:
            name = f"splash bq={bq} bkv={bkv}"
            try:
                kernel = sk.make_splash_mha(
                    mask=mask,
                    head_shards=1,
                    q_seq_shards=1,
                    block_sizes=sk.BlockSizes(
                        block_q=bq, block_kv=bkv, block_kv_compute=bkv,
                        block_q_dkv=bq, block_kv_dkv=bkv,
                        block_kv_dkv_compute=bkv,
                    ),
                )
                fn = jax.jit(lambda qq, kk, vv: kernel(qq * (1.0 / D**0.5), kk, vv))
                ms, out = timeit(fn, qp, kp, vp)
                results[name] = ms
            except Exception as e:
                results[name] = f"FAIL {type(e).__name__}: {e}"
            print(f"{name}: {results[name]}", flush=True)
    except Exception as e:
        print(f"splash import failed: {e}")

    best = min((v, k) for k, v in results.items() if isinstance(v, float))
    ideal_ms = flops / 197e12 * 1e3
    print(f"\nbest: {best[1]} {best[0]:.1f} ms "
          f"({flops / best[0] * 1e-9:.0f} GFLOP/s, "
          f"ideal bf16 {ideal_ms:.0f} ms, hd64-ceiling {2 * ideal_ms:.0f} ms)")


if __name__ == "__main__":
    main()
