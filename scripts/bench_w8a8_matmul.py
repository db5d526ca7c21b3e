#!/usr/bin/env python
"""Isolate the int8-MXU matmul efficiency of the DiT linears.

The round-2 DiT step ablation (BASELINE.md) put the non-attention compute at
~740 ms/step = 146 TFLOP at ~197 TF/s — about the v5e bf16 peak — while the
int8 MXU path is rated 2x that. This bench times the two matmul shapes the
DiT runs (attention projections: 15360x3072 @ 3072x3072; the MLP pair:
@ 3072x12288 then @ 12288x3072) in three regimes:

  bf16      : bf16 @ bf16 -> f32 (the unquantized baseline)
  int8_raw  : int8 @ int8 -> int32 MXU dot + int8 recast (the ceiling,
              modulo one cast pass)
  w8a8      : the production `_linear_w8a8` (dynamic act quant + dequant)

Timing: N iterations inside ONE jitted lax.scan where each iteration's
output IS the next iteration's input (real dataflow — XLA cannot DCE or
reorder it). Per-call host fences are ~30 ms on the tunneled chip and swamp
ms-scale ops; the first version of this script measured NEGATIVE times, and
a scalar y[0,0] carry dependency is unsafe (XLA pushes the slice into the
dot and shrinks it).
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

N_ITER = 24


def chained_ms(step_fn, x, n=N_ITER, reps=3):
    """Median per-iteration ms of ``x = step_fn(x)`` chained n times in one
    jit (step_fn must be shape/dtype-preserving)."""

    @jax.jit
    def run(x0):
        def body(c, _):
            return step_fn(c), ()

        out, _ = jax.lax.scan(body, x0, None, length=n)
        return out

    fence = jax.jit(lambda t: jnp.sum(jnp.ravel(t)[:1].astype(jnp.float32)))
    float(fence(run(x)))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fence(run(x)))
        ts.append((time.perf_counter() - t0) * 1e3 / n)
    return float(np.median(ts))


def main():
    from aether_tpu.models.dit import _linear_w8a8
    from aether_tpu.utils.profiling import warm_transfer_channel

    warm_transfer_channel()
    key = jax.random.PRNGKey(0)
    s = 15360
    d = 3072

    x = jax.random.normal(key, (s, d), jnp.bfloat16) * 0.05
    w_sq = jax.random.normal(jax.random.fold_in(key, 1), (d, d),
                             jnp.bfloat16) * 0.02
    w_up = jax.random.normal(jax.random.fold_in(key, 2), (d, 4 * d),
                             jnp.bfloat16) * 0.02
    w_dn = jax.random.normal(jax.random.fold_in(key, 3), (4 * d, d),
                             jnp.bfloat16) * 0.02

    def q8(w):
        scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0
        return (jnp.round(w.astype(jnp.float32) / scale).astype(jnp.int8),
                scale)

    w_sq8, s_sq = q8(w_sq)
    w_up8, s_up = q8(w_up)
    w_dn8, s_dn = q8(w_dn)

    cases = {
        "proj 3072x3072": {
            "flop": 2 * s * d * d,
            "bf16": lambda c: jnp.dot(
                c, w_sq, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16) * 0.05,
            "int8_raw": lambda c: jnp.clip(jax.lax.dot_general(
                c, w_sq8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32) >> 7, -127, 127
            ).astype(jnp.int8),
            "w8a8": lambda c: _linear_w8a8(
                c, {"q": w_sq8, "s": s_sq}, None) * 0.05,
        },
        "mlp 3072->12288->3072": {
            "flop": 2 * s * d * 4 * d * 2,
            "bf16": lambda c: jnp.dot(
                jnp.dot(c, w_up, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16),
                w_dn, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16) * 0.05,
            "int8_raw": lambda c: jnp.clip(jax.lax.dot_general(
                jnp.clip(jax.lax.dot_general(
                    c, w_up8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32) >> 7, -127, 127
                ).astype(jnp.int8),
                w_dn8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32) >> 7, -127, 127
            ).astype(jnp.int8),
            "w8a8": lambda c: _linear_w8a8(
                _linear_w8a8(c, {"q": w_up8, "s": s_up}, None),
                {"q": w_dn8, "s": s_dn}, None) * 0.05,
        },
    }

    # --- MLP down-proj (N=3072, the narrow-shape 144 TF/s case) layout probes:
    # can the 12288->3072 matmul reach the wide-N rate through a different
    # contraction layout? (VERDICT r3 #2)
    x4 = jax.random.normal(jax.random.fold_in(key, 4), (s, 4 * d),
                           jnp.bfloat16) * 0.05
    w_dn8_t = jnp.asarray(np.ascontiguousarray(np.asarray(w_dn8).T))  # [3072, 12288], contract dim 1
    dn_flop = 2 * s * 4 * d * d

    def dn_std(c):
        y = jax.lax.dot_general(c, w_dn8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)

    def dn_wt(c):
        y = jax.lax.dot_general(c, w_dn8_t, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)

    def dn_ksplit(c):
        # K=12288 as 4 stacked [3072, 3072] dots summed — trades one tall
        # matmul for four square ones (probes whether N=3072 inefficiency
        # is K-pipelining or N-width)
        cs = c.reshape(s, 4, d)
        y = sum(jax.lax.dot_general(cs[:, i], w_dn8[i * d:(i + 1) * d],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                for i in range(4))
        return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)

    x48 = jnp.round(jnp.clip(x4.astype(jnp.float32) * 100, -127, 127)).astype(
        jnp.int8)
    for label, fn_probe in (("dn_standard", dn_std), ("dn_w_transposed", dn_wt),
                            ("dn_k_split4", dn_ksplit)):
        def step(c, f=fn_probe):
            out = f(c)  # [s, d] int8
            return jnp.tile(out, (1, 4))  # back to [s, 4d] for the chain

        ms = chained_ms(step, x48)
        print(f"[mlp dn 12288->3072] {label:15s}: {ms:7.3f} ms "
              f"({dn_flop / (ms * 1e-3) / 1e12:6.1f} TF/s, incl tile pass)",
              flush=True)

    x8 = jnp.round(jnp.clip(x.astype(jnp.float32) * 100, -127, 127)).astype(
        jnp.int8)
    for name, case in cases.items():
        flop = case["flop"]
        for label in ("bf16", "int8_raw", "w8a8"):
            inp = x8 if label == "int8_raw" else x
            ms = chained_ms(case[label], inp)
            print(f"[{name}] {label:9s}: {ms:7.3f} ms "
                  f"({flop / (ms * 1e-3) / 1e12:6.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
