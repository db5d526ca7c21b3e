#!/usr/bin/env python
"""Microbench conv formulations for the VAE decoder's hot 3x3x3 convs.

The round-4 decode profile (batch-1 strip path, GN Pallas off) put the whole
41f x 480p decode at 3.51 s warm (~29 TF/s = 14% of v5e bf16 peak) with the
3x3x3 convolution fusions as the largest op family. XLA lowers NDHWC conv3d
on TPU; this bench asks whether re-expressing the temporal tap as 2-D convs
(T folded into the batch dim — the MXU-native conv form) is faster:

  conv3d      : lax.conv_general_dilated NDHWC, causal pad (current code)
  sum3x2d     : y = sum_k conv2d(x_pad[:, k:k+T] folded to [B*T,H,W,C], K[k])
  stack3x2d   : one conv2d on channel-stacked shifted views [B*T,H,W,3C]
  conv2d_ref  : per-frame (1,3,3) conv — the no-temporal-tap ceiling

Shapes are the two stages that dominate the strip decode (full-width strips,
first chunk: 9 pixel frames).
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

N_ITER = 8


def chained_ms(step_fn, x, n=N_ITER, reps=3):
    """Median per-iteration ms of x = step_fn(x) chained inside one jit."""

    @jax.jit
    def run(x0):
        def body(c, _):
            return step_fn(c), ()

        out, _ = jax.lax.scan(body, x0, None, length=n)
        return out

    fence = jax.jit(lambda t: jnp.sum(jnp.ravel(t)[:1].astype(jnp.float32)))
    float(fence(run(x)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fence(run(x)))
        ts.append((time.perf_counter() - t0) * 1e3 / n)
    return float(np.median(ts))


def main():
    from aether_tpu.utils.profiling import warm_transfer_channel

    warm_transfer_channel()
    key = jax.random.PRNGKey(0)

    # (name, activation [B,T,H,W,C], Cout)
    shapes = [
        ("final 256x720 c128", (1, 9, 256, 720, 128), 128),
        ("240p 128x360 c256", (1, 9, 128, 360, 256), 256),
    ]

    for name, xs, cout in shapes:
        b, t, h, w, c = xs
        x = jax.random.normal(key, xs, jnp.bfloat16) * 0.1
        k3 = jax.random.normal(jax.random.fold_in(key, 1),
                               (3, 3, 3, c, cout), jnp.bfloat16) * 0.02
        flops = 2 * b * t * h * w * c * cout * 27

        def conv3d(v, k3=k3):
            # causal: 2 replicate frames in front (precomputed pad inside)
            front = jnp.repeat(v[:, :1], 2, axis=1)
            vp = jnp.concatenate([front, v], axis=1)
            out = jax.lax.conv_general_dilated(
                vp, k3, (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return out.astype(v.dtype)

        def sum3x2d(v, k3=k3):
            front = jnp.repeat(v[:, :1], 2, axis=1)
            vp = jnp.concatenate([front, v], axis=1)  # [B, T+2, H, W, C]
            out = None
            for kk in range(3):
                xt = vp[:, kk:kk + t].reshape(b * t, h, w, c)
                o = jax.lax.conv_general_dilated(
                    xt, k3[kk], (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                out = o if out is None else out + o
            return out.reshape(b, t, h, w, cout).astype(v.dtype)

        def stack3x2d(v, k3=k3):
            front = jnp.repeat(v[:, :1], 2, axis=1)
            vp = jnp.concatenate([front, v], axis=1)
            xt = jnp.concatenate(
                [vp[:, kk:kk + t] for kk in range(3)], axis=-1
            ).reshape(b * t, h, w, 3 * c)
            kst = jnp.concatenate([k3[0], k3[1], k3[2]], axis=-2)
            o = jax.lax.conv_general_dilated(
                xt, kst, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return o.reshape(b, t, h, w, cout).astype(v.dtype)

        def conv2d_ref(v, k3=k3):
            xt = v.reshape(b * t, h, w, c)
            o = jax.lax.conv_general_dilated(
                xt, k3[1], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return o.reshape(b, t, h, w, cout).astype(v.dtype)

        # correctness cross-check once (cheap shapes dominate compile anyway)
        r3 = conv3d(x)
        r2 = sum3x2d(x)
        rs = stack3x2d(x)
        err_a = float(jnp.max(jnp.abs(r3.astype(jnp.float32)
                                      - r2.astype(jnp.float32))))
        err_b = float(jnp.max(jnp.abs(r3.astype(jnp.float32)
                                      - rs.astype(jnp.float32))))
        print(f"{name}: sum3x2d maxerr {err_a:.3e}  stack3x2d maxerr "
              f"{err_b:.3e}", flush=True)

        for fname, fn in (("conv3d", conv3d), ("sum3x2d", sum3x2d),
                          ("stack3x2d", stack3x2d),
                          ("conv2d_ref(1/3 flops)", conv2d_ref)):
            if cout != c and fname != "conv3d":
                continue
            ms = chained_ms(fn, x)
            tfps = flops / (ms * 1e-3) / 1e12
            scale = 3 if "ref" in fname else 1
            print(f"  {fname:24s} {ms:7.1f} ms  {tfps * scale:6.1f} TF/s-equiv"
                  f"  ({tfps * scale / 197 * 100:4.1f}% peak)", flush=True)


if __name__ == "__main__":
    main()
