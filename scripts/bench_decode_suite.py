#!/usr/bin/env python
"""Round-4 decode/encode measurement suite (T-major trunk).

One TPU process, sequential: host-loop tiled decode (batch 1 and stacked
batch 2), scanned strip decode (with the automatic host-loop fallback),
tiled encode. Prints one labeled line per measurement; run
scripts/profile_decode.py separately for the op split.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, n=3):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts)), [round(t, 3) for t in ts]


def main():
    from aether_tpu.config import PipelineConfig
    from aether_tpu.models import init_vae_params
    from aether_tpu.pipeline import aether as pl
    from aether_tpu.utils.profiling import warm_transfer_channel

    t0 = time.perf_counter()
    warm_transfer_channel()
    print(f"warm_transfer: {time.perf_counter()-t0:.1f} s", flush=True)

    cfg = PipelineConfig.aetherv1()
    dtype = jnp.bfloat16
    vae_params = init_vae_params(jax.random.PRNGKey(0), cfg.vae, dtype=dtype)
    jax.block_until_ready(vae_params)

    lat1 = jax.random.normal(jax.random.PRNGKey(3), (1, 11, 16, 60, 90),
                             dtype) * 0.7
    lat2 = jnp.concatenate([lat1, lat1], axis=0)

    for scan in (False, True):
        os.environ["AETHER_SCAN_DECODE"] = "1" if scan else "0"
        pl._SCAN_DECODE_STATE["ok"] = None
        tag = "scan" if scan else "loop"
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(
                pl._decode_pixels_tiled(cfg, dtype, vae_params, lat1))
            print(f"decode[{tag}] b1 compile+first: "
                  f"{time.perf_counter()-t0:.1f} s", flush=True)
            best, ts = timeit(
                lambda: pl._decode_pixels_tiled(cfg, dtype, vae_params, lat1))
            print(f"decode[{tag}] b1 warm: {best:.3f} s {ts}", flush=True)
        except Exception as e:
            print(f"decode[{tag}] b1 FAILED: {str(e)[:200]}", flush=True)
            continue
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(
                pl._decode_pixels_tiled(cfg, dtype, vae_params, lat2))
            print(f"decode[{tag}] b2 compile+first: "
                  f"{time.perf_counter()-t0:.1f} s", flush=True)
            best, ts = timeit(
                lambda: pl._decode_pixels_tiled(cfg, dtype, vae_params, lat2))
            print(f"decode[{tag}] b2 stacked warm: {best:.3f} s {ts}",
                  flush=True)
        except Exception as e:
            print(f"decode[{tag}] b2 FAILED: {str(e)[:200]}", flush=True)

    os.environ.pop("AETHER_SCAN_DECODE", None)
    frames = jax.random.uniform(jax.random.PRNGKey(5), (41, 480, 720, 3),
                                dtype, -1, 1)
    k = jax.random.PRNGKey(7)
    try:
        t0 = time.perf_counter()
        jax.block_until_ready(
            pl._encode_pixels_tiled(cfg, dtype, vae_params, frames, k))
        print(f"encode tiled compile+first: {time.perf_counter()-t0:.1f} s",
              flush=True)
        best, ts = timeit(
            lambda: pl._encode_pixels_tiled(cfg, dtype, vae_params, frames, k))
        print(f"encode tiled warm: {best:.3f} s {ts}", flush=True)
    except Exception as e:
        print(f"encode FAILED: {str(e)[:200]}", flush=True)



    # LAST: a full-frame OOM can wedge the tunneled runtime, so nothing runs
    # after this block
    # untiled full-frame chunked decode: no 64/60-row strip redundancy, no
    # per-strip cache duplication — worth shipping if the leaner T-major
    # trunk fits its 1.9x-taller chunk workspace
    for scan in (False,):
        os.environ["AETHER_SCAN_DECODE"] = "1" if scan else "0"
        pl._SCAN_DECODE_STATE["ok"] = None
        tag = "scan" if scan else "loop"
        for b, lat in (("b1", lat1), ("b2", lat2)):
            try:
                t0 = time.perf_counter()
                jax.block_until_ready(
                    pl._decode_pixels(cfg, dtype, vae_params, lat))
                print(f"decode-untiled[{tag}] {b} compile+first: "
                      f"{time.perf_counter()-t0:.1f} s", flush=True)
                best, ts = timeit(
                    lambda: pl._decode_pixels(cfg, dtype, vae_params, lat))
                print(f"decode-untiled[{tag}] {b} warm: {best:.3f} s {ts}",
                      flush=True)
            except Exception as e:
                print(f"decode-untiled[{tag}] {b} FAILED: {str(e)[:200]}",
                      flush=True)



if __name__ == "__main__":
    main()
