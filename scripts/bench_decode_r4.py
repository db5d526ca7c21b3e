#!/usr/bin/env python
"""Round-4 decode measurements: frame-split GroupNorm + embedded-parity
upsample (one NHWC conv2d + depth-to-space, replacing the input-dilated conv
whose lowering was a pad/relayout storm — see models/vae.py).

Measures, on the real chip:
  A) batch-1 spatially-tiled decode (41f x 480p), 3 warm runs
  B) batch-2 stacked RGB+disparity tiled decode — the bench.py shipping path;
     reports compile-OOM if the stacked workspace no longer fits
  C) B again with AETHER_SCAN_DECODE=1 (one dispatch per strip)

Usage: python scripts/bench_decode_r4.py [a|b|c|abc]  (default abc)
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


def med3(fn):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn()
        out.block_until_ready()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), ts


def main():
    which = (sys.argv[1] if len(sys.argv) > 1 else "abc").lower()
    from aether_tpu.config import PipelineConfig
    from aether_tpu.models import init_vae_params
    import aether_tpu.pipeline.aether as pipe
    from aether_tpu.utils.profiling import warm_transfer_channel

    t0 = time.time()
    warm_transfer_channel()
    print(f"warm channel {time.time()-t0:.1f}s", flush=True)
    cfg = PipelineConfig.aetherv1()
    vae_params = init_vae_params(jax.random.PRNGKey(0), cfg.vae,
                                 dtype=jnp.bfloat16)
    for leaf in jax.tree.leaves(vae_params):
        leaf.block_until_ready()

    lat1 = jax.random.normal(jax.random.PRNGKey(1), (1, 11, 16, 60, 90),
                             jnp.float32) * 0.7
    lat2 = jnp.concatenate([lat1, lat1 * 0.9], axis=0)
    float(jnp.sum(lat2[0, 0, 0, 0, :2]))  # real fence through the tunnel

    if "a" in which:
        t0 = time.time()
        out = pipe._decode_pixels_tiled(cfg, jnp.bfloat16, vae_params, lat1)
        out.block_until_ready()
        print(f"A compile+first: {time.time()-t0:.1f}s", flush=True)
        m, ts = med3(lambda: pipe._decode_pixels_tiled(
            cfg, jnp.bfloat16, vae_params, lat1))
        print(f"A batch-1 tiled decode warm: {m:.3f}s  {ts}", flush=True)

    if "b" in which:
        try:
            t0 = time.time()
            out = pipe._decode_pixels_tiled(cfg, jnp.bfloat16, vae_params,
                                            lat2)
            out.block_until_ready()
            print(f"B compile+first: {time.time()-t0:.1f}s", flush=True)
            m, ts = med3(lambda: pipe._decode_pixels_tiled(
                cfg, jnp.bfloat16, vae_params, lat2))
            print(f"B batch-2 stacked tiled decode warm: {m:.3f}s  {ts}",
                  flush=True)
        except jax.errors.JaxRuntimeError as exc:
            if pipe._is_oom_error(exc):
                print(f"B batch-2 stacked decode: COMPILE OOM "
                      f"({str(exc)[:200]})", flush=True)
            else:
                raise

    if "c" in which:
        os.environ["AETHER_SCAN_DECODE"] = "1"
        try:
            t0 = time.time()
            out = pipe._decode_pixels_tiled(cfg, jnp.bfloat16, vae_params,
                                            lat2)
            out.block_until_ready()
            print(f"C compile+first (scan): {time.time()-t0:.1f}s",
                  flush=True)
            m, ts = med3(lambda: pipe._decode_pixels_tiled(
                cfg, jnp.bfloat16, vae_params, lat2))
            print(f"C batch-2 scan-decode warm: {m:.3f}s  {ts}", flush=True)
        except jax.errors.JaxRuntimeError as exc:
            if pipe._is_oom_error(exc):
                print(f"C scan decode: COMPILE OOM ({str(exc)[:200]})",
                      flush=True)
            else:
                raise
        finally:
            os.environ.pop("AETHER_SCAN_DECODE", None)


if __name__ == "__main__":
    main()
