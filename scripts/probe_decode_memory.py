#!/usr/bin/env python
"""On-chip probe: device memory_stats availability + full-strip decode cost.

Measures (a) whether the runtime exposes ``Device.memory_stats()`` (the
gate a safe-by-default full-strip decode needs: predict the workspace fits
instead of catching an OOM the tunneled runtime can't survive), (b) peak
bytes for the chunked vs whole-clip strip decode at the deployment 41f x
480p shape WITH the quantized DiT resident (the real contention), and (c)
their wall-clock. Numbers feed the AETHER_FULL_STRIP_DECODE auto gate.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def stats():
    try:
        s = jax.local_devices()[0].memory_stats()
        if not s:
            return None
        return {k: s[k] for k in ("bytes_in_use", "peak_bytes_in_use",
                                  "bytes_limit") if k in s}
    except Exception as e:
        print(f"memory_stats unavailable: {e!r}", flush=True)
        return None


def main():
    from aether_tpu.config import DiTConfig, PipelineConfig
    from aether_tpu.models.dit import init_quantized_dit_params
    from aether_tpu.models.vae import init_vae_params
    from aether_tpu.pipeline import aether as pl

    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "stats_at_start": stats()}), flush=True)

    cfg = PipelineConfig.aetherv1()
    dit = init_quantized_dit_params(jax.random.PRNGKey(0),
                                    DiTConfig.aetherv1())
    jax.block_until_ready(dit)
    vae_params = init_vae_params(jax.random.PRNGKey(1), cfg.vae)
    jax.block_until_ready(vae_params)
    print(json.dumps({"stats_with_models": stats()}), flush=True)

    # one 32x90-latent strip of the 41f x 480p window (the tiled decode's
    # unit of work: 60x90 splits into two 32-row strips)
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 11, 16, 32, 90),
                            jnp.bfloat16)

    # scalar-fence timing: on the tunneled backend block_until_ready can
    # return before remote execution completes (see scripts/bench_attention.py)
    fence = jax.jit(lambda x: jnp.mean(x.astype(jnp.float32)))
    for name, fbs in [("chunk2", 2), ("full_strip", None)]:
        t0 = time.perf_counter()
        out = pl._decode_pixels(cfg, jnp.bfloat16, vae_params, lat, fbs)
        float(fence(out))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = pl._decode_pixels(cfg, jnp.bfloat16, vae_params, lat, fbs)
            float(fence(out))
            ts.append(time.perf_counter() - t0)
        del out
        print(json.dumps({"variant": name, "s": round(float(np.median(ts)), 3),
                          "compile_s": round(compile_s, 1),
                          "stats_after": stats()}), flush=True)


if __name__ == "__main__":
    main()
