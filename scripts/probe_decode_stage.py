#!/usr/bin/env python
"""Time the REAL pipeline decode stage on-chip, separating compute from wire.

probe_decode_memory measured a warm 32x90-latent strip decode at ~4 ms —
three orders under the ~3.6 s vae_decode stage in bench.py. This probe runs
the full 60x90 tiled decode (rgb + disparity, exactly the pipeline's stage-3
calls) and times (a) pure device compute (block_until_ready, no pulls) and
(b) compute + the u8/fp16 wire pulls, to attribute the stage to link vs MXU.
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


def main():
    from aether_tpu.config import PipelineConfig
    from aether_tpu.models.vae import init_vae_params
    from aether_tpu.pipeline import aether as pl

    cfg = PipelineConfig.aetherv1()
    vae_params = init_vae_params(jax.random.PRNGKey(1), cfg.vae)
    jax.block_until_ready(vae_params)

    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 11, 16, 60, 90),
                            jnp.bfloat16)
    dtype = jnp.bfloat16

    def decode_both():
        rgb = pl._decode_pixels_tiled(cfg, dtype, vae_params, lat)
        disp = pl._decode_pixels_tiled(cfg, dtype, vae_params, lat)
        return rgb, disp

    # warm/compile
    r, d = decode_both()
    jax.block_until_ready((r, d))
    print(json.dumps({"rgb_shape": list(r.shape),
                      "rgb_mean": float(jnp.mean(r.astype(jnp.float32)))}),
          flush=True)

    for name, pull in [("compute_only", False), ("with_wire", True)]:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r, d = decode_both()
            if pull:
                packed = pl._finish_rgb(r, "u8")
                rgb_np = np.asarray(packed[0][0])
                disp16 = pl._finish_disparity(d, "fp16")
                disp_np = np.asarray(disp16[0])
            else:
                # scalar fence: block_until_ready can return early on the
                # tunneled backend (see scripts/bench_attention.py)
                float(jnp.mean(r.astype(jnp.float32)))
                float(jnp.mean(d.astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"variant": name,
                          "s": round(float(np.median(ts)), 3),
                          "runs": [round(t, 3) for t in ts]}), flush=True)


if __name__ == "__main__":
    main()
