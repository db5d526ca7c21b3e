#!/usr/bin/env python
"""Round-5 T-major trunk adjudication (VERDICT r4 #2): time the SAME decode
mode (serial B=1 scan strips — the shipping path) against an arbitrary
source tree, so the current T-major 4-D trunk can be A/B'd on-chip vs the
pre-T-major revision in a git worktree.

Usage: python scripts/bench_tmajor_ab.py <src_tree> [tag]
Prints one JSON line with warm serial-decode seconds."""
import json
import os
import sys
import time

SRC = os.path.abspath(sys.argv[1]) if len(sys.argv) > 1 else \
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TAG = sys.argv[2] if len(sys.argv) > 2 else os.path.basename(SRC)
sys.path.insert(0, SRC)

import jax
import jax.numpy as jnp

# per-tree compile cache (HLO differs anyway; keeps verdict files separate)
jax.config.update("jax_compilation_cache_dir", f"/tmp/ab_cache_{TAG}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from aether_tpu.config import PipelineConfig
    from aether_tpu.models import init_vae_params
    import aether_tpu.pipeline.aether as pipe_mod
    from aether_tpu.utils.profiling import warm_transfer_channel

    os.environ.setdefault("AETHER_SCAN_DECODE", "1")
    print(f"[ab:{TAG}] src={SRC}", file=sys.stderr, flush=True)
    print(f"[ab:{TAG}] channel warm {warm_transfer_channel():.1f}s",
          file=sys.stderr, flush=True)
    cfg = PipelineConfig.aetherv1()
    vae_params = init_vae_params(jax.random.PRNGKey(0), cfg.vae,
                                 dtype=jnp.bfloat16)
    jax.block_until_ready(vae_params)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 11, 16, 60, 90),
                            jnp.float32) * 0.7
    lat.block_until_ready()

    def serial_pair():
        # rgb + disparity as two B=1 tiled scans — the shipping decode
        a = pipe_mod._decode_pixels_tiled(cfg, jnp.bfloat16, vae_params, lat)
        a.block_until_ready()
        b = pipe_mod._decode_pixels_tiled(cfg, jnp.bfloat16, vae_params, lat)
        b.block_until_ready()
        return a

    t0 = time.perf_counter()
    serial_pair()
    warm0 = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        serial_pair()
        times.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"tag": TAG, "first_s": round(warm0, 1),
                      "serial_pair_s": sorted(times)[1], "runs": times}))


if __name__ == "__main__":
    main()
