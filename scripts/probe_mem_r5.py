#!/usr/bin/env python
"""Round-5 compile-only memory probe for the decode graph variants.

AOT-lowers and compiles (NEVER executes) each decode variant the pipeline can
pick, and prints the compiler's memory analysis (temp/argument/output bytes).
On the tunneled runtime an allocation failure wedges the chip permanently
(BASELINE.md round 1), so execution decisions must be made from these numbers
BEFORE any graph runs — this probe is the data source for that gate.

Compile-only is safe: XLA memory assignment happens in the compile service and
allocates no HBM. Run in a child process anyway.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def tree_bytes(tree):
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


def ma_dict(ma, compile_s):
    return {
        "temp_gb": round(ma.temp_size_in_bytes / 2**30, 3),
        "arg_gb": round(ma.argument_size_in_bytes / 2**30, 3),
        "out_gb": round(ma.output_size_in_bytes / 2**30, 3),
        "alias_gb": round(ma.alias_size_in_bytes / 2**30, 3),
        "compile_s": round(compile_s, 1),
    }


def main():
    from aether_tpu.config import PipelineConfig
    from aether_tpu.models import init_vae_params
    from aether_tpu.pipeline.aether import (
        _decode_chunk, _decode_scanned, _decode_full, _encode_full,
        _encode_chunk,
    )

    cfg = PipelineConfig.aetherv1()
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(1)
    # abstract params: lowering needs shapes/dtypes only — zero HBM
    vae_params = jax.eval_shape(lambda k: init_vae_params(k, cfg.vae, dtype=dtype), key)

    results = {"backend": jax.default_backend(),
               "conv2d_lower": os.environ.get("AETHER_CONV2D_LOWER", "1"),
               "vae_params_gb": round(tree_bytes(vae_params) / 2**30, 3)}

    B = int(os.environ.get("PROBE_B", "2"))  # stacked rgb+disparity default
    T, C, H, W = 11, 16, 60, 90
    z = jax.ShapeDtypeStruct((B, T, H, W, C), dtype)

    def compile_probe(name, fn, *args, **static):
        t0 = time.perf_counter()
        try:
            c = fn.lower(*args, **static).compile()
            results[name] = ma_dict(c.memory_analysis(), time.perf_counter() - t0)
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}",
                             "compile_s": round(time.perf_counter() - t0, 1)}
        print(f"[probe] {name}: {results[name]}", file=sys.stderr, flush=True)

    # host-loop chunk decode: first chunk (3 latent frames, no cache)
    z3 = jax.ShapeDtypeStruct((B, 3, H, W, C), dtype)
    compile_probe("chunk_first_b%d" % B, _decode_chunk, cfg, dtype, vae_params, z3, None)
    # steady chunk (2 latent frames + cache): get the cache avals from the first
    from aether_tpu.models.vae import decode_frames
    _, cache_aval = jax.eval_shape(
        lambda p, x: decode_frames(p, cfg.vae, x, None), vae_params, z3)
    z2 = jax.ShapeDtypeStruct((B, 2, H, W, C), dtype)
    compile_probe("chunk_steady_b%d" % B, _decode_chunk, cfg, dtype, vae_params, z2, cache_aval)
    # whole-strip scan decode (the round-4 default that OOM'd)
    compile_probe("scan_fb2_b%d" % B, _decode_scanned, cfg, dtype, vae_params, z, 2)
    # whole-clip decode (opt-in)
    compile_probe("full_b%d" % B, _decode_full, cfg, dtype, vae_params, z)

    # encode graphs at the shipping strip shape (41f x 480x720 full-width strip)
    vids = jax.ShapeDtypeStruct((1, 41, 256, 720, 3), dtype)  # tile strip h=256px
    compile_probe("encode_full_strip", _encode_full, cfg, dtype, vae_params, vids)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
