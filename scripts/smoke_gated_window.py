#!/usr/bin/env python
"""Round-5 on-chip smoke: one 41f x 480p reconstruction window through the
memgate-guarded pipeline at bench defaults (int8+a8 DiT resident).

Validates that decode-graph selection happens from compile analysis (watch
[memgate] lines on stderr) and that the chosen path completes without ever
risking an allocation failure. Prints one JSON line with stage timings."""
import json
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


def main():
    from aether_tpu.config import PipelineConfig
    from aether_tpu.models import init_vae_params
    from aether_tpu.models.dit import init_quantized_dit_params
    from aether_tpu.pipeline import AetherPipeline
    from aether_tpu.runtime import memgate
    from aether_tpu.utils.profiling import warm_transfer_channel

    t0 = time.perf_counter()
    print(f"[smoke] channel warm in {warm_transfer_channel():.1f}s",
          file=sys.stderr, flush=True)
    cfg = PipelineConfig.aetherv1()
    key = jax.random.PRNGKey(0)
    dit_params = init_quantized_dit_params(key, cfg.dit, dtype=jnp.int8)
    vae_params = init_vae_params(jax.random.fold_in(key, 1), cfg.vae,
                                 dtype=jnp.bfloat16)
    jax.block_until_ready(dit_params)
    text = np.zeros((1, cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim),
                    np.float32)
    pipe = AetherPipeline(cfg, dit_params, vae_params, text,
                          compute_dtype=jnp.bfloat16, act_quant=True)
    print(f"[smoke] params ready ({time.perf_counter()-t0:.1f}s); resident "
          f"{memgate.resident_bytes()/2**30:.2f} GB, budget "
          f"{memgate.budget_bytes()/2**30:.2f} GB", file=sys.stderr, flush=True)

    rng = np.random.default_rng(42)
    video = (rng.uniform(0, 1, (41, 480, 720, 3)) * 255).astype(np.uint8)
    t1 = time.perf_counter()
    out = pipe(task="reconstruction", video=video, height=480, width=720,
               num_frames=41, num_inference_steps=4, fps=12, seed=42)
    warm0 = time.perf_counter() - t1
    t2 = time.perf_counter()
    out = pipe(task="reconstruction", video=video, height=480, width=720,
               num_frames=41, num_inference_steps=4, fps=12, seed=42)
    warm1 = time.perf_counter() - t2
    print(json.dumps({
        "ok": True, "first_run_s": round(warm0, 1), "warm_e2e_s": round(warm1, 1),
        "rgb_shape": list(np.asarray(out.rgb).shape),
        "resident_gb": round(memgate.resident_bytes() / 2**30, 2),
    }))


if __name__ == "__main__":
    main()
