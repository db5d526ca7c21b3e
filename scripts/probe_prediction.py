#!/usr/bin/env python
"""Bisect the prediction-path TPU worker crash, level 2.

probe_batch2.py cleared the batch-2 flash kernel and the batch-2 int8+w8a8
DiT forward. This probe runs the REAL pipeline prediction path (image encode,
raymap pack, CFG-batched denoise scan, tiled decode) at increasing step
counts with a fence between stages, to separate
  (a) pipeline-composition faults (fails even at 1 step) from
  (b) queue-depth / long-scan faults (fails only at high step counts).

Run ON the TPU: python scripts/probe_prediction.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(f"[probe2] {time.strftime('%H:%M:%S')} {msg}", flush=True)


def main():
    from aether_tpu.apps.actions import action_raymap
    from aether_tpu.config import PipelineConfig
    from aether_tpu.models import init_vae_params
    from aether_tpu.models.dit import init_quantized_dit_params
    from aether_tpu.pipeline import AetherPipeline
    from aether_tpu.utils.profiling import warm_transfer_channel

    log("warming channel")
    log(f"warm {warm_transfer_channel():.1f}s")

    cfg = PipelineConfig.aetherv1()
    key = jax.random.PRNGKey(0)
    log("init int8 params")
    dit_params = init_quantized_dit_params(key, cfg.dit, dtype=jnp.int8)
    vae_params = init_vae_params(jax.random.fold_in(key, 1), cfg.vae,
                                 dtype=jnp.bfloat16)
    jax.block_until_ready(dit_params)
    text = np.zeros((1, cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim),
                    np.float32)
    pipe = AetherPipeline(cfg, dit_params, vae_params, text,
                          compute_dtype=jnp.bfloat16, act_quant=True)

    rng = np.random.default_rng(42)
    image = (rng.uniform(0, 1, (480, 720, 3)) * 255).astype(np.uint8)
    raymap = action_raymap("forward", num_frames=41, height=480, width=720)

    for steps in (1, 4, 12, 50):
        log(f"START prediction {steps} steps")
        t0 = time.time()
        out = pipe(task="prediction", image=image, raymap=raymap, height=480,
                   width=720, num_frames=41, num_inference_steps=steps,
                   fps=12, seed=42)
        log(f"OK    prediction {steps} steps in {time.time() - t0:.1f}s "
            f"(disp mean {float(np.mean(out.disparity)):.4f})")

    log("ALL PREDICTION PROBES PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
