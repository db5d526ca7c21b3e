#!/usr/bin/env python
"""On-chip CFG-prefix-skip A/B for the 50-step prediction task (round 5).

Measures pred e2e + output fidelity of AETHER_CFG_SKIP_TOL against the exact
CFG pair at the shipping config (int8+a8, exact wires). Same seed both ways —
the only delta is the skipped uncond stream. Prints one JSON line."""
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


def cos_sim(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def main():
    from aether_tpu.config import PipelineConfig
    from aether_tpu.models import init_vae_params
    from aether_tpu.models.dit import init_quantized_dit_params
    from aether_tpu.apps.actions import action_raymap
    from aether_tpu.pipeline import AetherPipeline
    from aether_tpu.utils.profiling import warm_transfer_channel

    print(f"[cfg_skip] channel warm {warm_transfer_channel():.1f}s",
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
    rng = np.random.default_rng(42)
    image = (rng.uniform(0, 1, (480, 720, 3)) * 255).astype(np.uint8)
    raymap = action_raymap("forward", num_frames=41, height=480, width=720)
    kwargs = dict(task="prediction", image=image, raymap=raymap, height=480,
                  width=720, num_frames=41, num_inference_steps=50, fps=12,
                  seed=42)

    results = {}
    outputs = {}
    for tol in (None, "1e-3", "1e-2"):
        tag = "exact" if tol is None else f"tol{tol}"
        if tol is None:
            os.environ.pop("AETHER_CFG_SKIP_TOL", None)
        else:
            os.environ["AETHER_CFG_SKIP_TOL"] = tol
        print(f"[cfg_skip] {tag}: warmup", file=sys.stderr, flush=True)
        pipe(**kwargs)
        print(f"[cfg_skip] {tag}: timed", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        out = pipe(**kwargs)
        dt = time.perf_counter() - t0
        outputs[tag] = out
        results[tag] = {"e2e_s": round(dt, 1)}
        if tol is not None:
            ref = outputs["exact"]
            results[tag]["rgb_cos"] = round(cos_sim(out.rgb, ref.rgb), 6)
            results[tag]["disp_cos"] = round(
                cos_sim(out.disparity, ref.disparity), 6)
            results[tag]["raymap_cos"] = round(
                cos_sim(out.raymap, ref.raymap), 6)
            results[tag]["rgb_max_u8_delta"] = int(np.max(np.abs(
                np.asarray(out.rgb, np.int16)
                - np.asarray(ref.rgb, np.int16))))
        print(f"[cfg_skip] {tag}: {results[tag]}", file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
