#!/usr/bin/env python
"""Quantization quality gate at the FULL model config (VERDICT round 1, item 9).

One denoise-step DiT forward at 42L x 3072d x 48h on the real 41f x 480p
window (15 076 tokens), random weights, comparing the deployment quantization
modes against the bf16 reference output:

    bf16  (reference)        vs  fp8 weight-only
                             vs  int8 weight-only
                             vs  int8 w8a8 (AETHER_ACT_QUANT path)

The SAME bf16 weight tree (deterministic PRNG re-init) feeds every mode, so
differences measure quantization error alone. Prints one JSON line with cosine
similarity / max-rel-diff per mode; numbers are recorded in BASELINE.md to
justify the perf-default weight format.

Run ON the TPU (this allocates the 10.4 GB bf16 tree — nothing else may share
the chip): python scripts/quant_quality_gate.py
"""

import gc
import json
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
    print(f"[gate] {msg}", file=sys.stderr, flush=True)


def main():
    from aether_tpu.config import DiTConfig
    from aether_tpu.models.dit import (
        dit_forward,
        init_dit_params,
        quantize_dit_params,
    )
    from aether_tpu.models.rope import prepare_rotary_positional_embeddings
    from aether_tpu.utils.profiling import warm_transfer_channel

    cfg = DiTConfig.aetherv1()
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    if on_tpu:
        log("warming transfer channel")
        log(f"warm in {warm_transfer_channel():.1f}s")
        height, width, num_frames = 480, 720, 41
    else:
        # CPU smoke: tiny config proves the flow end to end
        cfg = DiTConfig.tiny()
        height, width, num_frames = 64, 96, 17

    f_lat = (num_frames - 1) // 4 + 1
    key_w = jax.random.PRNGKey(0)
    key_x = jax.random.PRNGKey(1)
    hidden = jax.random.normal(
        key_x, (1, f_lat, cfg.in_channels, height // 8, width // 8), dtype)
    text = jax.random.normal(
        jax.random.fold_in(key_x, 1),
        (1, cfg.max_text_seq_length, cfg.text_embed_dim), dtype)
    t = jnp.array([999], jnp.int32)
    cos, sin = prepare_rotary_positional_embeddings(
        cfg, height, width, f_lat, fps=12)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    attn = "flash" if on_tpu else "xla"

    def forward(params, act_quant=False, qk_int8=False, pv_int8=False):
        out = dit_forward(params, cfg, hidden, text, t, cos, sin,
                          attn_impl=attn, act_quant=act_quant,
                          qk_int8=qk_int8, pv_int8=pv_int8)
        host = np.asarray(out, np.float32).ravel()
        return host

    def fresh_bf16():
        params = init_dit_params(key_w, cfg, dtype=dtype)
        jax.block_until_ready(params)
        return params

    t0 = time.time()
    log("bf16 tree + forward")
    params = fresh_bf16()
    ref = forward(params)
    log(f"bf16 done in {time.time() - t0:.0f}s")

    results = {}

    def compare(name, out):
        cos_sim = float(np.dot(ref, out)
                        / (np.linalg.norm(ref) * np.linalg.norm(out) + 1e-12))
        denom = np.maximum(np.abs(ref), 1e-3)
        results[name] = {
            "cosine": round(cos_sim, 6),
            "max_rel_diff": round(float(np.max(np.abs(out - ref) / denom)), 4),
            "rms_rel": round(float(np.sqrt(np.mean(((out - ref) / denom) ** 2))),
                             5),
        }
        log(f"{name}: {results[name]}")

    log("quantize -> fp8 (in-place, frees bf16 leaves progressively)")
    params = quantize_dit_params(params, dtype=jnp.float8_e4m3fn)
    compare("fp8_weight_only", forward(params))
    del params
    gc.collect()

    log("re-init bf16 (same PRNG) -> int8")
    params = quantize_dit_params(fresh_bf16(), dtype=jnp.int8)
    compare("int8_weight_only", forward(params))
    compare("int8_w8a8", forward(params, act_quant=True))
    # int8 QK^T attention on top of the deployment int8 w8a8 mode (the
    # candidate full-int8 default; flash-only, so CPU smoke skips it)
    if on_tpu:
        compare("int8_w8a8_qk8", forward(params, act_quant=True,
                                         qk_int8=True))
        # full-int8 attention cell (int8 QK^T + int8 softmax weights on PV)
        compare("int8_w8a8_qk8_pv8", forward(params, act_quant=True,
                                             qk_int8=True, pv_int8=True))
    del params
    gc.collect()

    print(json.dumps({
        "gate": "quant_quality_one_denoise_step",
        "config": f"{cfg.num_layers}L x {cfg.hidden_size}d, "
                  f"{num_frames}f x {height}x{width}",
        "backend": jax.default_backend(),
        "modes": results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
