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


def make_structured(params, cfg, key):
    """Impose trained-transformer structure on the i.i.d. init (VERDICT r3 #4).

    i.i.d. Gaussian weights are the EASY case for per-column int8 scales; real
    checkpoints fail quantization through three structures this reproduces
    deterministically (same key -> same tree for every mode):

    1. heavy-tailed elementwise spectrum — every quantized weight is
       multiplied by exp(0.5 * z) (lognormal, excess kurtosis ~5) plus a
       sparse 1% of elements scaled 8x, so a column's absmax is set by rare
       spikes and the bulk of the column gets crushed into few int8 codes;
    2. 20-50x outlier OUTPUT columns (8 per matrix) — stress the per-column
       scale path end to end;
    3. emergent residual-stream outlier dims (the LLM.int8() failure mode):
       6 fixed hidden channels amplified 30x in every projection WRITING the
       residual stream (patch/text embed, attention out, mlp w2), so the
       activations entering every downstream matmul carry huge channels and
       the per-TOKEN absmax activation quantization of the w8a8 path loses
       most of its codebook on the non-outlier channels.

    Mutates leaf-by-leaf (the bf16 tree is 10.4 GB; a functional map would
    double it past the HBM cliff).
    """
    from aether_tpu.models.dit import _QUANT_WEIGHT_KEYS

    d = cfg.hidden_size
    outlier_dims = jax.random.choice(
        jax.random.fold_in(key, 0), d, (6,), replace=False)
    writes_residual = {"o_w", "w2", "proj_w", "text_w"}
    counter = [1]

    def structure_leaf(w, name):
        k = jax.random.fold_in(key, counter[0])
        counter[0] += 1
        wf = w.astype(jnp.float32)
        # lognormal elementwise heavy tail + sparse 8x spikes
        z = jax.random.normal(jax.random.fold_in(k, 0), wf.shape)
        spikes = jax.random.bernoulli(jax.random.fold_in(k, 1), 0.01, wf.shape)
        wf = wf * jnp.exp(0.5 * z) * jnp.where(spikes, 8.0, 1.0)
        # 8 outlier output columns at 20-50x
        cols = jax.random.choice(jax.random.fold_in(k, 2), wf.shape[-1], (8,),
                                 replace=False)
        mags = jax.random.uniform(jax.random.fold_in(k, 3), (8,), None, 20., 50.)
        colscale = jnp.ones((wf.shape[-1],)).at[cols].set(mags)
        wf = wf * colscale
        # residual-stream outlier channels
        if name in writes_residual and wf.shape[-1] == d:
            wf = wf * jnp.ones((d,)).at[outlier_dims].set(30.0)
        out = wf.astype(w.dtype)
        out.block_until_ready()
        return out

    def walk(node):
        if isinstance(node, dict):
            for name, value in node.items():
                if name in _QUANT_WEIGHT_KEYS and getattr(value, "ndim", 0) >= 2:
                    node[name] = structure_leaf(value, name)
                else:
                    walk(value)
        elif isinstance(node, (list, tuple)):
            for item in node:
                walk(item)

    walk(params)
    return params


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

    structured = "--structured" in sys.argv

    def fresh_bf16():
        params = init_dit_params(key_w, cfg, dtype=dtype)
        jax.block_until_ready(params)
        if structured:
            params = make_structured(params, cfg, jax.random.PRNGKey(42))
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
        "weights": "structured" if structured else "iid",
        "backend": jax.default_backend(),
        "modes": results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
