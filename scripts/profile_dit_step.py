#!/usr/bin/env python
"""Op-level profile of one DiT forward (a denoise step's compute) on-chip.

The denoise step is the dominant item in both headline latencies: 4x in the
23 s reconstruction window, 100x (50 steps x CFG pair) in the ~213 s
prediction. Component accounting (BASELINE.md round-3) explains ~2.0 s of the
~2.1-2.2 s step: 42 x 27.2 ms flash kernel + 42 x 3.3 ms prologue + ~0.74 s
linears/elementwise. This traces one warm forward with ``jax.profiler`` and
aggregates device-op durations via ``jax.profiler.ProfileData`` (no
tensorboard on this machine) to find where the residual ~0.15-0.2 s hides —
epilogue transposes, quant-stat reductions, adaLN glue, or kernel-adjacent
relayouts.

Usage: python scripts/profile_dit_step.py [trace_dir]
Reference counterpart: all denoise FLOPs at
``aether/pipelines/aetherv1_pipeline_cogvideox.py:865-875``.
"""

import collections
import functools
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def classify(name: str) -> str:
    """Classify an HLO event by its OUTPUT op name (text before ' = ') —
    matching the whole string misfiles fusions whose *operands* mention
    copies (see scripts/profile_decode.py, same lesson)."""
    head = name.split(" = ")[0].lower() if " = " in name else name.lower()
    low = name.lower()
    if "custom-call" in head or "custom_call" in head:
        if "prologue" in low or "qkv" in low:
            return "pallas:prologue"
        return "pallas:flash"
    if "dot" in head:
        return "matmul"
    if "conv" in head:
        return "conv"
    if "reduce" in head:
        return "reduce(stats)"
    if ("copy" in head or "transpose" in head or "concatenate" in head
            or "slice" in head or "pad" in head or "bitcast" in head
            or "reshape" in head):
        return "copy/transpose"
    if "fusion" in head:
        return "fusion(elementwise)"
    return "other"


def main():
    from aether_tpu.config import DiTConfig
    from aether_tpu.models.dit import dit_forward, init_quantized_dit_params
    from aether_tpu.models.rope import prepare_rotary_positional_embeddings
    from aether_tpu.utils.profiling import warm_transfer_channel

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dit_trace"

    warm_transfer_channel()
    cfg = DiTConfig.aetherv1()
    height, width, num_frames = 480, 720, 41
    f_lat = (num_frames - 1) // 4 + 1

    params = init_quantized_dit_params(jax.random.PRNGKey(0), cfg)
    hidden = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, f_lat, cfg.in_channels, height // 8, width // 8), jnp.bfloat16)
    text = jax.random.normal(
        jax.random.PRNGKey(2),
        (1, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.bfloat16)
    timestep = jnp.array([999], jnp.int32)
    cos, sin = prepare_rotary_positional_embeddings(cfg, height, width, f_lat,
                                                    fps=12)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    fn = jax.jit(functools.partial(dit_forward, cfg=cfg, attn_impl="flash"))

    def run():
        return fn(params, hidden_states=hidden, encoder_hidden_states=text,
                  timestep=timestep, rope_cos=cos, rope_sin=sin)

    out = run()
    out.block_until_ready()
    t0 = time.perf_counter()
    out = run()
    out.block_until_ready()
    print(f"warm forward: {(time.perf_counter() - t0) * 1e3:.0f} ms",
          flush=True)

    with jax.profiler.trace(trace_dir):
        out = run()
        out.block_until_ready()

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    print("trace files:", paths, flush=True)
    data = jax.profiler.ProfileData.from_file(paths[-1])
    per_op = collections.Counter()
    per_class = collections.Counter()
    total = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Op" not in line.name and "Ops" not in line.name \
                    and "op" not in line.name.lower():
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                per_op[ev.name] += dur
                per_class[classify(ev.name)] += dur
                total += dur
    print(f"\ntotal traced op time: {total:.1f} ms")
    print("\nby class:")
    for k, v in per_class.most_common():
        print(f"  {k:22s} {v:9.1f} ms  ({100*v/max(total,1e-9):4.1f}%)")
    print("\ntop 30 ops:")
    for k, v in per_op.most_common(30):
        print(f"  {v:9.1f} ms  {k[:130]}")


if __name__ == "__main__":
    main()
