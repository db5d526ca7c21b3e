#!/usr/bin/env python
"""Op-level profile of one VAE decode chunk on-chip.

Decode is the largest single device-compute item after round 3 (7.36 s for
the RGB+disparity pair at 41f x 480p vs 8.4 s for the whole 4-step denoise),
and its FLOP count (~100 TFLOP/stream) says it runs far from the MXU peak.
This script traces one warm ``_decode_chunk`` with ``jax.profiler`` and
aggregates device-op durations programmatically via
``jax.profiler.ProfileData`` (no tensorboard on this machine), printing the
top ops and a convolution/norm/elementwise/copy split.

Usage: python scripts/profile_decode.py [trace_dir]
"""

import collections
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
    """Classify an HLO event by its OUTPUT op name (the text before ' = ').

    The event string embeds operand names too ('fusion(... %copy-done ...)'),
    so matching the whole string misfiles conv fusions whose operands mention
    copies — the first version of this classifier put 59% of decode time in
    'copy' that way. Anonymous '%fusion.N' ops are split by whether a conv
    weight ([kt,3,3,Ci,Co] / [3,3,Ci,Co]-shaped operand) feeds them: on TPU
    XLA names conv+elementwise output fusions plain 'fusion'."""
    head = name.split(" = ")[0].lower() if " = " in name else name.lower()
    if "conv" in head:
        return "conv"
    if "reduce" in head or "rsqrt" in head:
        return "norm-reduce"
    if ("copy" in head or "concatenate" in head or "slice" in head
            or "pad" in head or "transpose" in head):
        return "copy/concat/pad"
    if "fusion" in head:
        import re

        # 5-D DHWIO or 4-D HWIO conv-weight operand shapes
        if re.search(r"\[[1-4],[34],[34],\d+,\d+\]|\[[34],[34],\d+,\d+\]",
                     name):
            return "conv(fused)"
        return "fusion(elementwise)"
    if "dot" in head:
        return "matmul"
    return "other"


def main():
    from aether_tpu.config import PipelineConfig
    from aether_tpu.models import init_vae_params
    import aether_tpu.pipeline.aether as pipe_mod
    from aether_tpu.utils.profiling import warm_transfer_channel

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decode_trace"

    warm_transfer_channel()
    cfg = PipelineConfig.aetherv1()
    # simulate the bench's resident int8 DiT for the memgate so the profiled
    # decode takes the SHIPPING path (serial B=1 scan strips), not the
    # standalone-only stacked B=2 graph; SIM_RESIDENT_GB=0 profiles the
    # stacked graph instead
    sim_gb = float(os.environ.get("SIM_RESIDENT_GB", "5.61"))
    if sim_gb > 0:
        from aether_tpu.runtime import memgate

        memgate.register_resident("simulated_dit", int(sim_gb * 2**30))
    vae_params = init_vae_params(jax.random.PRNGKey(0), cfg.vae,
                                 dtype=jnp.bfloat16)
    for leaf in jax.tree.leaves(vae_params):
        leaf.block_until_ready()
    # the SHIPPING decode path: stacked rgb+disparity batch-2, spatially
    # tiled + 2-latent-frame chunks — what bench.py's vae_decode_s times.
    # (the un-tiled _decode_pixels at full 480p no longer fits beside the
    # remote staging reservations: deterministic RESOURCE_EXHAUSTED)
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 11, 16, 60, 90),
                            jnp.float32) * 0.7
    float(jnp.sum(lat[0, 0, 0, 0, :2]))  # real fence (tunnel)

    def run():
        return pipe_mod._decode_pixels_tiled(cfg, jnp.bfloat16, vae_params,
                                             lat)

    out = run()
    print("warm fence:", float(jnp.sum(out[..., :1].astype(jnp.float32))),
          flush=True)
    t0 = time.perf_counter()
    out = run()
    out.block_until_ready()
    print(f"warm decode (stacked rgb+disp, 41f x 480p): "
          f"{time.perf_counter() - t0:.2f} s", flush=True)

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
    print("\ntop 25 ops:")
    for k, v in per_op.most_common(25):
        print(f"  {v:9.1f} ms  {k[:110]}")


if __name__ == "__main__":
    main()
