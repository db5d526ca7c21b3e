#!/usr/bin/env python
"""FULL-SIZE converter dress rehearsal (VERDICT r3 #3, second half).

The tiny-config rehearsal (tests/test_io.py::test_convert_dress_rehearsal)
proves the flow; this proves it AT SIZE, where the risks actually live:
42-layer stacking at 3072 hidden, multi-shard safetensors merging on a
~22 GB state dict, int8 quantization of the stacked tree, and the
fused-qkv interleave on the loaded result.

Steps (CPU-only, ~125 GB host):
  1. synthetic HF-layout checkpoint at the FULL aetherv1 config
     (42L x 3072 DiT + full VAE), 4 transformer shards;
  2. ``python -m aether_tpu.io.convert --quantize int8``;
  3. reload via orbax and verify:
     - stacked shapes/dtypes of every block leaf family,
     - layer-17 q_w int8 payload+scales bit-match an independent
       ``quantize_dit_params`` of the torch slice,
     - fused [D, 3D] w8a8 qkv projection bit-matches the three unfused
       int8 matmuls on the loaded layer-0 leaves (fused path ON at size).

Prints one JSON line; numbers recorded in PARITY.md.

Usage: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/fullsize_convert_rehearsal.py [workdir]
"""

import json
import os
import pathlib
import shutil
import sys
import time

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))
sys.path.insert(0, str(_ROOT / "scripts"))


def log(msg):
    print(f"[rehearsal +{time.time() - T0:.0f}s] {msg}", file=sys.stderr,
          flush=True)


T0 = time.time()


def main():
    import numpy as np

    work = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else
                        "/tmp/fullsize_rehearsal")
    if work.exists():
        shutil.rmtree(work)
    work.mkdir(parents=True)

    from make_synthetic_checkpoint import write_synthetic_checkpoint

    log("writing synthetic aetherv1 checkpoint (42L x 3072, 4 shards)")
    tdir, vdir = write_synthetic_checkpoint(work / "hf", config="aetherv1",
                                            shards=4)
    sizes = {p.name: p.stat().st_size for p in
             pathlib.Path(tdir).glob("*.safetensors")}
    log(f"shards: {sizes}")

    from aether_tpu.io import convert

    out_dir = work / "converted"
    log("convert --quantize int8")
    convert.main(["--transformer", str(tdir), "--vae", str(vdir),
                  "--out", str(out_dir), "--config", "aetherv1",
                  "--quantize", "int8"])

    log("reload + verify")
    import jax
    import jax.numpy as jnp

    from aether_tpu.config import DiTConfig
    from aether_tpu.io.weights import load_checkpoint
    from aether_tpu.models.dit import (
        _linear,
        _qkv_fused_projection,
        quantize_dit_params,
    )

    cfg = DiTConfig.aetherv1()
    d, L = cfg.hidden_size, cfg.num_layers
    params = load_checkpoint(str(out_dir / "dit"))
    results = {"shards": len(sizes), "bytes_hf": sum(sizes.values())}

    blocks = params["blocks"]
    expect = {
        ("attn", "q_w"): (L, d, d), ("attn", "o_w"): (L, d, d),
        ("mlp", "w1"): (L, d, cfg.mlp_dim), ("mlp", "w2"): (L, cfg.mlp_dim, d),
        ("norm1", "w"): (L, cfg.time_embed_dim, 6 * d),
    }
    for (grp, leaf), shape in expect.items():
        node = blocks[grp][leaf]
        assert isinstance(node, dict) and node["q"].dtype == jnp.int8, (grp, leaf)
        assert node["q"].shape == shape, (grp, leaf, node["q"].shape)
        assert node["s"].shape == shape[:1] + shape[2:], (grp, leaf)
    results["stacked_shapes"] = "ok"

    # layer-17 q_w must bit-match an independent quantization of the same
    # torch slice (name-mapped + transposed exactly as the converter does)
    from safetensors.torch import load_file

    sd = {}
    for shard in sorted(pathlib.Path(tdir).glob("*.safetensors")):
        sd.update(load_file(str(shard)))
    w17 = np.asarray(
        sd["transformer_blocks.17.attn1.to_q.weight"].float().numpy()).T
    ref = quantize_dit_params({"q_w": jnp.asarray(w17)}, dtype=jnp.int8)["q_w"]
    got_q = np.asarray(blocks["attn"]["q_w"]["q"][17])
    got_s = np.asarray(blocks["attn"]["q_w"]["s"][17])
    assert np.array_equal(got_q, np.asarray(ref["q"])), "int8 payload mismatch"
    np.testing.assert_allclose(got_s, np.asarray(ref["s"]), rtol=0, atol=0)
    results["layer17_int8_bitmatch"] = "ok"

    # fused qkv on the loaded layer-0 leaves: bit-match the unfused path
    attn0 = jax.tree_util.tree_map(lambda x: x[0], blocks["attn"])
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 32, d)),
                    jnp.float32)
    fq, fk, fv = _qkv_fused_projection(x, attn0, a8=True)
    for fused, key_w, key_b, name in (
            (fq, "q_w", "q_b", "q"), (fk, "k_w", "k_b", "k"),
            (fv, "v_w", "v_b", "v")):
        unfused = _linear(x, attn0[key_w], attn0[key_b], True)
        assert np.array_equal(np.asarray(fused), np.asarray(unfused)), name
    results["fused_qkv_bitmatch_at_size"] = "ok"

    results["wall_s"] = round(time.time() - T0, 1)
    print(json.dumps({"rehearsal": "fullsize_convert", **results}))
    shutil.rmtree(work)
    return 0


if __name__ == "__main__":
    sys.exit(main())
