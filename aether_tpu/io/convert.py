"""Checkpoint conversion CLI: HF safetensors -> aether-tpu runtime layout.

One-time offline conversion of the upstream checkpoints the reference loads at
``scripts/demo.py:206-228`` (AetherWorldModel/AetherV1 transformer +
THUDM/CogVideoX-5b-I2V vae/text_encoder/tokenizer) into the layout every app
here consumes via ``--checkpoint``:

    <out_dir>/dit/           orbax (stacked-block pytree, [in,out] weights)
    <out_dir>/vae/           orbax (DHWIO conv kernels)
    <out_dir>/text_embeds.npy  constant (226, 4096) empty-prompt T5 embedding

Usage:
    python -m aether_tpu.io.convert \
        --transformer /path/AetherV1/transformer \
        --vae /path/CogVideoX-5b-I2V/vae \
        --t5 /path/CogVideoX-5b-I2V/text_encoder_with_tokenizer \
        --out converted_ckpt [--quantize fp8]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from aether_tpu.config import DiTConfig, VAEConfig
from aether_tpu.io.weights import (
    compute_empty_prompt_embeds,
    convert_dit_state_dict,
    convert_vae_state_dict,
    load_hf_safetensors,
    save_checkpoint,
)


def _structural_template(dit_cfg: DiTConfig, quantize: str):
    """Expected (shape, dtype) tree of the converted DiT checkpoint, derived
    from the init functions so converter and runtime cannot drift apart."""
    import jax
    import jax.numpy as jnp

    from aether_tpu.models.dit import init_dit_params, init_quantized_dit_params

    key = jax.random.PRNGKey(0)
    if quantize == "none":
        return jax.eval_shape(lambda k: init_dit_params(k, dit_cfg), key)
    dtype = jnp.float8_e4m3fn if quantize == "fp8" else jnp.int8
    return jax.eval_shape(
        lambda k: init_quantized_dit_params(k, dit_cfg, dtype=dtype), key)


def verify_conversion(out_dir: str, dit_cfg: DiTConfig, quantize: str,
                      in_memory_dit=None, in_memory_vae=None,
                      expect_real_text: bool = False) -> dict:
    """Replay the converter rehearsal checks on a written checkpoint and
    return a manifest dict (VERDICT r4 #7: the real-weights one-shot must
    leave no judgment calls). Checks:

    1. orbax reload of dit/ and vae/ succeeds;
    2. the reloaded DiT tree structurally matches the runtime init template
       (same treedef, same leaf shapes; quantized payload dtypes exact) —
       what :mod:`aether_tpu.pipeline` will actually consume;
    3. when the converted trees are still in memory, reload bit-matches them
       (orbax roundtrip fidelity at full size);
    4. for int8: the fused [D, 3D] qkv projection assembled by the loader
       bit-matches the three unfused int8 blocks on layer 0;
    5. text_embeds.npy has shape (max_text_seq_length, text_embed_dim), is
       finite, and is non-zero when a T5 dir was supplied.
    """
    import jax
    import numpy as np

    from aether_tpu.io.weights import load_checkpoint

    checks: dict = {}
    manifest: dict = {"config": dit_cfg.__class__.__name__,
                      "quantize": quantize, "checks": checks}

    dit = load_checkpoint(os.path.join(out_dir, "dit"))
    vae = load_checkpoint(os.path.join(out_dir, "vae"))
    checks["reload"] = True

    template = _structural_template(dit_cfg, quantize)
    t_leaves, t_def = jax.tree_util.tree_flatten(template)
    g_leaves, g_def = jax.tree_util.tree_flatten(dit)
    if t_def != g_def:
        checks["dit_structure"] = f"treedef mismatch: {t_def} vs {g_def}"
    else:
        import jax.numpy as jnp

        quant_dtypes = (jnp.int8, jnp.float8_e4m3fn)
        bad = [
            (i, tuple(t.shape), str(t.dtype), tuple(g.shape), str(g.dtype))
            for i, (t, g) in enumerate(zip(t_leaves, g_leaves))
            if tuple(t.shape) != tuple(g.shape)
            # dtype is load-bearing only for the quantized payloads (the
            # runtime dequantizes by dtype); float leaves may legitimately
            # be f32 from conversion vs bf16 from random init
            or (t.dtype in quant_dtypes and t.dtype != g.dtype)
        ]
        checks["dit_structure"] = True if not bad else f"leaf mismatches: {bad[:5]}"

    leaf_summary = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(dit):
        leaf_summary[jax.tree_util.keystr(path)] = {
            "shape": list(np.shape(leaf)), "dtype": str(leaf.dtype),
            "nbytes": int(np.asarray(leaf).nbytes)}
    manifest["dit_leaves"] = len(leaf_summary)
    manifest["dit_bytes"] = int(sum(v["nbytes"] for v in leaf_summary.values()))
    manifest["vae_bytes"] = int(sum(
        np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(vae)))

    if in_memory_dit is not None:
        eq = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
            in_memory_dit, dit))
        checks["dit_roundtrip_bitexact"] = bool(eq)
    if in_memory_vae is not None:
        eq = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
            in_memory_vae, vae))
        checks["vae_roundtrip_bitexact"] = bool(eq)

    if quantize == "int8":
        try:
            checks["fused_qkv"] = _check_fused_qkv(dit, dit_cfg)
        except Exception as exc:  # surface, don't bury — this gates deploy
            checks["fused_qkv"] = f"{type(exc).__name__}: {exc}"

    text_path = os.path.join(out_dir, "text_embeds.npy")
    text = np.load(text_path)
    ok_shape = text.shape == (dit_cfg.max_text_seq_length, dit_cfg.text_embed_dim)
    ok_finite = bool(np.isfinite(text).all())
    nonzero = bool(np.abs(text).max() > 0)
    checks["text_embeds"] = (
        True if ok_shape and ok_finite and (nonzero or not expect_real_text)
        else f"shape_ok={ok_shape} finite={ok_finite} nonzero={nonzero}")

    manifest["ok"] = all(v is True for v in checks.values())
    return manifest


def _check_fused_qkv(dit, dit_cfg):
    """Layer-0 fused-qkv bit consistency on the loaded tree: the production
    fused [D, 3D] projection (``_qkv_fused_projection``, the deployment
    default) must bit-match the three unfused int8 matmuls — column blocks
    of a matmul are independent, so any mismatch means the interleave or the
    scale layout is wrong for THIS checkpoint (the rehearsal proved it for
    synthetic weights; this proves it for the real ones)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aether_tpu.models.dit import _linear, _qkv_fused_projection

    attn0 = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[0],
                                   dit["blocks"]["attn"])
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, dit_cfg.hidden_size),
                          jnp.float32)
    fq, fk, fv = _qkv_fused_projection(x, attn0, a8=False)
    for name_w, name_b, got in (("q_w", "q_b", fq), ("k_w", "k_b", fk),
                                ("v_w", "v_b", fv)):
        ref = _linear(x, attn0[name_w], attn0[name_b], False)
        if not np.array_equal(np.asarray(got), np.asarray(ref)):
            return f"fused projection mismatch on {name_w}"
    return True


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="convert HF checkpoints")
    p.add_argument("--transformer", required=True,
                   help="Dir with the DiT *.safetensors shards.")
    p.add_argument("--vae", required=True,
                   help="Dir with the VAE *.safetensors.")
    p.add_argument("--t5", default=None,
                   help="T5 encoder dir (tokenizer+model); omit to write "
                        "zero text embeddings.")
    p.add_argument("--out", required=True)
    p.add_argument("--quantize", choices=["none", "fp8", "int8"],
                   default="none",
                   help="Weight-only quantization of DiT matmul weights.")
    p.add_argument("--config", choices=["aetherv1", "tiny"], default="aetherv1",
                   help="Model topology of the source checkpoint.")
    p.add_argument("--verify", action="store_true",
                   help="After writing, reload the checkpoint, replay the "
                        "rehearsal checks (structure vs runtime template, "
                        "orbax bit-roundtrip, fused-qkv consistency, text "
                        "embeds sanity) and write <out>/manifest.json.")
    args = p.parse_args(argv)

    dit_cfg = getattr(DiTConfig, args.config)()
    vae_cfg = getattr(VAEConfig, args.config)()
    os.makedirs(args.out, exist_ok=True)

    print("converting DiT ...", flush=True)
    dit_params = convert_dit_state_dict(
        load_hf_safetensors(args.transformer), dit_cfg
    )
    if args.quantize != "none":
        import jax.numpy as jnp

        from aether_tpu.models.dit import quantize_dit_params

        dtype = jnp.float8_e4m3fn if args.quantize == "fp8" else jnp.int8
        dit_params = quantize_dit_params(dit_params, dtype=dtype)
    save_checkpoint(os.path.join(args.out, "dit"), dit_params)

    print("converting VAE ...", flush=True)
    vae_params = convert_vae_state_dict(load_hf_safetensors(args.vae), vae_cfg)
    save_checkpoint(os.path.join(args.out, "vae"), vae_params)

    if args.t5:
        print("embedding the empty prompt ...", flush=True)
        text = compute_empty_prompt_embeds(args.t5, dit_cfg.max_text_seq_length)
    else:
        text = np.zeros(
            (dit_cfg.max_text_seq_length, dit_cfg.text_embed_dim), np.float32
        )
    np.save(os.path.join(args.out, "text_embeds.npy"), text)
    print(f"wrote {args.out}/{{dit,vae,text_embeds.npy}}")

    if args.verify:
        import json

        print("verifying ...", flush=True)
        manifest = verify_conversion(
            args.out, dit_cfg, args.quantize,
            in_memory_dit=dit_params, in_memory_vae=vae_params,
            expect_real_text=bool(args.t5))
        with open(os.path.join(args.out, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        print(f"manifest: {json.dumps(manifest['checks'])}")
        if not manifest["ok"]:
            raise SystemExit("verification FAILED — see manifest.json")


if __name__ == "__main__":
    main()
