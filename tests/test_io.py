"""Checkpoint IO: orbax round-trip and HF state-dict conversion shapes."""

import numpy as np
import pytest

from aether_tpu.config import DiTConfig, VAEConfig
from aether_tpu.io.weights import (
    convert_dit_state_dict,
    load_checkpoint,
    save_checkpoint,
)


def test_orbax_roundtrip(tmp_path):
    tree = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "nested": {"b": np.ones((2, 2), np.float32)},
    }
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, tree)
    restored = load_checkpoint(path)
    np.testing.assert_array_equal(restored["a"], tree["a"])
    np.testing.assert_array_equal(restored["nested"]["b"], tree["nested"]["b"])


def _fake_hf_dit_state_dict(cfg: DiTConfig) -> dict:
    """Minimal torch-layout state dict covering the converter's name map."""
    import torch

    d = cfg.hidden_size
    sd = {}

    def lin(name, cin, cout):
        sd[f"{name}.weight"] = torch.randn(cout, cin)
        sd[f"{name}.bias"] = torch.randn(cout)

    # conv2d patchifier: (D, C, p, p) like the HF checkpoint
    sd["patch_embed.proj.weight"] = torch.randn(
        d, cfg.in_channels, cfg.patch_size, cfg.patch_size
    )
    sd["patch_embed.proj.bias"] = torch.randn(d)
    lin("patch_embed.text_proj", cfg.text_embed_dim, d)
    # sinusoidal time features are hidden_size-wide in CogVideoX
    lin("time_embedding.linear_1", d, cfg.time_embed_dim)
    lin("time_embedding.linear_2", cfg.time_embed_dim, cfg.time_embed_dim)
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}"
        lin(f"{pre}.norm1.linear", cfg.time_embed_dim, 6 * d)
        sd[f"{pre}.norm1.norm.weight"] = torch.randn(d)
        sd[f"{pre}.norm1.norm.bias"] = torch.randn(d)
        lin(f"{pre}.norm2.linear", cfg.time_embed_dim, 6 * d)
        sd[f"{pre}.norm2.norm.weight"] = torch.randn(d)
        sd[f"{pre}.norm2.norm.bias"] = torch.randn(d)
        for qkv in ("to_q", "to_k", "to_v"):
            lin(f"{pre}.attn1.{qkv}", d, d)
        lin(f"{pre}.attn1.to_out.0", d, d)
        sd[f"{pre}.attn1.norm_q.weight"] = torch.randn(cfg.head_dim)
        sd[f"{pre}.attn1.norm_q.bias"] = torch.randn(cfg.head_dim)
        sd[f"{pre}.attn1.norm_k.weight"] = torch.randn(cfg.head_dim)
        sd[f"{pre}.attn1.norm_k.bias"] = torch.randn(cfg.head_dim)
        lin(f"{pre}.ff.net.0.proj", d, cfg.mlp_dim)
        lin(f"{pre}.ff.net.2", cfg.mlp_dim, d)
    sd["norm_final.weight"] = torch.randn(d)
    sd["norm_final.bias"] = torch.randn(d)
    lin("norm_out.linear", cfg.time_embed_dim, 2 * d)
    sd["norm_out.norm.weight"] = torch.randn(d)
    sd["norm_out.norm.bias"] = torch.randn(d)
    lin("proj_out", d, cfg.patch_size**2 * cfg.out_channels)
    return sd


def test_dit_converter_shapes_and_forward(tmp_path):
    """Converted params must drop into dit_forward and round-trip via orbax."""
    import jax
    import jax.numpy as jnp

    from aether_tpu.models.dit import dit_forward
    from aether_tpu.models.rope import prepare_rotary_positional_embeddings

    cfg = DiTConfig.tiny()
    sd = _fake_hf_dit_state_dict(cfg)
    params = convert_dit_state_dict(sd, cfg)

    # stacked block tensors have the leading layer axis
    assert params["blocks"]["attn"]["q_w"].shape == (
        cfg.num_layers, cfg.hidden_size, cfg.hidden_size
    )
    # linear weights transposed to [in, out]
    assert params["patch_embed"]["text_w"].shape == (
        cfg.text_embed_dim, cfg.hidden_size
    )

    path = str(tmp_path / "dit")
    save_checkpoint(path, params)
    params = load_checkpoint(path)

    f, h, w = 2, 8, 12
    hidden = jnp.zeros((1, f, cfg.in_channels, h, w), jnp.float32)
    text = jnp.zeros((1, cfg.max_text_seq_length, cfg.text_embed_dim),
                     jnp.float32)
    cos, sin = prepare_rotary_positional_embeddings(cfg, h * 8, w * 8, f, fps=12)
    out = dit_forward(params, cfg, hidden, text, jnp.array([999]),
                      jnp.asarray(cos), jnp.asarray(sin), attn_impl="xla")
    assert out.shape == (1, f, cfg.out_channels, h, w)
    assert np.all(np.isfinite(np.asarray(out)))


# ---------------------------------------------------------------------------
# convert dress rehearsal (VERDICT round 1, item 8)
# ---------------------------------------------------------------------------


def test_convert_dress_rehearsal(tmp_path):
    """Full offline conversion path, end to end: synthetic HF-layout
    safetensors (upstream names, sharded) -> ``python -m aether_tpu.io.convert``
    -> orbax -> ``apps/demo.py --checkpoint`` reconstruction on CPU. Reference
    load sites: ``scripts/demo.py:206-232``."""
    import pathlib
    import sys

    scripts = pathlib.Path(__file__).parent.parent / "scripts"
    sys.path.insert(0, str(scripts))
    try:
        from make_synthetic_checkpoint import write_synthetic_checkpoint
    finally:
        sys.path.pop(0)

    hf_dir = tmp_path / "hf"
    tdir, vdir = write_synthetic_checkpoint(hf_dir, config="tiny", shards=2)

    from aether_tpu.io import convert

    out_dir = tmp_path / "converted"
    convert.main(["--transformer", tdir, "--vae", vdir,
                  "--out", str(out_dir), "--config", "tiny"])
    assert (out_dir / "text_embeds.npy").exists()

    # converted orbax tree must match a direct in-memory conversion exactly
    from safetensors.torch import load_file

    import glob as _glob

    sd = {}
    for shard in sorted(_glob.glob(str(pathlib.Path(tdir) / "*.safetensors"))):
        sd.update(load_file(shard))
    direct = convert_dit_state_dict(sd, DiTConfig.tiny())
    restored = load_checkpoint(str(out_dir / "dit"))

    import jax

    def _cmp(a, b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    jax.tree_util.tree_map(_cmp, direct, restored)

    # drive apps/demo.py --checkpoint end to end (17f tiny reconstruction)
    from PIL import Image

    rng = np.random.default_rng(0)
    frames = [
        Image.fromarray(
            (rng.uniform(0, 1, (64, 96, 3)) * 255).astype(np.uint8)
        )
        for _ in range(17)
    ]
    video_path = tmp_path / "input.gif"
    frames[0].save(video_path, save_all=True, append_images=frames[1:],
                   duration=80, loop=0)

    from aether_tpu.apps import demo

    out_root = tmp_path / "outputs"
    demo.main([
        "--task", "reconstruction", "--video", str(video_path),
        "--checkpoint", str(out_dir), "--config", "tiny",
        "--height", "64", "--width", "96", "--num_frames", "17",
        "--num_inference_steps", "1", "--output_dir", str(out_root),
        "--pointcloud_save_frame_interval", "100",
    ])
    written = list(out_root.rglob("*"))
    # save_video picks mp4 when an encoder exists, else MJPEG .avi / .gif
    assert any(p.suffix in (".gif", ".mp4", ".avi") for p in written), written


def test_convert_quantized_fp8(tmp_path):
    """--quantize fp8 conversion produces a loadable quantized tree that the
    DiT forward accepts."""
    import pathlib
    import sys

    scripts = pathlib.Path(__file__).parent.parent / "scripts"
    sys.path.insert(0, str(scripts))
    try:
        from make_synthetic_checkpoint import write_synthetic_checkpoint
    finally:
        sys.path.pop(0)

    tdir, vdir = write_synthetic_checkpoint(tmp_path / "hf", config="tiny",
                                            shards=1)
    from aether_tpu.io import convert

    out_dir = tmp_path / "converted_fp8"
    convert.main(["--transformer", tdir, "--vae", vdir,
                  "--out", str(out_dir), "--config", "tiny",
                  "--quantize", "fp8"])

    import jax.numpy as jnp

    from aether_tpu.models.dit import dit_forward
    from aether_tpu.models.rope import prepare_rotary_positional_embeddings

    cfg = DiTConfig.tiny()
    params = load_checkpoint(str(out_dir / "dit"))
    assert params["blocks"]["attn"]["q_w"]["q"].dtype == jnp.float8_e4m3fn

    f, h, w = 2, 8, 12
    rng = np.random.default_rng(1)
    hidden = jnp.asarray(rng.normal(size=(1, f, cfg.in_channels, h, w)),
                         jnp.float32)
    text = jnp.asarray(
        rng.normal(size=(1, cfg.max_text_seq_length, cfg.text_embed_dim)),
        jnp.float32)
    cos, sin = prepare_rotary_positional_embeddings(
        cfg, h * 8, w * 8, f, vae_scale_factor_spatial=8, fps=12)
    out = dit_forward(params, cfg, hidden, text, jnp.array([10]),
                      jnp.asarray(cos), jnp.asarray(sin), attn_impl="xla")
    assert np.all(np.isfinite(np.asarray(out)))


def test_convert_verify_int8_writes_passing_manifest(tmp_path):
    """--verify after an int8 conversion must replay the rehearsal checks
    (structure vs runtime template, orbax bit-roundtrip, fused-qkv
    consistency, text-embeds sanity) and write a passing manifest.json
    (VERDICT r4 #7: the real-weights one-shot leaves no judgment calls)."""
    import json
    import pathlib
    import sys

    scripts = pathlib.Path(__file__).parent.parent / "scripts"
    sys.path.insert(0, str(scripts))
    try:
        from make_synthetic_checkpoint import write_synthetic_checkpoint
    finally:
        sys.path.pop(0)

    tdir, vdir = write_synthetic_checkpoint(tmp_path / "hf", config="tiny",
                                            shards=1)
    from aether_tpu.io import convert

    out_dir = tmp_path / "converted_verify"
    convert.main(["--transformer", tdir, "--vae", vdir,
                  "--out", str(out_dir), "--config", "tiny",
                  "--quantize", "int8", "--verify"])
    manifest = json.loads((out_dir / "manifest.json").read_text())
    assert manifest["ok"] is True, manifest["checks"]
    assert manifest["checks"]["dit_structure"] is True
    assert manifest["checks"]["dit_roundtrip_bitexact"] is True
    assert manifest["checks"]["vae_roundtrip_bitexact"] is True
    assert manifest["checks"]["fused_qkv"] is True
    assert manifest["checks"]["text_embeds"] is True
    assert manifest["dit_bytes"] > 0 and manifest["vae_bytes"] > 0


def test_compute_empty_prompt_embeds_contract(tmp_path, monkeypatch):
    """Shape/contract test with a tiny REAL T5 encoder and a stub tokenizer
    (VERDICT r4 weak #6: this function sits on the critical path of the
    real-weights conversion but had never executed — T5 weights and the
    sentencepiece vocab are unreachable offline).

    Pins the contract of reference ``pipeline:290-297``: empty prompt,
    padding to max_length with special tokens, encoder forward without
    grads, first batch row, float32 numpy of shape (max_length, d_model)."""
    import numpy as np
    import torch
    from transformers import T5Config, T5EncoderModel

    d_model = 32
    cfg = T5Config(vocab_size=64, d_model=d_model, d_kv=8, d_ff=64,
                   num_layers=2, num_heads=4)
    torch.manual_seed(0)
    model = T5EncoderModel(cfg)
    model.save_pretrained(tmp_path / "t5")

    captured = {}

    class StubTok:
        """Mimics the T5 tokenizer's empty-prompt output: [</s>=1] + pads."""

        def __call__(self, text, padding=None, max_length=None,
                     truncation=None, add_special_tokens=None,
                     return_tensors=None):
            captured.update(text=text, padding=padding, max_length=max_length,
                            truncation=truncation,
                            add_special_tokens=add_special_tokens)
            ids = torch.zeros((1, max_length), dtype=torch.long)
            ids[0, 0] = 1  # </s>

            class Out:
                input_ids = ids

            return Out()

    import transformers

    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained",
                        classmethod(lambda cls, p: StubTok()))

    from aether_tpu.io.weights import compute_empty_prompt_embeds

    out = compute_empty_prompt_embeds(str(tmp_path / "t5"), max_length=13)
    assert out.shape == (13, d_model)
    assert out.dtype == np.float32
    assert np.isfinite(out).all() and np.abs(out).max() > 0
    # the reference's exact tokenization contract (pipeline:290-297)
    assert captured["text"] == ""
    assert captured["padding"] == "max_length"
    assert captured["max_length"] == 13
    assert captured["truncation"] is True
    assert captured["add_special_tokens"] is True

    # cross-check against a direct forward of the same tiny encoder
    # (from_pretrained returns eval mode — match it, or dropout diverges)
    model.eval()
    ids = torch.zeros((1, 13), dtype=torch.long)
    ids[0, 0] = 1
    with torch.no_grad():
        ref = model(ids)[0][0].float().numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
