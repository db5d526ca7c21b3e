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
