"""Checkpoint IO: HF-safetensors -> pytree conversion + orbax persistence.

The reference loads five HF subfolders with ``from_pretrained``
(``scripts/demo.py:206-228``). Here the torch checkpoints are converted ONCE into
our pytree layouts (linear weights become [in, out]; conv kernels become DHWIO;
per-layer DiT tensors are stacked along a leading layer axis for the lax.scan
runner), the constant empty-prompt T5 embedding is baked in (so no text encoder at
runtime, reference ``pipeline:290-297``), and everything round-trips through orbax.

Name mapping targets the upstream module trees:
- CogVideoXTransformer3DModel: patch_embed.{proj,text_proj}, time_embedding,
  transformer_blocks.{i}.{norm1,attn1,norm2,ff}, norm_final, norm_out, proj_out;
- AutoencoderKLCogVideoX: encoder/decoder conv_in, {down,up}_blocks.{i}.resnets.{j}
  (causal convs expose ``.conv``; decoder norms are SpatialNorm3D with
  norm_layer/conv_y/conv_b), downsamplers/upsamplers, mid_block, norm_out, conv_out.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterable, Mapping, Optional

import numpy as np

from aether_tpu.config import DiTConfig, VAEConfig

Params = Dict[str, Any]


def _t(x) -> np.ndarray:  # torch tensor -> numpy (keeps bf16 via ml_dtypes)
    if hasattr(x, "detach"):
        import torch

        x = x.detach().cpu()
        if x.dtype == torch.bfloat16:
            import ml_dtypes

            return x.view(torch.int16).numpy().view(ml_dtypes.bfloat16)
        return x.numpy()
    return np.asarray(x)


def _linear(sd: Mapping[str, Any], name: str) -> Dict[str, np.ndarray]:
    return {"w": _t(sd[f"{name}.weight"]).T, "b": _t(sd[f"{name}.bias"])}


def _stack(arrs: Iterable[np.ndarray]) -> np.ndarray:
    return np.stack(list(arrs), axis=0)


def convert_dit_state_dict(sd: Mapping[str, Any], cfg: DiTConfig) -> Params:
    """Torch CogVideoXTransformer3DModel state dict -> ``init_dit_params`` layout."""
    p = cfg.patch_size
    # conv2d [D, C, p, p] -> [C*p*p, D] matching _patchify's (c, ph, pw) token layout
    proj_w = _t(sd["patch_embed.proj.weight"])
    d = proj_w.shape[0]
    proj_w = proj_w.reshape(d, -1).T

    def block(i: int) -> Dict[str, Dict[str, np.ndarray]]:
        pre = f"transformer_blocks.{i}"
        return {
            "norm1": {
                **_linear(sd, f"{pre}.norm1.linear"),
                "ln_scale": _t(sd[f"{pre}.norm1.norm.weight"]),
                "ln_bias": _t(sd[f"{pre}.norm1.norm.bias"]),
            },
            "norm2": {
                **_linear(sd, f"{pre}.norm2.linear"),
                "ln_scale": _t(sd[f"{pre}.norm2.norm.weight"]),
                "ln_bias": _t(sd[f"{pre}.norm2.norm.bias"]),
            },
            "attn": {
                "q_w": _t(sd[f"{pre}.attn1.to_q.weight"]).T,
                "q_b": _t(sd[f"{pre}.attn1.to_q.bias"]),
                "k_w": _t(sd[f"{pre}.attn1.to_k.weight"]).T,
                "k_b": _t(sd[f"{pre}.attn1.to_k.bias"]),
                "v_w": _t(sd[f"{pre}.attn1.to_v.weight"]).T,
                "v_b": _t(sd[f"{pre}.attn1.to_v.bias"]),
                "o_w": _t(sd[f"{pre}.attn1.to_out.0.weight"]).T,
                "o_b": _t(sd[f"{pre}.attn1.to_out.0.bias"]),
                "norm_q_scale": _t(sd[f"{pre}.attn1.norm_q.weight"]),
                "norm_q_bias": _t(sd[f"{pre}.attn1.norm_q.bias"]),
                "norm_k_scale": _t(sd[f"{pre}.attn1.norm_k.weight"]),
                "norm_k_bias": _t(sd[f"{pre}.attn1.norm_k.bias"]),
            },
            "mlp": {
                "w1": _t(sd[f"{pre}.ff.net.0.proj.weight"]).T,
                "b1": _t(sd[f"{pre}.ff.net.0.proj.bias"]),
                "w2": _t(sd[f"{pre}.ff.net.2.weight"]).T,
                "b2": _t(sd[f"{pre}.ff.net.2.bias"]),
            },
        }

    blocks = [block(i) for i in range(cfg.num_layers)]
    import jax

    stacked = jax.tree_util.tree_map(lambda *xs: _stack(xs), *blocks)

    out = {
        "patch_embed": {
            "proj_w": proj_w,
            "proj_b": _t(sd["patch_embed.proj.bias"]),
            "text_w": _t(sd["patch_embed.text_proj.weight"]).T,
            "text_b": _t(sd["patch_embed.text_proj.bias"]),
        },
        "time_embed": {
            "w1": _t(sd["time_embedding.linear_1.weight"]).T,
            "b1": _t(sd["time_embedding.linear_1.bias"]),
            "w2": _t(sd["time_embedding.linear_2.weight"]).T,
            "b2": _t(sd["time_embedding.linear_2.bias"]),
        },
        "blocks": stacked,
        "norm_final": {
            "scale": _t(sd["norm_final.weight"]),
            "bias": _t(sd["norm_final.bias"]),
        },
        "norm_out": {
            **_linear(sd, "norm_out.linear"),
            "ln_scale": _t(sd["norm_out.norm.weight"]),
            "ln_bias": _t(sd["norm_out.norm.bias"]),
        },
        "proj_out": {
            "w": _t(sd["proj_out.weight"]).T,
            "b": _t(sd["proj_out.bias"]),
        },
    }
    # CogVideoX-1.5 ofs conditioning (present only when the checkpoint has it)
    if "ofs_embedding.linear_1.weight" in sd:
        out["ofs_embed"] = {
            "w1": _t(sd["ofs_embedding.linear_1.weight"]).T,
            "b1": _t(sd["ofs_embedding.linear_1.bias"]),
            "w2": _t(sd["ofs_embedding.linear_2.weight"]).T,
            "b2": _t(sd["ofs_embedding.linear_2.bias"]),
        }
    return out


def _conv3d_w(sd: Mapping[str, Any], name: str) -> np.ndarray:
    """torch conv3d [out, in, kt, kh, kw] -> DHWIO [kt, kh, kw, in, out]."""
    return _t(sd[f"{name}.weight"]).transpose(2, 3, 4, 1, 0)


def _conv2d_w(sd: Mapping[str, Any], name: str) -> np.ndarray:
    """torch conv2d [out, in, kh, kw] -> [1, kh, kw, in, out]."""
    return _t(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)[None]


def convert_vae_state_dict(sd: Mapping[str, Any], cfg: VAEConfig) -> Params:
    """Torch AutoencoderKLCogVideoX state dict -> ``init_vae_params`` layout."""

    def resnet(pre: str, spatial_norm: bool) -> Dict[str, Any]:
        def norm(n: str, ch_key: str) -> Dict[str, np.ndarray]:
            if not spatial_norm:
                return {
                    "norm_scale": _t(sd[f"{pre}.{n}.weight"]),
                    "norm_bias": _t(sd[f"{pre}.{n}.bias"]),
                }
            return {
                "norm_scale": _t(sd[f"{pre}.{n}.norm_layer.weight"]),
                "norm_bias": _t(sd[f"{pre}.{n}.norm_layer.bias"]),
                "conv_y_w": _conv3d_w(sd, f"{pre}.{n}.conv_y.conv"),
                "conv_y_b": _t(sd[f"{pre}.{n}.conv_y.conv.bias"]),
                "conv_b_w": _conv3d_w(sd, f"{pre}.{n}.conv_b.conv"),
                "conv_b_b": _t(sd[f"{pre}.{n}.conv_b.conv.bias"]),
            }

        out: Dict[str, Any] = {
            "norm1": norm("norm1", "in"),
            "conv1_w": _conv3d_w(sd, f"{pre}.conv1.conv"),
            "conv1_b": _t(sd[f"{pre}.conv1.conv.bias"]),
            "norm2": norm("norm2", "out"),
            "conv2_w": _conv3d_w(sd, f"{pre}.conv2.conv"),
            "conv2_b": _t(sd[f"{pre}.conv2.conv.bias"]),
        }
        if f"{pre}.conv_shortcut.weight" in sd:
            out["shortcut_w"] = _conv3d_w(sd, f"{pre}.conv_shortcut")
            out["shortcut_b"] = _t(sd[f"{pre}.conv_shortcut.bias"])
        return out

    chs = cfg.block_out_channels
    enc: Params = {
        "conv_in_w": _conv3d_w(sd, "encoder.conv_in.conv"),
        "conv_in_b": _t(sd["encoder.conv_in.conv.bias"]),
        "norm_out_scale": _t(sd["encoder.norm_out.weight"]),
        "norm_out_bias": _t(sd["encoder.norm_out.bias"]),
        "conv_out_w": _conv3d_w(sd, "encoder.conv_out.conv"),
        "conv_out_b": _t(sd["encoder.conv_out.conv.bias"]),
        "down_blocks": [],
        "mid": [
            resnet(f"encoder.mid_block.resnets.{j}", spatial_norm=False)
            for j in range(2)
        ],
    }
    for i in range(len(chs)):
        block: Params = {
            "resnets": [
                resnet(f"encoder.down_blocks.{i}.resnets.{j}", spatial_norm=False)
                for j in range(cfg.layers_per_block)
            ]
        }
        ds = f"encoder.down_blocks.{i}.downsamplers.0.conv"
        if f"{ds}.weight" in sd:
            block["downsampler"] = {
                "conv_w": _conv2d_w(sd, ds),
                "conv_b": _t(sd[f"{ds}.bias"]),
            }
        enc["down_blocks"].append(block)

    dec: Params = {
        "conv_in_w": _conv3d_w(sd, "decoder.conv_in.conv"),
        "conv_in_b": _t(sd["decoder.conv_in.conv.bias"]),
        "mid": [
            resnet(f"decoder.mid_block.resnets.{j}", spatial_norm=True)
            for j in range(2)
        ],
        "up_blocks": [],
        "norm_out": {
            "norm_scale": _t(sd["decoder.norm_out.norm_layer.weight"]),
            "norm_bias": _t(sd["decoder.norm_out.norm_layer.bias"]),
            "conv_y_w": _conv3d_w(sd, "decoder.norm_out.conv_y.conv"),
            "conv_y_b": _t(sd["decoder.norm_out.conv_y.conv.bias"]),
            "conv_b_w": _conv3d_w(sd, "decoder.norm_out.conv_b.conv"),
            "conv_b_b": _t(sd["decoder.norm_out.conv_b.conv.bias"]),
        },
        "conv_out_w": _conv3d_w(sd, "decoder.conv_out.conv"),
        "conv_out_b": _t(sd["decoder.conv_out.conv.bias"]),
    }
    for i in range(len(chs)):
        block = {
            "resnets": [
                resnet(f"decoder.up_blocks.{i}.resnets.{j}", spatial_norm=True)
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        us = f"decoder.up_blocks.{i}.upsamplers.0.conv"
        if f"{us}.weight" in sd:
            block["upsampler"] = {
                "conv_w": _conv2d_w(sd, us),
                "conv_b": _t(sd[f"{us}.bias"]),
            }
        dec["up_blocks"].append(block)

    return {"encoder": enc, "decoder": dec}


def load_hf_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load all *.safetensors shards under ``path`` into one flat dict."""
    import glob

    from safetensors import safe_open

    sd: Dict[str, np.ndarray] = {}
    for shard in sorted(glob.glob(os.path.join(path, "*.safetensors"))):
        with safe_open(shard, framework="np") as f:
            for key in f.keys():
                sd[key] = f.get_tensor(key)
    if not sd:
        raise FileNotFoundError(f"no safetensors found under {path}")
    return sd


def compute_empty_prompt_embeds(
    t5_path: str, max_length: int = 226
) -> np.ndarray:
    """One-time empty-prompt T5 embedding (reference ``pipeline:290-297``)."""
    import torch
    from transformers import AutoTokenizer, T5EncoderModel

    tokenizer = AutoTokenizer.from_pretrained(t5_path)
    encoder = T5EncoderModel.from_pretrained(t5_path)
    inputs = tokenizer(
        "", padding="max_length", max_length=max_length, truncation=True,
        add_special_tokens=True, return_tensors="pt",
    )
    with torch.no_grad():
        out = encoder(inputs.input_ids)[0]
    return out[0].float().numpy()


# ---------------------------------------------------------------------------
# orbax persistence
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, tree: Params) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(os.path.abspath(path), tree)


def load_checkpoint(path: str, template: Optional[Params] = None) -> Params:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckpt:
        if template is not None:
            return ckpt.restore(os.path.abspath(path), template)
        return ckpt.restore(os.path.abspath(path))
