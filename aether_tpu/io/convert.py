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


if __name__ == "__main__":
    main()
