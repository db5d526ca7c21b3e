#!/usr/bin/env python
"""Write a synthetic HF-layout safetensors checkpoint (convert dress rehearsal).

Builds the in-test torch reference models (which carry the upstream HF
state-dict naming, tests/test_torch_parity.py + tests/test_vae_torch_parity.py)
at a chosen config, and saves their state dicts as ``*.safetensors`` shards in
the directory layout the real AetherV1 / CogVideoX-5b checkpoints use
(reference load sites ``scripts/demo.py:206-232``):

    <out>/transformer/diffusion_pytorch_model.safetensors
    <out>/vae/diffusion_pytorch_model.safetensors

This proves the full offline conversion path —
``python -m aether_tpu.io.convert`` -> orbax -> ``apps/demo.py --checkpoint`` —
end to end before real weights are ever available
(tests/test_io.py::test_convert_dress_rehearsal runs it in CI).

Usage: python scripts/make_synthetic_checkpoint.py --out /tmp/synth_ckpt \
           [--config tiny] [--seed 0] [--shards 2]
"""

import argparse
import pathlib
import sys

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))


def write_synthetic_checkpoint(out_dir, config: str = "tiny", seed: int = 0,
                               shards: int = 1):
    """Create the synthetic HF checkpoint; returns (transformer_dir, vae_dir).

    ``shards > 1`` splits the transformer state dict across several
    ``*.safetensors`` files like the real 5B checkpoint does — exercising
    ``load_hf_safetensors``'s shard merging.
    """
    import torch
    from safetensors.torch import save_file

    from aether_tpu.config import DiTConfig, VAEConfig
    from test_torch_parity import TorchDiTRef, fill_state_dict_deterministic
    from test_vae_torch_parity import TorchCogVAE

    out = pathlib.Path(out_dir)
    dit_cfg = getattr(DiTConfig, config)()
    vae_cfg = getattr(VAEConfig, config)()

    torch.manual_seed(seed)
    dit = fill_state_dict_deterministic(TorchDiTRef(dit_cfg), seed=seed)
    vae = TorchCogVAE(vae_cfg)

    tdir = out / "transformer"
    vdir = out / "vae"
    tdir.mkdir(parents=True, exist_ok=True)
    vdir.mkdir(parents=True, exist_ok=True)

    sd = {k: v.contiguous() for k, v in dit.state_dict().items()}
    keys = sorted(sd.keys())
    n = max(1, int(shards))
    for i in range(n):
        part = {k: sd[k] for k in keys[i::n]}
        name = ("diffusion_pytorch_model.safetensors" if n == 1 else
                f"diffusion_pytorch_model-{i + 1:05d}-of-{n:05d}.safetensors")
        save_file(part, str(tdir / name))

    save_file({k: v.contiguous() for k, v in vae.state_dict().items()},
              str(vdir / "diffusion_pytorch_model.safetensors"))
    return str(tdir), str(vdir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--config", choices=["tiny", "aetherv1"], default="tiny")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--shards", type=int, default=2)
    args = ap.parse_args()
    tdir, vdir = write_synthetic_checkpoint(args.out, args.config, args.seed,
                                            args.shards)
    print(f"wrote {tdir} and {vdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
