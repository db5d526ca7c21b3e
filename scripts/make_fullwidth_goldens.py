#!/usr/bin/env python
"""Generate the FULL-WIDTH DiT golden fixture (one block at the real geometry).

The mid-size fixture (scripts/make_dit_goldens.py) covers head_dim 64 at
512 hidden; this one pins the REAL AetherV1 width — 3072 hidden, 48 heads,
4096-dim text conditioning, 512-dim time embedding, 96->56 channel
patchify/unpatchify — where a width-dependent slip (fused-qkv interleave at 48
heads, converter reshape at 3072) would pass every narrower test. One block
(``num_layers=1``): the scan stacks layers identically, so layer count adds
no converter/width risk, only runtime. Token geometry is kept small (f=2,
12x18 latent grid) because torch SDPA at the full 15k-token window is not
tractable on this 1-core host; the full 60x90x11 RoPE grid is covered
separately in tests/test_fullwidth_parity.py against an independent oracle.

Usage: python scripts/make_fullwidth_goldens.py
"""

import pathlib
import sys

import numpy as np
import torch

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))

from test_fullwidth_parity import (  # noqa: E402
    fullwidth_config,
    fullwidth_inputs,
)
from test_torch_parity import (  # noqa: E402
    TorchDiTRef,
    fill_state_dict_deterministic,
)


def main():
    cfg = fullwidth_config()
    model = fill_state_dict_deterministic(TorchDiTRef(cfg)).eval()
    hidden, text, cos, sin = fullwidth_inputs(cfg)

    collect = []
    with torch.no_grad():
        out = model(
            torch.from_numpy(hidden), torch.from_numpy(text),
            torch.tensor([999]), torch.from_numpy(cos), torch.from_numpy(sin),
            collect=collect,
        ).numpy()

    vid, txt = collect[0]
    arrays = {
        "out": out,
        "vid_0": vid.numpy(),
        "txt_0": txt.numpy(),
    }
    path = _ROOT / "tests" / "fixtures" / "dit_fullwidth_goldens.npz"
    np.savez_compressed(path, **arrays)
    print(f"wrote {path} ({path.stat().st_size / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
