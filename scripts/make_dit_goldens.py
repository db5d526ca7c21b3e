#!/usr/bin/env python
"""Generate the per-block DiT golden activation fixture.

Runs the independent torch reference model (tests/test_torch_parity.py) at the
mid-size config (4 blocks x 512 hidden, head_dim 64, 768 video + 16 text
tokens) with version-stable numpy-seeded weights, and records the video/text
token streams after EVERY block plus the final output to
``tests/fixtures/dit_block_goldens.npz``. The committed fixture lets
``test_dit_per_block_golden_activations`` diff the JAX DiT layerwise — catching
norm-placement / RoPE-layout regressions that end-output tolerances hide
(SURVEY.md "hard parts": layerwise activation diffing).

Usage: python scripts/make_dit_goldens.py
"""

import pathlib
import sys

import numpy as np
import torch

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))

from test_torch_parity import (  # noqa: E402
    TorchDiTRef,
    fill_state_dict_deterministic,
    mid_config,
    mid_inputs,
)


def main():
    cfg = mid_config()
    model = fill_state_dict_deterministic(TorchDiTRef(cfg)).eval()
    hidden, text, cos, sin = mid_inputs(cfg)

    collect = []
    with torch.no_grad():
        out = model(
            torch.from_numpy(hidden), torch.from_numpy(text),
            torch.tensor([999]), torch.from_numpy(cos), torch.from_numpy(sin),
            collect=collect,
        ).numpy()

    arrays = {"hidden": hidden, "text": text, "out": out}
    for i, (vid, txt) in enumerate(collect):
        arrays[f"vid_{i}"] = vid.numpy()
        arrays[f"txt_{i}"] = txt.numpy()

    path = (pathlib.Path(__file__).resolve().parent.parent / "tests"
            / "fixtures" / "dit_block_goldens.npz")
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **arrays)
    size_mb = path.stat().st_size / 1e6
    print(f"wrote {path} ({size_mb:.1f} MB, {len(collect)} blocks)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
