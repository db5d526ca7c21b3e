"""Device mesh construction and sharding rules (dp x tp).

The reference's only parallelism is embarrassing data-parallel sequence sharding
through HF Accelerate (SURVEY.md section 2.3, ``evaluation/*/launch_aether.py``).
The TPU-native equivalents here are:

- **dp**: batch / CFG-pair / eval-sequence sharding across chips;
- **tp**: Megatron-style tensor parallelism of the 3072-wide DiT — q/k/v and MLP
  up-projections shard the output feature dim (= attention heads), output
  projections shard the input dim. Annotations only: XLA GSPMD inserts the
  all-reduces over ICI; no hand-written collectives in model code.

Use ``make_mesh`` for explicit topologies or the (dp, tp) factorization helper.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aether_tpu.config import DiTConfig


def make_mesh(
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    sp: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('dp', 'tp'[, 'sp']) mesh over the available devices.

    With no arguments, all devices go to tp on a single host (the DiT is one
    model; eval harnesses add dp explicitly). ``sp`` (sequence/context
    parallelism: the attention's query-token axis, see
    ``models/dit.py::_sharded_flash_attention``) adds a third axis for
    scaling past tp=heads onto pod slices; when omitted or 1 the mesh stays
    two-axis so existing (dp, tp) callers are unchanged.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sp_total = 1 if sp is None else sp
    assert n % sp_total == 0, f"sp({sp_total}) does not divide devices ({n})"
    n_dt = n // sp_total
    if dp is None and tp is None:
        dp, tp = 1, n_dt
    elif dp is None:
        dp = n_dt // tp
    elif tp is None:
        tp = n_dt // dp
    assert dp * tp * sp_total == n, (
        f"dp({dp}) * tp({tp}) * sp({sp_total}) != num devices ({n})"
    )
    if sp is None:
        arr = np.asarray(devices).reshape(dp, tp)
        return Mesh(arr, axis_names=("dp", "tp"))
    arr = np.asarray(devices).reshape(dp, tp, sp_total)
    return Mesh(arr, axis_names=("dp", "tp", "sp"))


def dit_param_sharding(
    cfg: DiTConfig, mesh: Mesh, fsdp: bool = False
) -> Dict[str, Any]:
    """PartitionSpec tree matching ``init_dit_params``' structure.

    Stacked block params have a leading layer axis (never sharded — it is the
    ``lax.scan`` carry axis). Feature-dim sharding follows the Megatron pattern
    so that activations stay replicated on tp and each block needs exactly one
    all-reduce after attention and one after the MLP (inserted by GSPMD).

    ``fsdp=True`` additionally shards the *other* matmul dimension of every
    large weight over the ``dp`` axis — fully-sharded data parallelism in the
    GSPMD idiom: resident parameters, AdamW moments, and the EMA copy all
    shrink to 1/dp per chip, GSPMD all-gathers one layer slice at a time as
    the block scan touches it, and weight gradients come back reduce-scattered
    instead of all-reduced (ZeRO-3 memory at ZeRO-2 communication cost inside
    a scan). At 42L x 3072d this is the difference between ~67 GB of f32
    optimizer state replicated per chip and ~8.4 GB/chip on dp=8; the full
    model cannot train without it. Small leaves (biases, LN scales, the 512-d
    time embedding) stay replicated — their moments are noise next to one
    transformer block.
    """
    rep = P()
    f = "dp" if fsdp else None  # fsdp rides the dp axis (batch stays on dp)
    blocks = {
        # adaLN modulation: shard the 6*D output features
        "norm1": {"w": P(None, f, "tp"), "b": P(None, "tp"),
                  "ln_scale": rep, "ln_bias": rep},
        "norm2": {"w": P(None, f, "tp"), "b": P(None, "tp"),
                  "ln_scale": rep, "ln_bias": rep},
        "attn": {
            "q_w": P(None, f, "tp"), "q_b": P(None, "tp"),
            "k_w": P(None, f, "tp"), "k_b": P(None, "tp"),
            "v_w": P(None, f, "tp"), "v_b": P(None, "tp"),
            "o_w": P(None, "tp", f), "o_b": rep,
            "norm_q_scale": rep, "norm_q_bias": rep,
            "norm_k_scale": rep, "norm_k_bias": rep,
        },
        "mlp": {
            "w1": P(None, f, "tp"), "b1": P(None, "tp"),
            "w2": P(None, "tp", f), "b2": rep,
        },
    }
    return {
        "patch_embed": {
            "proj_w": P(f, "tp"), "proj_b": P("tp"),
            "text_w": P(f, "tp"), "text_b": P("tp"),
        },
        "time_embed": {"w1": rep, "b1": rep, "w2": rep, "b2": rep},
        "blocks": blocks,
        "norm_final": {"scale": rep, "bias": rep},
        "norm_out": {"w": rep, "b": rep, "ln_scale": rep, "ln_bias": rep},
        "proj_out": {"w": P("tp", f), "b": rep},
    }


def shard_params(params: Dict[str, Any], specs: Dict[str, Any], mesh: Mesh):
    """Device-put a parameter pytree with the given PartitionSpec tree.

    Weight-only-quantized leaves (``{"q": int8/fp8 matrix, "s": per-output-
    column scales}``, see ``models.dit.quantize_dit_params``) are handled
    against the unquantized spec tree: ``q`` takes the weight's spec verbatim
    and ``s`` — indexed by the weight's LAST (output) dimension, plus the
    stacked layer axis when present — takes ``(spec[0], spec[-1])``. This is
    what lets the int8/fp8 deployment layout shard over the tp (and fsdp)
    mesh axes exactly like the bf16 tree."""

    def _is_quant(x) -> bool:
        return isinstance(x, dict) and set(x.keys()) == {"q", "s"}

    def _put(x, spec):
        if _is_quant(x):
            parts = list(spec)
            if not parts:  # replicated weight -> replicated scales
                s_spec = P()
            else:
                lead = [parts[0]] if x["q"].ndim == 3 else []
                s_spec = P(*lead, parts[-1])
            return {
                "q": jax.device_put(x["q"], NamedSharding(mesh, spec)),
                "s": jax.device_put(x["s"], NamedSharding(mesh, s_spec)),
            }
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_put, params, specs, is_leaf=_is_quant)
