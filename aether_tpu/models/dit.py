"""CogVideoX-class diffusion transformer (DiT), functional JAX implementation.

The architecture mirrors the upstream CogVideoXTransformer3DModel consumed by the
reference (loaded at ``scripts/demo.py:223-227``; knobs read at
``aetherv1_pipeline_cogvideox.py:307-345,728,808,815``), with the AetherV1 widening:
96 input channels (56 noisy + 40 condition) and 56 output channels.

Structure per block (joint text+video token stream, text tokens first):
  adaLN-Zero norm (separate shift/scale/gate for text and video) ->
  joint self-attention with per-head QK LayerNorm and 3D RoPE on video tokens ->
  gated residual -> second adaLN-Zero -> 4x GELU(tanh) MLP -> gated residual.
Final: LayerNorm over the joint stream, AdaLN (shift/scale) on the video part,
linear head to patch_size^2 * out_channels, unpatchify.

TPU-native design choices:
- all 42 blocks are *stacked* along a leading axis and executed with a single
  ``jax.lax.scan`` — one traced block, fast compiles, identical runtime math;
- 2x2 patchify/unpatchify are expressed as reshapes + one matmul (kernel==stride)
  so the embedding lands on the MXU instead of a conv;
- LayerNorms and softmax statistics run in f32; matmuls in bf16 with f32
  accumulation; the attention inner loop is the Pallas flash kernel
  (``aether_tpu.ops.flash_attention``) with an XLA fallback for CPU tests.

Parameters are a plain nested dict of arrays; linear weights use [in, out] layout
(converters from torch checkpoints transpose).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from aether_tpu.config import DiTConfig
from aether_tpu.ops.flash_attention import attention_reference, flash_attention

Params = Dict[str, Any]


def _fold_keys(key):
    """Device-side key stream: fold_in per draw.

    ``iter(jax.random.split(key, n))`` forces one device->host sync PER KEY
    (array iteration calls __index__); on a tunneled TPU that is ~36 ms and a
    flaky-transfer exposure each. fold_in stays on device entirely.
    """
    i = 0
    while True:
        yield jax.random.fold_in(key, i)
        i += 1


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal embedding, [B] -> [B, dim] (f32)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    return emb


def layer_norm(
    x: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm over the last axis in f32; returns x's dtype.

    Single-pass moments (E[y^2] - E[y]^2 with y = x - c) so both reductions
    stream from the bf16 input instead of materializing an f32 copy
    (square(x - mean) depends on the reduce result, which breaks the input
    fusion). The shift c = x[..., :1] (first element per row, elementwise
    broadcast — no reduction dependency, still fuses) bounds the cancellation:
    for large-mean small-variance rows E[y] stays O(spread) instead of O(mean),
    so mean(y)^2 ~ E[y^2] and the subtraction loses no significant bits.
    """
    dtype = x.dtype
    x = x.astype(jnp.float32)
    y0 = x - x[..., :1]
    mean_y = jnp.mean(y0, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(y0), axis=-1, keepdims=True) - jnp.square(mean_y),
        0.0,
    )
    y = (y0 - mean_y) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def _linear(x: jnp.ndarray, w, b: Optional[jnp.ndarray],
            a8: bool = False) -> jnp.ndarray:
    if isinstance(w, dict):  # weight-only quantized: {"q": fp8/int8, "s": (out,)}
        if a8 and w["q"].dtype == jnp.int8:
            return _linear_w8a8(x, w, b)
        y = jnp.dot(x, w["q"].astype(x.dtype), preferred_element_type=jnp.float32)
        y = y * w["s"].astype(jnp.float32)
    else:
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _linear_w8a8(x: jnp.ndarray, w: dict, b: Optional[jnp.ndarray]) -> jnp.ndarray:
    """int8 x int8 matmul on the MXU (v5e: 2x the bf16 peak).

    Activations are quantized dynamically with a per-token (last-axis absmax)
    scale; weights carry the per-output-column scale from
    :func:`quantize_dit_params`. int32 accumulation, f32 rescale. Opt-in
    (``dit_forward(act_quant=True)``): activation quantization perturbs the
    model output, unlike the weight-only path whose error is baked into the
    checkpoint conversion.
    """
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, w["q"],
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * sx * w["s"].astype(jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


_QUANT_WEIGHT_KEYS = frozenset(
    {"proj_w", "text_w", "q_w", "k_w", "v_w", "o_w", "w", "w1", "w2"}
)


def quantize_dit_params(params: Params, dtype=None) -> Params:
    """Weight-only quantization of every matmul weight in the DiT tree.

    Each weight W[..., in, out] is stored as ``{"q": (W / s).astype(dtype),
    "s": s}`` with a per-output-column scale s = max|W| / dtype_max, so the
    dequantized matmul is ``dot(x, q) * s`` — column scaling commutes with the
    contraction, keeping the MXU path intact. Halves resident weight bytes vs
    bf16; biases, norms and time-embed stay unquantized. The reference has no
    quantized deployment path at all.

    MUTATES ``params`` leaf-by-leaf so each full-precision weight frees as
    soon as its quantized twin exists: a functional tree_map would hold BOTH
    trees (10.4 + 5.3 GB for AetherV1) and cross the 16 GB HBM cliff.
    """
    if dtype is None:
        dtype = jnp.float8_e4m3fn
    fmax = float(jnp.finfo(dtype).max) if jnp.issubdtype(
        dtype, jnp.floating
    ) else float(jnp.iinfo(dtype).max)

    def quant_slice(w):
        w = jnp.asarray(w, jnp.float32)
        # reduce over the contraction ('in') axis only: stacked block weights
        # (L, in, out) keep per-layer per-column scales (L, out)
        s = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / fmax
        s = jnp.maximum(s, 1e-12)
        scaled = w / s
        if not jnp.issubdtype(dtype, jnp.floating):
            scaled = jnp.round(scaled)  # round-to-nearest, not truncation
        q = scaled.astype(dtype)
        q.block_until_ready()  # materialize before the source leaf frees
        return q, jnp.squeeze(s, axis=-2)

    def quant_leaf(leaf):
        if getattr(leaf, "ndim", 0) >= 3:
            # stacked block weights: one layer at a time — the whole-leaf f32
            # temp of e.g. mlp w1 (42, 3072, 12288) is 6.2 GB, which next to
            # the resident 10.4 GB bf16 tree blows the 16 GB chip (measured
            # RESOURCE_EXHAUSTED); per-layer slices cap the temp at ~150 MB
            qs, ss = zip(*(quant_slice(leaf[i]) for i in range(leaf.shape[0])))
            return {"q": jnp.stack(qs), "s": jnp.stack(ss)}
        q, s = quant_slice(leaf)
        return {"q": q, "s": s}

    def walk(node):
        if isinstance(node, dict):
            for key, value in node.items():
                if (key in _QUANT_WEIGHT_KEYS
                        and getattr(value, "ndim", 0) >= 2):
                    node[key] = quant_leaf(value)  # old leaf freed here
                else:
                    walk(value)
        elif isinstance(node, (list, tuple)):
            for item in node:
                walk(item)

    walk(params)
    return params


def init_quantized_dit_params(key: jax.Array, cfg: DiTConfig,
                              dtype=None) -> Params:
    """Random-init params DIRECTLY in the weight-only-quantized layout.

    Never materializes the bf16 tree (10.4 GB for AetherV1) — peak memory is
    the final quantized size (~5.3 GB). For real checkpoints quantize at
    conversion time (``aether_tpu.io.convert --quantize fp8``); this is for
    benchmarks and memory-constrained random-weight runs.
    """
    if dtype is None:
        dtype = jnp.float8_e4m3fn
    d = cfg.hidden_size
    p = cfg.patch_size
    L = cfg.num_layers
    keys = _fold_keys(key)

    def qw(shape, fan_in):
        q = jax.random.uniform(next(keys), shape, jnp.float32, -2.0, 2.0
                               ).astype(dtype)
        if hasattr(q, "block_until_ready"):  # abstract under eval_shape
            q.block_until_ready()
        s = jnp.full(shape[:-2] + shape[-1:],
                     1.0 / (fan_in**0.5) / 2.0, jnp.float32)
        return {"q": q, "s": s}

    def bias(shape, fan_in):
        scale = 1.0 / (fan_in**0.5)
        return jax.random.uniform(next(keys), shape, jnp.bfloat16,
                                  -scale, scale)

    ones = lambda shape: jnp.ones(shape, jnp.bfloat16)  # noqa: E731
    zeros = lambda shape: jnp.zeros(shape, jnp.bfloat16)  # noqa: E731
    patch_in = cfg.in_channels * p * p * (cfg.patch_size_t or 1)
    te = cfg.time_embed_dim

    blocks = {
        "norm1": {"w": qw((L, te, 6 * d), te), "b": bias((L, 6 * d), te),
                  "ln_scale": ones((L, d)), "ln_bias": zeros((L, d))},
        "norm2": {"w": qw((L, te, 6 * d), te), "b": bias((L, 6 * d), te),
                  "ln_scale": ones((L, d)), "ln_bias": zeros((L, d))},
        "attn": {
            "q_w": qw((L, d, d), d), "q_b": bias((L, d), d),
            "k_w": qw((L, d, d), d), "k_b": bias((L, d), d),
            "v_w": qw((L, d, d), d), "v_b": bias((L, d), d),
            "o_w": qw((L, d, d), d), "o_b": bias((L, d), d),
            "norm_q_scale": ones((L, cfg.head_dim)),
            "norm_q_bias": zeros((L, cfg.head_dim)),
            "norm_k_scale": ones((L, cfg.head_dim)),
            "norm_k_bias": zeros((L, cfg.head_dim)),
        },
        "mlp": {"w1": qw((L, d, cfg.mlp_dim), d),
                "b1": bias((L, cfg.mlp_dim), d),
                "w2": qw((L, cfg.mlp_dim, d), cfg.mlp_dim),
                "b2": bias((L, d), cfg.mlp_dim)},
    }
    out_feat = (cfg.patch_size_t or 1) * p * p * cfg.out_channels
    tree = {
        "patch_embed": {
            "proj_w": qw((patch_in, d), patch_in),
            "proj_b": bias((d,), patch_in),
            "text_w": qw((cfg.text_embed_dim, d), cfg.text_embed_dim),
            "text_b": bias((d,), cfg.text_embed_dim),
        },
        "time_embed": {
            "w1": qw((d, te), d), "b1": bias((te,), d),
            "w2": qw((te, te), te), "b2": bias((te,), te),
        },
        "blocks": blocks,
        "norm_final": {"scale": ones((d,)), "bias": zeros((d,))},
        "norm_out": {"w": qw((te, 2 * d), te), "b": bias((2 * d,), te),
                     "ln_scale": ones((d,)), "ln_bias": zeros((d,))},
        "proj_out": {"w": qw((d, out_feat), d), "b": bias((out_feat,), d)},
    }
    if cfg.ofs_embed_dim is not None:
        od = cfg.ofs_embed_dim
        assert od == te, "ofs embedding is added to temb: dims must match"
        tree["ofs_embed"] = {
            "w1": qw((od, od), od), "b1": bias((od,), od),
            "w2": qw((od, od), od), "b2": bias((od,), od),
        }
    return tree


def apply_rotary_emb(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Interleaved-pair rotation. x: [B, H, S, D]; cos/sin: [S, D].

    Written so XLA fuses it into ONE elementwise pass: the rotated pair
    partner is expressed directly on the (.., D/2, 2) view instead of
    materializing a full rotated copy (a stack+reshape of the whole f32
    tensor costs ~9 ms/layer at the 15k-token window; this form ~0.5 ms).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    xp = xf.reshape(*xf.shape[:-1], -1, 2)
    e, o = xp[..., 0], xp[..., 1]
    # tables are interleaved-duplicated: cos[:, 2i] == cos[:, 2i+1]
    c = cos[None, None, :, ::2]
    s = sin[None, None, :, ::2]
    out = jnp.stack([e * c - o * s, o * c + e * s], axis=-1)
    return out.reshape(xf.shape).astype(dtype)


# ---------------------------------------------------------------------------
# parameter init
# ---------------------------------------------------------------------------


def _dense_init(key, d_in: int, d_out: int, dtype=jnp.float32):
    scale = 1.0 / math.sqrt(d_in)
    kw, kb = jax.random.split(key)
    return (
        jax.random.uniform(kw, (d_in, d_out), dtype, -scale, scale),
        jax.random.uniform(kb, (d_out,), dtype, -scale, scale),
    )


def init_dit_params(key: jax.Array, cfg: DiTConfig, dtype=jnp.float32) -> Params:
    """Random-init parameters with the exact checkpoint tensor topology."""
    d = cfg.hidden_size
    p = cfg.patch_size
    keys = _fold_keys(key)

    patch_in = cfg.in_channels * p * p * (cfg.patch_size_t or 1)
    proj_w, proj_b = _dense_init(next(keys), patch_in, d, dtype)
    text_w, text_b = _dense_init(next(keys), cfg.text_embed_dim, d, dtype)

    t_w1, t_b1 = _dense_init(next(keys), d, cfg.time_embed_dim, dtype)
    t_w2, t_b2 = _dense_init(next(keys), cfg.time_embed_dim, cfg.time_embed_dim, dtype)

    def block_params(bkey):
        bkeys = _fold_keys(bkey)
        n1_w, n1_b = _dense_init(next(bkeys), cfg.time_embed_dim, 6 * d, dtype)
        n2_w, n2_b = _dense_init(next(bkeys), cfg.time_embed_dim, 6 * d, dtype)
        q_w, q_b = _dense_init(next(bkeys), d, d, dtype)
        k_w, k_b = _dense_init(next(bkeys), d, d, dtype)
        v_w, v_b = _dense_init(next(bkeys), d, d, dtype)
        o_w, o_b = _dense_init(next(bkeys), d, d, dtype)
        f_w1, f_b1 = _dense_init(next(bkeys), d, cfg.mlp_dim, dtype)
        f_w2, f_b2 = _dense_init(next(bkeys), cfg.mlp_dim, d, dtype)
        return {
            "norm1": {"w": n1_w, "b": n1_b,
                      "ln_scale": jnp.ones((d,), dtype), "ln_bias": jnp.zeros((d,), dtype)},
            "norm2": {"w": n2_w, "b": n2_b,
                      "ln_scale": jnp.ones((d,), dtype), "ln_bias": jnp.zeros((d,), dtype)},
            "attn": {
                "q_w": q_w, "q_b": q_b, "k_w": k_w, "k_b": k_b,
                "v_w": v_w, "v_b": v_b, "o_w": o_w, "o_b": o_b,
                "norm_q_scale": jnp.ones((cfg.head_dim,), dtype),
                "norm_q_bias": jnp.zeros((cfg.head_dim,), dtype),
                "norm_k_scale": jnp.ones((cfg.head_dim,), dtype),
                "norm_k_bias": jnp.zeros((cfg.head_dim,), dtype),
            },
            "mlp": {"w1": f_w1, "b1": f_b1, "w2": f_w2, "b2": f_b2},
        }

    block_keys = jax.random.split(next(keys), cfg.num_layers)
    blocks = jax.vmap(block_params)(block_keys)

    out_feat = (cfg.patch_size_t or 1) * p * p * cfg.out_channels
    out_w, out_b = _dense_init(next(keys), d, out_feat, dtype)
    ada_w, ada_b = _dense_init(next(keys), cfg.time_embed_dim, 2 * d, dtype)

    tree = {
        "patch_embed": {
            "proj_w": proj_w, "proj_b": proj_b, "text_w": text_w, "text_b": text_b,
        },
        "time_embed": {"w1": t_w1, "b1": t_b1, "w2": t_w2, "b2": t_b2},
        "blocks": blocks,
        "norm_final": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "norm_out": {
            "w": ada_w, "b": ada_b,
            "ln_scale": jnp.ones((d,), dtype), "ln_bias": jnp.zeros((d,), dtype),
        },
        "proj_out": {"w": out_w, "b": out_b},
    }
    if cfg.ofs_embed_dim is not None:
        od = cfg.ofs_embed_dim
        assert od == cfg.time_embed_dim, \
            "ofs embedding is added to temb: dims must match"
        o_w1, o_b1 = _dense_init(next(keys), od, od, dtype)
        o_w2, o_b2 = _dense_init(next(keys), od, od, dtype)
        tree["ofs_embed"] = {"w1": o_w1, "b1": o_b1, "w2": o_w2, "b2": o_b2}
    return tree


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _ada_modulate(
    x: jnp.ndarray,
    enc: jnp.ndarray,
    temb: jnp.ndarray,
    norm_p: Params,
    eps: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """CogVideoXLayerNormZero: LN + per-stream shift/scale; returns gates too."""
    ada = _linear(jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype),
                  norm_p["w"], norm_p["b"]).astype(jnp.float32)
    shift, scale, gate, e_shift, e_scale, e_gate = jnp.split(ada, 6, axis=-1)
    x_n = layer_norm(x, norm_p["ln_scale"], norm_p["ln_bias"], eps)
    x_n = (x_n.astype(jnp.float32) * (1 + scale[:, None]) + shift[:, None]).astype(x.dtype)
    e_n = layer_norm(enc, norm_p["ln_scale"], norm_p["ln_bias"], eps)
    e_n = (e_n.astype(jnp.float32) * (1 + e_scale[:, None]) + e_shift[:, None]).astype(enc.dtype)
    return x_n, e_n, gate[:, None], e_gate[:, None]


def use_fixed_max_default() -> bool:
    """Fixed-softmax-max attention default (disable with
    AETHER_ATTN_FIXED_MAX=0).

    The DiT's attention is always QK-normalized, which is exactly the
    precondition for the kernel's a-priori score bound (see
    ``ops/flash_attention.py::_flash_kernel_fixed_max``) — ON by default
    after the on-chip sweep measured 36.2 ms vs 38.1 at the 48h x 15k x 64
    window (BASELINE.md round 2). NOTE: this is resolved at TRACE time —
    jitted callers must read it outside jit and pass ``fixed_max`` explicitly
    (the pipeline does), or a cached executable silently ignores later env
    toggles.
    """
    import os

    return os.environ.get("AETHER_ATTN_FIXED_MAX", "1") == "1"


def use_qk_int8_default() -> bool:
    """Env-gated int8 QK^T matmul inside the fixed-max flash kernel
    (``AETHER_ATTN_QK8``, see ``ops/flash_attention.py``). ON by default:
    the on-chip sweep measured 31.6 ms vs 36.0 at the 48h x 15k x 64 window,
    and the full-config quality gate (42L x 3072, one denoise step, see
    ``scripts/quant_quality_gate.py`` + BASELINE.md) measured int8_w8a8_qk8
    cosine 0.99992 vs bf16 — indistinguishable from int8_w8a8 without qk8
    (0.99992), i.e. the per-head-group int8 quantization of the QK-normed
    q/k adds no measurable output drift. Disable with AETHER_ATTN_QK8=0.
    Same trace-time caveat as :func:`use_fixed_max_default`: jitted callers
    must resolve it outside jit and pass ``qk_int8`` explicitly (the
    pipeline does)."""
    import os

    return os.environ.get("AETHER_ATTN_QK8", "1") == "1"


def use_pv_int8_default() -> bool:
    """Env-gated int8 PV matmul (``AETHER_ATTN_PV8``, see
    ``ops/flash_attention.py::_flash_kernel_pv8``): quantizes the softmax
    weights so BOTH attention matmuls ride the int8 MXU. Default OFF: the
    on-chip sweep measured it SLOWER (39.7 vs 31.75 ms at the 48h x 15k x 64
    window — the kernel is VPU-bound at head_dim 64 and the extra per-score
    quantization work outweighs the MXU saving; BASELINE.md fourth sweep).
    Kept as a bench/deployment knob for shapes where the balance differs.
    Same trace-time caveat as :func:`use_fixed_max_default`."""
    import os

    return os.environ.get("AETHER_ATTN_PV8", "0") == "1"


def use_fused_qkv_default() -> bool:
    """Env-gated fused attention prologue (``AETHER_ATTN_FUSED``, see
    ``ops/attn_prologue.py``): QK-norm + RoPE + per-(head-group, tile) int8
    quantization + v ones-column packing collapse into one Pallas pass
    feeding the flash kernel pre-packed operands — the ~0.2 s/step of
    inter-kernel glue the round-2 bisect measured (BASELINE.md) disappears.
    ON by default wherever the fixed-max flash kernel runs; disable with
    AETHER_ATTN_FUSED=0. Same trace-time caveat as
    :func:`use_fixed_max_default`."""
    import os

    return os.environ.get("AETHER_ATTN_FUSED", "1") == "1"


def block_scan_unroll_default() -> int:
    """Env-gated unroll factor for the 42-block ``lax.scan``
    (``AETHER_BLOCK_UNROLL``, default 1).

    The round-5 DiT-step trace (``scripts/profile_dit_step.py``) measured the
    in-graph int8 matmul fusions at 161-188 TF/s vs 271 TF/s for the SAME
    shapes isolated (``scripts/bench_w8a8_matmul.py``) — the gap is the
    per-iteration weight dynamic-slices serializing with compute inside the
    scan body. Unrolling lets XLA prefetch iteration i+1's weight slices
    under iteration i's compute. Trace-time knob: jitted callers resolve it
    outside jit (the pipeline does)."""
    import os

    try:
        return max(1, int(os.environ.get("AETHER_BLOCK_UNROLL", "1")))
    except ValueError:
        return 1


def _qkv_fused_projection(x, attn_p, a8: bool, shards: int = 1):
    """q/k/v projections as one wide matmul; returns (xq, xk, xv), or the
    un-split fused activation when ``shards > 1``.

    ``shards``: number of tp shards the output's last axis will be split
    over. The fused columns are interleaved per shard —
    ``[q_0 | k_0 | v_0 | q_1 | k_1 | v_1 | ...]`` — so that under a
    ``P(..., 'tp')`` sharding each chip's contiguous column block is exactly
    its own (q, k, v) head slices and the split happens shard-locally inside
    the attention shard_map (no cross-chip relayout). With ``shards == 1``
    this degenerates to plain [q | k | v] and the split happens here.

    Supports the plain-array and weight-quantized ({"q", "s"}) leaf layouts;
    falls back to three matmuls when the leaf kinds are mixed (e.g. a
    partially-converted tree).
    """
    qw, kw, vw = attn_p["q_w"], attn_p["k_w"], attn_p["v_w"]
    d = qw["s"].shape[-1] if isinstance(qw, dict) else qw.shape[-1]

    def interleave(q, k, v):
        # columns -> (shards, d/shards) blocks -> [q_s | k_s | v_s] per shard
        parts = [a.reshape(*a.shape[:-1], shards, d // shards)
                 for a in (q, k, v)]
        return jnp.concatenate(parts, axis=-1).reshape(
            *q.shape[:-1], 3 * d)

    if isinstance(qw, dict) and isinstance(kw, dict) and isinstance(vw, dict) \
            and qw["q"].dtype == kw["q"].dtype == vw["q"].dtype:
        w = {"q": interleave(qw["q"], kw["q"], vw["q"]),
             "s": interleave(qw["s"], kw["s"], vw["s"])}
    elif not (isinstance(qw, dict) or isinstance(kw, dict)
              or isinstance(vw, dict)):
        w = interleave(qw, kw, vw)
    else:
        if shards > 1:
            return None  # caller falls back to three sharded matmuls
        return (_linear(x, qw, attn_p["q_b"], a8),
                _linear(x, kw, attn_p["k_b"], a8),
                _linear(x, vw, attn_p["v_b"], a8))
    b = interleave(attn_p["q_b"], attn_p["k_b"], attn_p["v_b"])
    y = _linear(x, w, b, a8)
    if shards > 1:
        return y
    return y[..., :d], y[..., d:2 * d], y[..., 2 * d:]


def _fused_qkv_attention(
    x: jnp.ndarray,
    attn_p: Params,
    rope_cos,
    rope_sin,
    cfg,
    mesh,
    interpret: bool,
    a8: bool,
    qk_int8: bool,
    s_valid: Optional[int] = None,
) -> jnp.ndarray:
    """[B, S, D_model] joint stream -> attention output [B, S, D_model] via
    the fused prologue path (``ops/attn_prologue.py``).

    Under a ('dp', 'tp') mesh the WHOLE projection->prologue->kernel chain is
    ``shard_map``'d with the model axis of xq/xk/xv on 'tp': heads are
    contiguous blocks of the projection output's last axis, so the Megatron
    column-sharded qkv outputs land on each chip already holding exactly its
    own heads — the prologue and kernel run shard-local with zero
    collectives, and the output's 'tp'-sharded last axis feeds the
    row-sharded o-projection directly (no head-axis relayout at all).
    """
    from aether_tpu.ops.attn_prologue import fused_joint_attention

    nh, hd = cfg.num_heads, cfg.head_dim
    fn = functools.partial(
        fused_joint_attention,
        eps=cfg.qk_norm_eps,
        quantize=qk_int8,
        interpret=interpret,
        s_valid=s_valid,
    )

    has_rope = rope_cos is not None

    def _local(xq, xk, xv, gq, bq, gk, bk, *ropes):
        nh_loc = xq.shape[-1] // hd
        rc, rs = ropes if has_rope else (None, None)
        return fn(xq, xk, xv, gq, bq, gk, bk, rc, rs,
                  num_heads=nh_loc, head_dim=hd)

    norms = (attn_p["norm_q_scale"], attn_p["norm_q_bias"],
             attn_p["norm_k_scale"], attn_p["norm_k_bias"])
    ropes = (rope_cos, rope_sin) if has_rope else ()

    tp = mesh.shape.get("tp", 1) if mesh is not None else 1
    dp = mesh.shape.get("dp", 1) if mesh is not None else 1
    head_axis = "tp" if tp > 1 and nh % tp == 0 else None
    batch_axis = "dp" if dp > 1 and x.shape[0] % dp == 0 else None
    if head_axis is None and batch_axis is None:
        # single-chip: run q/k/v as ONE [D, 3D] matmul — the int8 MXU runs
        # N=9216 at ~226 TF/s vs ~144 at N=3072 (measured,
        # scripts/bench_w8a8_matmul.py), and the dynamic act quantization of
        # x happens once instead of three times. The per-layer weight concat
        # is a ~28 MB int8 copy (~0.04 ms) against a ~2.2 ms matmul saving.
        xq, xk, xv = _qkv_fused_projection(x, attn_p, a8)
        return _local(xq, xk, xv, *norms, *ropes)

    from jax.sharding import PartitionSpec as P

    spec = P(batch_axis, None, head_axis)
    rep = tuple(P(*(None,) * a.ndim) for a in norms + ropes)

    if head_axis is not None:
        # tp: the same single fused matmul, with the fused columns
        # INTERLEAVED per shard ([q_0|k_0|v_0|q_1|k_1|v_1|...]) so each
        # chip's contiguous P(..., 'tp') block is exactly its own q/k/v head
        # slices — per-shard the matmul is 3x wider than three separate
        # column shards (the width effect above), and the split back to
        # q/k/v happens shard-locally inside the shard_map.
        y = _qkv_fused_projection(x, attn_p, a8, shards=tp)
        if y is not None:
            from jax.sharding import NamedSharding

            y = jax.lax.with_sharding_constraint(
                y, NamedSharding(mesh, spec))

            def _local_fused(y_s, gq, bq, gk, bk, *rps):
                dt = y_s.shape[-1] // 3
                return _local(y_s[..., :dt], y_s[..., dt:2 * dt],
                              y_s[..., 2 * dt:], gq, bq, gk, bk, *rps)

            return jax.shard_map(
                _local_fused, mesh=mesh, in_specs=(spec,) + rep,
                out_specs=spec, check_vma=False,
            )(y, *norms, *ropes)
        xq = _linear(x, attn_p["q_w"], attn_p["q_b"], a8)
        xk = _linear(x, attn_p["k_w"], attn_p["k_b"], a8)
        xv = _linear(x, attn_p["v_w"], attn_p["v_b"], a8)
    else:
        # dp-only mesh: the last axis is unsharded, so the plain fused
        # [D, 3D] matmul applies as-is
        xq, xk, xv = _qkv_fused_projection(x, attn_p, a8)
    return jax.shard_map(
        _local, mesh=mesh, in_specs=(spec, spec, spec) + rep, out_specs=spec,
        check_vma=False,
    )(xq, xk, xv, *norms, *ropes)


def _sharded_flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, mesh, interpret: bool,
    fixed_max: bool = False, qk_int8: bool = False, pv_int8: bool = False,
) -> jnp.ndarray:
    """Partition the Pallas flash kernel over a ('dp', 'tp'[, 'sp']) mesh.

    ``pallas_call`` is an opaque custom call to GSPMD: without this wrapper the
    tp-sharded q/k/v (heads split by the Megatron qkv projections) would be
    all-gathered and the full attention would run replicated on every chip.
    ``shard_map`` splits the heads axis across 'tp' (48 heads / tp=8 = 6 per
    chip) and the batch axis across 'dp' when divisible, so each chip runs the
    kernel on exactly its own heads — zero collectives, attention scales
    linearly with tp. Head-count divisibility is required for 'tp' (the 48-head
    flagship divides any pow2 tp <= 16); otherwise that axis stays replicated.

    'sp' (sequence/context parallelism, for scaling past tp=heads onto pods)
    additionally splits the QUERY token axis: each shard all-gathers K/V over
    'sp' (one ICI collective per attention) and runs its q-stripe against the
    full sequence — exact, composes with dp x tp, and the S^2 attention FLOPs
    scale 1/sp per chip. The token axis is padded to an sp multiple; padded
    q rows are sliced off on return and padded K/V rows are excluded exactly
    via the kernel's ``kv_valid`` mask.
    """
    from jax.sharding import PartitionSpec as P

    b, nh, seq = q.shape[0], q.shape[1], q.shape[2]
    tp = mesh.shape.get("tp", 1)
    dp = mesh.shape.get("dp", 1)
    sp = mesh.shape.get("sp", 1)
    head_axis = "tp" if tp > 1 and nh % tp == 0 else None
    batch_axis = "dp" if dp > 1 and b % dp == 0 else None
    seq_axis = "sp" if sp > 1 else None
    if head_axis is None and batch_axis is None and seq_axis is None:
        return flash_attention(q, k, v, interpret=interpret,
                               fixed_max=fixed_max, qk_int8=qk_int8,
                               pv_int8=pv_int8)
    if seq_axis is None:
        spec = P(batch_axis, head_axis, None, None)
        fn = functools.partial(flash_attention, interpret=interpret,
                               fixed_max=fixed_max, qk_int8=qk_int8,
                               pv_int8=pv_int8)
        return jax.shard_map(
            fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )(q, k, v)

    seq_pad = -(-seq // sp) * sp
    if seq_pad != seq:
        pad = ((0, 0), (0, 0), (0, seq_pad - seq), (0, 0))
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    spec = P(batch_axis, head_axis, seq_axis, None)

    # AETHER_SP_RING=1 swaps the all-gather for ring attention: K/V stripes
    # rotate via single-hop ppermutes (S/sp per-shard K/V memory, transfers
    # overlapped with per-stripe kernels) and the fixed-max family's shared
    # score bound makes the cross-stripe merge pure addition — see
    # ops/flash_attention.py::ring_attention. Exact vs the gathered path;
    # gather stays the default pending an on-chip A/B. Env is read at trace
    # time (like use_fixed_max_default) so one process picks one path.
    import os

    if (os.environ.get("AETHER_SP_RING", "0") == "1" and fixed_max
            and not pv_int8):
        from aether_tpu.ops.flash_attention import ring_attention

        def _sp_attention(q_s, k_s, v_s):
            return ring_attention(q_s, k_s, v_s, "sp", sp,
                                  n_pad=seq_pad - seq, interpret=interpret,
                                  qk_int8=qk_int8)
    else:
        def _sp_attention(q_s, k_s, v_s):
            k_full = jax.lax.all_gather(k_s, "sp", axis=2, tiled=True)
            v_full = jax.lax.all_gather(v_s, "sp", axis=2, tiled=True)
            return flash_attention(q_s, k_full, v_full, interpret=interpret,
                                   fixed_max=fixed_max, qk_int8=qk_int8,
                                   pv_int8=pv_int8,
                                   kv_valid=seq if seq_pad != seq else None)

    out = jax.shard_map(
        _sp_attention, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=spec, check_vma=False,
    )(q, k, v)
    return out[:, :, :seq] if seq_pad != seq else out


def _sp_token_constraint(x: jnp.ndarray, mesh) -> jnp.ndarray:
    """Pin the token axis (axis 1 of [B, S, D]) to 'sp' under a 3-axis mesh.

    The shard_map'd attention already splits the token axis, but without
    these constraints GSPMD is free to leave every token-wise op outside it
    (qkv/MLP projections, norms, adaLN residuals) REPLICATED over 'sp' —
    attention would scale with sp while the other half of the FLOPs does
    not. Megatron-style sequence parallelism: activations carry P(dp, sp)
    on (batch, tokens) with weights sharded over 'tp', so every projection
    computes only its token stripe x its weight shard. No-op when the mesh
    has no sp axis (the 2-axis (dp, tp) path is untouched).
    """
    if mesh is None or mesh.shape.get("sp", 1) <= 1:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = mesh.shape.get("dp", 1)
    batch_axis = "dp" if dp > 1 and x.shape[0] % dp == 0 else None
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(batch_axis, "sp", None))
    )


def _sp_concat_tokens(enc: jnp.ndarray, hid: jnp.ndarray, mesh) -> jnp.ndarray:
    """Concatenate the text and video streams along tokens under an sp mesh
    without involuntary SPMD rematerialization.

    The operands arrive hidden-dim-sharded from the tp projections; the two
    token stripes also misalign (text_len is not a multiple of the sp shard),
    so GSPMD cannot produce the token-striped concat directly and falls back
    to "Involuntary full rematerialization" (spmd_partitioner.cc:652) — an
    unchosen all-gather inside the block scan, 42x per model call. Make that
    gather EXPLICIT instead: pin each operand to P(batch, None, None)
    (tokens/hidden replicated over sp — the all-gather happens once, here,
    where we chose it), concatenate (now free), then stripe tokens over 'sp'
    so every projection downstream computes only its stripe. No-op without
    an sp axis."""
    if mesh is None or mesh.shape.get("sp", 1) <= 1:
        return jnp.concatenate([enc, hid], axis=1)
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = mesh.shape.get("dp", 1)
    batch_axis = "dp" if dp > 1 and enc.shape[0] % dp == 0 else None
    rep = NamedSharding(mesh, P(batch_axis, None, None))
    enc = jax.lax.with_sharding_constraint(enc, rep)
    hid = jax.lax.with_sharding_constraint(hid, rep)
    return _sp_token_constraint(jnp.concatenate([enc, hid], axis=1), mesh)


def _fused_mesh_ok(mesh, nh: int, batch: int) -> bool:
    """A non-trivial mesh where neither 'tp' (heads divisible) nor 'dp'
    (batch divisible) qualifies must take the unfused
    ``_sharded_flash_attention`` path — the fused chain would otherwise run
    with no ``shard_map`` at all, leaving GSPMD to replicate the full
    attention per chip with no warning (advisor finding, round 3)."""
    if mesh is None:
        return True
    tp, dp = mesh.shape.get("tp", 1), mesh.shape.get("dp", 1)
    if tp <= 1 and dp <= 1:
        return True
    return (tp > 1 and nh % tp == 0) or (dp > 1 and batch % dp == 0)


def _attention(
    attn_p: Params,
    hidden: jnp.ndarray,
    enc: jnp.ndarray,
    rope_cos: Optional[jnp.ndarray],
    rope_sin: Optional[jnp.ndarray],
    cfg: DiTConfig,
    attn_impl: str,
    a8: bool = False,
    mesh=None,
    fixed_max: bool = False,
    qk_int8: bool = False,
    pv_int8: bool = False,
    fused_qkv: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    text_len = enc.shape[1]
    nh, hd = cfg.num_heads, cfg.head_dim
    s = text_len + hidden.shape[1]

    fused_ok = (
        fused_qkv and fixed_max and not pv_int8
        and attn_impl in ("flash", "flash_interpret")
        and hd < 128 and hd % 2 == 0
        and (mesh is None or mesh.shape.get("sp", 1) <= 1)
        and _fused_mesh_ok(mesh, nh, hidden.shape[0])
    )
    if fused_ok:
        # the token padding to the flash block multiple rides the joint-stream
        # concat for free (one copy), and the qkv matmuls run over the padded
        # rows (~2% extra MXU at the 15k window — cheaper than three separate
        # 92 MB pad passes on the projection outputs)
        from aether_tpu.ops.attn_prologue import _pick_pad_and_block

        s_pad = _pick_pad_and_block(s, 1024)[0]
        parts = [enc, hidden]
        if s_pad != s:
            parts.append(jnp.zeros(
                (hidden.shape[0], s_pad - s, hidden.shape[-1]), hidden.dtype))
        x = jnp.concatenate(parts, axis=1)
        attn = _fused_qkv_attention(
            x, attn_p, rope_cos, rope_sin, cfg, mesh,
            attn_impl == "flash_interpret", a8, qk_int8, s_valid=s,
        )
        out = _linear(attn[:, :s], attn_p["o_w"], attn_p["o_b"], a8)
        return out[:, text_len:], out[:, :text_len]

    x = _sp_concat_tokens(enc, hidden, mesh)  # text first
    b, s, _ = x.shape

    def qkv(w, bias, norm_scale, norm_bias):
        y = _linear(x, w, bias, a8).reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
        return layer_norm(y, norm_scale, norm_bias, cfg.qk_norm_eps)

    q = qkv(attn_p["q_w"], attn_p["q_b"], attn_p["norm_q_scale"], attn_p["norm_q_bias"])
    k = qkv(attn_p["k_w"], attn_p["k_b"], attn_p["norm_k_scale"], attn_p["norm_k_bias"])
    v = _linear(x, attn_p["v_w"], attn_p["v_b"], a8).reshape(b, s, nh, hd).transpose(0, 2, 1, 3)

    if rope_cos is not None:
        # tables already span the joint stream (identity rotation on the text
        # prefix, see dit_forward) — no per-block split/concat of q/k
        q = apply_rotary_emb(q, rope_cos, rope_sin)
        k = apply_rotary_emb(k, rope_cos, rope_sin)

    if attn_impl in ("flash", "flash_interpret"):
        interpret = attn_impl == "flash_interpret"
        if mesh is not None:
            attn = _sharded_flash_attention(q, k, v, mesh, interpret,
                                            fixed_max, qk_int8, pv_int8)
        else:
            attn = flash_attention(q, k, v, interpret=interpret,
                                   fixed_max=fixed_max, qk_int8=qk_int8,
                                   pv_int8=pv_int8)
    elif attn_impl == "chunked":
        from aether_tpu.ops.chunked_attention import chunked_attention

        attn = chunked_attention(q, k, v)
    elif attn_impl == "flash_train":
        from aether_tpu.ops.chunked_attention import flash_attention_trainable

        attn = flash_attention_trainable(q, k, v)
    else:
        attn = attention_reference(q, k, v)

    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, nh * hd)
    out = _linear(attn, attn_p["o_w"], attn_p["o_b"], a8)
    return out[:, text_len:], out[:, :text_len]


def _patchify(
    x: jnp.ndarray, proj_w: jnp.ndarray, proj_b: jnp.ndarray, p: int,
    pt: Optional[int] = None,
) -> jnp.ndarray:
    """[B, F, C, H, W] -> [B, (F/pt)*(H/p)*(W/p), D] via reshape + matmul.

    CogVideoX-1.0 (``pt is None``): per-frame 2D patches; the token feature
    layout matches a torch Conv2d(k=p, s=p) with weight [D, C, p, p]:
    channel-major, then kernel rows, then kernel cols. CogVideoX-1.5
    (``pt`` set, reference pipeline branch at
    ``aetherv1_pipeline_cogvideox.py:320-332``): ``pt`` frames fold into the
    patch feature as (c, pt, p, p); F must be divisible by pt (the caller
    pads the latent clip).
    """
    b, f, c, h, w = x.shape
    hp, wp = h // p, w // p
    if pt is None:
        x = x.reshape(b, f, c, hp, p, wp, p)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6)  # (b, f, hp, wp, c, p, p)
        x = x.reshape(b, f * hp * wp, c * p * p)
    else:
        ft = f // pt
        x = x.reshape(b, ft, pt, c, hp, p, wp, p)
        x = x.transpose(0, 1, 4, 6, 3, 2, 5, 7)  # (b, ft, hp, wp, c, pt, p, p)
        x = x.reshape(b, ft * hp * wp, c * pt * p * p)
    return _linear(x, proj_w, proj_b)


def _unpatchify(
    tokens: jnp.ndarray, f: int, hp: int, wp: int, c_out: int, p: int,
    pt: Optional[int] = None,
) -> jnp.ndarray:
    """Inverse of :func:`_patchify`'s token layout after the output head:
    [B, T, (pt*)p*p*c_out] -> [B, F, c_out, hp*p, wp*p] (channel-major)."""
    b = tokens.shape[0]
    if pt is None:
        x = tokens.reshape(b, f, hp, wp, c_out, p, p)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6)  # (b, f, c, hp, p, wp, p)
        return x.reshape(b, f, c_out, hp * p, wp * p)
    ft = f // pt
    x = tokens.reshape(b, ft, hp, wp, c_out, pt, p, p)
    x = x.transpose(0, 1, 5, 4, 2, 6, 3, 7)  # (b, ft, pt, c, hp, p, wp, p)
    return x.reshape(b, f, c_out, hp * p, wp * p)


def dit_forward(
    params: Params,
    cfg: DiTConfig,
    hidden_states: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,
    timestep: jnp.ndarray,
    rope_cos: Optional[jnp.ndarray] = None,
    rope_sin: Optional[jnp.ndarray] = None,
    attn_impl: str = "flash",
    remat: bool = False,
    ofs: Optional[jnp.ndarray] = None,
    act_quant: bool = False,
    mesh=None,
    collect_blocks: bool = False,
    fixed_max: Optional[bool] = None,
    qk_int8: Optional[bool] = None,
    pv_int8: Optional[bool] = None,
    fused_qkv: Optional[bool] = None,
    block_scan=None,
    block_unroll: Optional[int] = None,
) -> jnp.ndarray:
    """Denoiser forward.

    ``mesh``: optional ('dp', 'tp') ``jax.sharding.Mesh``. When set and
    ``attn_impl`` is a flash variant, the Pallas attention kernel is
    ``shard_map``-partitioned over the mesh (heads on 'tp', batch on 'dp') so
    tensor parallelism reaches inside the opaque kernel — see
    :func:`_sharded_flash_attention`. All other ops partition via GSPMD from
    the parameter shardings alone.

    ``remat=True`` rematerializes each block on the backward pass
    (``jax.checkpoint`` around the scanned block) — activation memory drops
    from O(layers) to O(1) blocks at ~1.3x backward FLOPs; required to train
    the 42-block model at 15k tokens.

    Args:
        hidden_states: [B, F, C_in, H_lat, W_lat] packed noisy+condition latents.
        encoder_hidden_states: [B, S_text, text_embed_dim] (the cached empty-prompt
            T5 embedding in the Aether pipeline).
        timestep: [B] diffusion timesteps.
        rope_cos / rope_sin: (S_video, head_dim) tables or None.
    Returns:
        [B, F, C_out, H_lat, W_lat] model prediction (v-prediction).
    """
    b, f, _, h, w = hidden_states.shape
    p = cfg.patch_size
    pt = cfg.patch_size_t
    hp, wp = h // p, w // p
    compute_dtype = hidden_states.dtype
    if fixed_max is None:
        # env fallback for direct (unjitted-arg) callers; the pipeline passes
        # the resolved value as a static jit arg so toggles take effect
        fixed_max = use_fixed_max_default()
    if qk_int8 is None:
        # the int8 QK^T path only exists inside the fixed-max kernel, so the
        # env default must not outlive an explicit AETHER_ATTN_FIXED_MAX=0
        qk_int8 = use_qk_int8_default() and fixed_max
    if pv_int8 is None:
        pv_int8 = use_pv_int8_default() and fixed_max
    if fused_qkv is None:
        fused_qkv = use_fused_qkv_default() and fixed_max and not pv_int8

    # 1. time embedding: sinusoid(hidden) -> MLP -> [B, time_embed_dim]
    t_emb = timestep_embedding(
        timestep, cfg.hidden_size, cfg.flip_sin_to_cos, cfg.freq_shift
    ).astype(compute_dtype)
    te = params["time_embed"]
    temb = _linear(jax.nn.silu(_linear(t_emb, te["w1"], te["b1"]).astype(jnp.float32))
                   .astype(compute_dtype), te["w2"], te["b2"])

    if cfg.ofs_embed_dim is not None:
        # CogVideoX-1.5 ofs conditioning: a second sinusoid+MLP embedding
        # added to the timestep embedding (reference reads ofs_embed_dim at
        # aetherv1_pipeline_cogvideox.py:728 and passes ofs=0 for I2V-style use)
        if ofs is None:
            ofs = jnp.zeros((hidden_states.shape[0],), jnp.float32)
        o_emb = timestep_embedding(
            ofs, cfg.ofs_embed_dim, cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(compute_dtype)
        oe = params["ofs_embed"]
        temb = temb + _linear(
            jax.nn.silu(_linear(o_emb, oe["w1"], oe["b1"]).astype(jnp.float32))
            .astype(compute_dtype), oe["w2"], oe["b2"])

    # 2. patch + text embedding
    pe = params["patch_embed"]
    video_tokens = _patchify(hidden_states, pe["proj_w"], pe["proj_b"], p, pt)
    text_tokens = _linear(
        encoder_hidden_states.astype(compute_dtype), pe["text_w"], pe["text_b"]
    )

    # Extend the video-token tables across the text prefix with the identity
    # rotation (cos=1, sin=0): one concat here instead of split/concat of the
    # 92 MB q/k tensors in every block (text tokens get no RoPE, reference
    # behavior per aetherv1_pipeline_cogvideox.py:865-875).
    text_len = text_tokens.shape[1]
    if rope_cos is not None:
        rc = jnp.concatenate(
            [jnp.ones((text_len, rope_cos.shape[-1]), jnp.float32),
             jnp.asarray(rope_cos, jnp.float32)], axis=0)
        rs = jnp.concatenate(
            [jnp.zeros((text_len, rope_sin.shape[-1]), jnp.float32),
             jnp.asarray(rope_sin, jnp.float32)], axis=0)
        if mesh is not None and mesh.shape.get("sp", 1) > 1:
            # Under an sp mesh, Shardy back-propagates a head_dim-sharded
            # placement onto this concat from the rotate-half arithmetic and
            # SPMD falls into "involuntary full rematerialization" per step.
            # The tables are a few MB — pin them replicated explicitly; the
            # per-block rope application re-shards its token stripe locally.
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            rc = jax.lax.with_sharding_constraint(rc, rep)
            rs = jax.lax.with_sharding_constraint(rs, rep)
    else:
        rc = rs = None

    # 3. transformer blocks under lax.scan over stacked params.
    # ``temb`` is an explicit argument (not a closure capture) so alternative
    # executors — ``parallel/pipeline.py``'s GPipe scheduler microbatches the
    # batch axis and must slice temb alongside the activations — can run the
    # SAME body: pp changes only the schedule, never the block math.
    def block_body(carry, block_p, temb):
        hid, enc = carry
        h_n, e_n, gate, e_gate = _ada_modulate(
            hid, enc, temb, block_p["norm1"], cfg.norm_eps
        )
        attn_h, attn_e = _attention(
            block_p["attn"], h_n, e_n, rc, rs, cfg, attn_impl, act_quant,
            mesh, fixed_max, qk_int8, pv_int8, fused_qkv
        )
        hid = hid + (gate * attn_h.astype(jnp.float32)).astype(hid.dtype)
        enc = enc + (e_gate * attn_e.astype(jnp.float32)).astype(enc.dtype)

        h_n, e_n, gate, e_gate = _ada_modulate(
            hid, enc, temb, block_p["norm2"], cfg.norm_eps
        )
        joint = _sp_concat_tokens(e_n, h_n, mesh)
        m = block_p["mlp"]
        ff = _linear(joint, m["w1"], m["b1"], act_quant)
        ff = jax.nn.gelu(ff.astype(jnp.float32), approximate=True).astype(ff.dtype)
        ff = _linear(ff, m["w2"], m["b2"], act_quant)
        text_len = enc.shape[1]
        hid = hid + (gate * ff[:, text_len:].astype(jnp.float32)).astype(hid.dtype)
        enc = enc + (e_gate * ff[:, :text_len].astype(jnp.float32)).astype(enc.dtype)
        # collect_blocks: per-block activation snapshots for layerwise parity
        # diffing against recorded torch goldens (tests only; y=None keeps the
        # production scan allocation-free)
        return (hid, enc), ((hid, enc) if collect_blocks else None)

    scanned_body = jax.checkpoint(block_body) if remat else block_body
    if block_scan is not None:
        # alternative execution schedule (pipeline parallelism): same body,
        # sharded/microbatched dispatch — see parallel/pipeline.py
        if collect_blocks:
            raise ValueError("collect_blocks is unsupported under block_scan")
        video_tokens, text_tokens = block_scan(
            scanned_body, (video_tokens, text_tokens), params["blocks"], temb
        )
        block_outs = None
    else:
        if block_unroll is None:
            block_unroll = block_scan_unroll_default()
        (video_tokens, text_tokens), block_outs = jax.lax.scan(
            lambda c, bp: scanned_body(c, bp, temb),
            (video_tokens, text_tokens),
            params["blocks"],
            unroll=block_unroll,
        )

    # 4. final norm over the joint stream, AdaLN on video part, project, unpatchify
    joint = jnp.concatenate([text_tokens, video_tokens], axis=1)
    nf = params["norm_final"]
    joint = layer_norm(joint, nf["scale"], nf["bias"], cfg.norm_eps)
    x = joint[:, text_tokens.shape[1]:]

    no = params["norm_out"]
    ada = _linear(jax.nn.silu(temb.astype(jnp.float32)).astype(compute_dtype),
                  no["w"], no["b"]).astype(jnp.float32)
    shift, scale = jnp.split(ada, 2, axis=-1)
    x = layer_norm(x, no["ln_scale"], no["ln_bias"], cfg.norm_eps)
    x = (x.astype(jnp.float32) * (1 + scale[:, None]) + shift[:, None]).astype(
        compute_dtype
    )
    x = _linear(x, params["proj_out"]["w"], params["proj_out"]["b"])

    out = _unpatchify(x, f, hp, wp, cfg.out_channels, p, pt)
    if collect_blocks:
        return out, block_outs
    return out
