"""Fused QKV attention prologue: one Pallas pass from projection outputs to
kernel-ready attention operands.

Motivation (measured, BASELINE.md round-2 glue bisect at the 42L x 3072 DiT,
41f x 480p window): ~56 ms/step of per-head QK LayerNorm (64-lane reductions at
~3x their HBM roofline) plus ~145 ms/step of fragmented glue — head-layout
transposes, int8 absmax/row-norm reductions, v ones-column packing,
inter-pallas_call gaps — sat between the qkv projections and the flash kernel.
XLA cannot fuse across the transpose or into the opaque ``pallas_call``, so
each of those ops was its own HBM round trip over the ~92 MB q/k/v tensors.

This module replaces all of it with ONE kernel per q/k/v triple whose grid is
ALIGNED with the flash kernel's: each cell covers the same ``heads_per_cell``
head group and one ``block_q``-sized token tile, and emits:

- q / k: QK LayerNorm -> 3D RoPE -> symmetric int8 quantization in the flash
  kernel's ``[B*H, S_pad, D]`` head-major layout. (The head-layout transpose
  itself stays one XLA pass: Mosaic requires block minor dims to be
  128-divisible or equal to the array dim, so a 64-lane block over the
  ``[B, S, H*D]`` projection output is not lowerable — the prologue consumes
  the transposed head-major view, where a 64-lane block equals the array's
  minor dim exactly, and fuses everything AFTER the transpose.)
- ONE lane-packed stat tile per cell (``[G, T, 128]``, lanes 0-3 = q scale,
  q norm-max, k scale, k norm-max): per-(head-group, token-tile)
  quantization scales — strictly finer than the unfused path's
  per-(head-group, full-sequence) scale — plus the tile norm maxima from
  which the wrapper takes the per-group Cauchy-Schwarz softmax shift. The
  flash kernel dequantizes with two SMEM scalars per grid cell (the same
  fused scalar multiply the unfused qk8 path uses, now tile-indexed).

  Stat layout matters enormously on TPU: a per-ROW ``[B*H, S_pad, 1]`` f32
  stat output was tried first and cost ~2 ms per tensor per layer — a
  1-lane-wide HBM array makes every store a 4-byte strided DMA. The
  lane-replicated ``(1, 1, 128)`` tile is one contiguous 512 B store.
  Likewise the softmax shift must use the tile NORM maxima, not an
  absmax-derived bound: sqrt(D)*absmax overestimates the row norm by up to
  sqrt(D) per side, and in the exp2 EXPONENT domain that inflates the shift
  past f32's ~126-doubling underflow margin, flushing every weight to zero.
- v: packed ``[v | 1 | 0]`` into the 128-lane MXU-denominator tile
  (``ops/flash_attention.py`` design note), with padded rows' value AND ones
  column zeroed so they drop out of both the numerator and denominator.

TPU-first tricks (vs a line-by-line translation of the reference's
``apply_rotary_emb`` / ``nn.LayerNorm`` graph, reference
``aetherv1_pipeline_cogvideox.py:865-875`` for the semantics):

- RoPE's interleaved pair rotation is computed as ``z*cos + (z @ R)*sin``
  where R is the constant pair-swap-and-negate matrix — a (S, D) @ (D, D)
  MXU matmul instead of strided even/odd lane shuffles, which Mosaic lays
  out poorly. The MXU is idle in this kernel anyway.
- the v ones-column is built by ``v @ E + 1[lane == D]`` with E = [I | 0]
  (D x 128) — again an MXU op instead of a lane-offset concatenate.

LayerNorm matches ``models/dit.py::layer_norm`` term for term (single-pass
moments around the row's first element) so the fused and unfused paths agree
to f32 rounding.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aether_tpu.ops.flash_attention import flash_attention_prepacked

_LOG2E = 1.4426950408889634


def _rope_swap_matrix(dim: int) -> np.ndarray:
    """R such that (z @ R)[2i] = -z[2i+1], (z @ R)[2i+1] = z[2i]."""
    r = np.zeros((dim, dim), np.float32)
    idx = np.arange(0, dim, 2)
    r[idx + 1, idx] = -1.0
    r[idx, idx + 1] = 1.0
    return r


def _v_embed_matrix(dim: int) -> np.ndarray:
    """E = [I | 0] (dim x 128): v @ E places v in the first ``dim`` lanes."""
    e = np.zeros((dim, 128), np.float32)
    e[np.arange(dim), np.arange(dim)] = 1.0
    return e


def _prologue_kernel(
    xq_ref,
    xk_ref,
    xv_ref,
    gq_ref,
    bq_ref,
    gk_ref,
    bk_ref,
    rot_ref,
    ev_ref,
    *rest,
    eps: float,
    fold: float,
    s_valid: int,
    block_s: int,
    quantize: bool,
    has_rope: bool,
    dim: int,
):
    if has_rope:
        cos_ref, sin_ref, q_out, k_out, v_out, stat_out = rest
    else:
        q_out, k_out, v_out, stat_out = rest
        cos_ref = sin_ref = None

    si = pl.program_id(1)
    rows = si * block_s + jax.lax.broadcasted_iota(
        jnp.int32, (1, block_s, 1), 1)
    valid = rows < s_valid  # (1, block_s, 1), broadcasts over heads/lanes

    if has_rope:
        cos = cos_ref[...]  # (block_s, dim) f32, pair-duplicated tables
        sin = sin_ref[...]
        rot = rot_ref[...]

    def _prep(x_ref, g_ref, b_ref, x_out, fold_val):
        x = x_ref[...].astype(jnp.float32)  # (hper, block_s, dim)
        # LayerNorm, identical formulation to models/dit.py::layer_norm
        y0 = x - x[:, :, :1]
        mean_y = jnp.mean(y0, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(y0 * y0, axis=-1, keepdims=True) - mean_y * mean_y, 0.0
        )
        z = (y0 - mean_y) * jax.lax.rsqrt(var + eps)
        z = z * g_ref[...] + b_ref[...]  # (1, dim) broadcasts over rows
        if has_rope:
            z = z * cos + jax.lax.dot_general(
                z, rot, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sin
        z = jnp.where(valid, z, 0.0)
        # tile-level stats over the whole (hper, block_s, dim) cell: the
        # quantization group is exactly one flash-kernel grid cell's q/k tile
        absmax = jnp.max(jnp.abs(z))
        normmax = jnp.sqrt(jnp.max(jnp.sum(z * z, axis=-1)))
        if quantize:
            r = jnp.where(absmax > 0.0, 127.0 / jnp.maximum(absmax, 1e-30),
                          0.0)
            x_out[...] = jnp.rint(z * r).astype(x_out.dtype)
        else:
            x_out[...] = (z * fold_val).astype(x_out.dtype)
        return absmax * (fold_val / 127.0), normmax * fold_val

    qs, qn = _prep(xq_ref, gq_ref, bq_ref, q_out, fold)
    ks, kn = _prep(xk_ref, gk_ref, bk_ref, k_out, 1.0)

    v = xv_ref[...].astype(jnp.float32)
    v = jnp.where(valid, v, 0.0)
    vext = jax.lax.dot_general(
        v, ev_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, vext.shape, 2)
    vext = vext + jnp.where((lane == dim) & valid, 1.0, 0.0)
    v_out[...] = vext.astype(v_out.dtype)

    # one contiguous 512 B lane-replicated store: lanes 0-3 carry
    # (q scale, q norm-max, k scale, k norm-max); everything else zero
    sl = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8, 128), 3)
    stat = jnp.where(sl == 0, qs, 0.0)
    stat = jnp.where(sl == 1, qn, stat)
    stat = jnp.where(sl == 2, ks, stat)
    stat = jnp.where(sl == 3, kn, stat)
    stat_out[...] = stat


def _pick_pad_and_block(s: int, block_q: int) -> Tuple[int, int]:
    """(s_pad, block) with ``s_pad % block == 0`` guaranteed.

    Base pad: flash-kernel-friendly 1024 multiples for long sequences (1024
    blocks measured fastest at the 15k window), minimal 128 multiples for
    short ones. ``_pick_block`` may then prefer a block that does NOT divide
    the base pad (its <=15%-waste early return keeps the requested size), so
    the final pad is rounded up to a block multiple — the extra rows are
    masked by ``s_valid`` like any other padding. Picking the block first and
    deriving the pad from it (rather than asserting divisibility after the
    fact) is what keeps mid-size joint sequence lengths (e.g. 1665-1792,
    2689-2944) from being untileable."""
    if s > 4096:
        base = -(-s // 1024) * 1024
    else:
        base = -(-s // 128) * 128
    from aether_tpu.ops.flash_attention import _pick_block

    block = _pick_block(base, block_q)
    s_pad = -(-base // block) * block
    return s_pad, block


def qkv_prologue(
    xq: jnp.ndarray,
    xk: jnp.ndarray,
    xv: jnp.ndarray,
    norm_q_scale: jnp.ndarray,
    norm_q_bias: jnp.ndarray,
    norm_k_scale: jnp.ndarray,
    norm_k_bias: jnp.ndarray,
    rope_cos: Optional[jnp.ndarray],
    rope_sin: Optional[jnp.ndarray],
    *,
    num_heads: int,
    head_dim: int,
    eps: float,
    sm_scale: Optional[float] = None,
    quantize: bool = True,
    block_q: int = 1024,
    heads_per_cell: int = 4,
    interpret: bool = False,
    s_valid: Optional[int] = None,
) -> Tuple[jnp.ndarray, ...]:
    """Fuse QK-norm + RoPE + int8 quantization + v ones-column packing into
    one Pallas pass whose grid mirrors the flash kernel's (``heads_per_cell``
    head group x ``block_q`` token tile).

    Args:
        xq / xk / xv: [B, S, H*D] projection outputs (bias already added).
        norm_*: (D,) per-head QK LayerNorm params (shared across heads, as in
            the checkpoint layout).
        rope_cos / rope_sin: (S, D) joint-stream tables (identity rows on the
            text prefix) or None.
        quantize: emit int8 q/k with per-(group, tile) scales; False emits
            ``xq.dtype`` q/k with the softmax fold pre-applied to q (stats
            still emitted — they carry the fixed-max score bound).
        s_valid: true token count when the caller pre-padded the inputs
            (rows >= s_valid are zeroed in every output, ones column
            included). Defaults to the input length S.

    Returns:
        (q, k, v_ext, qsc, qn, ksc, kn, s_pad) with q/k [B*H, S_pad, D] (int8
        or input dtype), v_ext [B*H, S_pad, 128] = [v | 1 | 0] with padded
        rows fully zeroed, and qsc/qn/ksc/kn [G, T] f32 per-(head-group,
        token-tile) dequantization scales / L2-norm maxima (G = B*H /
        heads_per_cell groups, T = S_pad / block_q tiles; q's stats include
        ``sm_scale * log2(e)``).
    """
    b, s, d_model = xq.shape
    nh, hd = num_heads, head_dim
    assert d_model == nh * hd, (d_model, nh, hd)
    if sm_scale is None:
        sm_scale = 1.0 / (hd**0.5)
    fold = sm_scale * _LOG2E
    if s_valid is None:
        s_valid = s

    bh = b * nh
    hper = max(h for h in range(1, min(heads_per_cell, bh) + 1) if bh % h == 0)
    # token tile = one flash q/k block, so the quantization group of every
    # flash grid cell is constant and its dequant scale is one SMEM scalar
    s_pad, block = _pick_pad_and_block(s, block_q)
    if s_pad % block:  # unreachable by construction; survives python -O
        raise ValueError(f"prologue pad {s_pad} not tileable by {block}")
    n_tiles = s_pad // block
    groups = bh // hper
    has_rope = rope_cos is not None

    def _to_head_major(x):
        # one XLA pass per tensor (pad rides it when s != s_pad); everything
        # downstream of this transpose is fused into the prologue kernel
        if x.shape[1] != s_pad:
            x = jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0)))
        return x.reshape(b, s_pad, nh, hd).transpose(0, 2, 1, 3).reshape(
            bh, s_pad, hd)

    xq, xk, xv = _to_head_major(xq), _to_head_major(xk), _to_head_major(xv)

    qk_dtype = jnp.int8 if quantize else xq.dtype

    x_spec = pl.BlockSpec((hper, block, hd), lambda g, si: (g, si, 0))
    vec_spec = pl.BlockSpec((1, hd), lambda g, si: (0, 0))
    operands = [
        xq,
        xk,
        xv,
        norm_q_scale.astype(jnp.float32).reshape(1, hd),
        norm_q_bias.astype(jnp.float32).reshape(1, hd),
        norm_k_scale.astype(jnp.float32).reshape(1, hd),
        norm_k_bias.astype(jnp.float32).reshape(1, hd),
        jnp.asarray(_rope_swap_matrix(hd)),
        jnp.asarray(_v_embed_matrix(hd)),
    ]
    in_specs = [
        x_spec,
        x_spec,
        x_spec,
        vec_spec,
        vec_spec,
        vec_spec,
        vec_spec,
        pl.BlockSpec((hd, hd), lambda g, si: (0, 0)),
        pl.BlockSpec((hd, 128), lambda g, si: (0, 0)),
    ]
    if has_rope:
        def _pad_table(t):
            t = jnp.asarray(t, jnp.float32)
            if t.shape[0] != s_pad:
                t = jnp.pad(t, ((0, s_pad - t.shape[0]), (0, 0)))
            return t

        operands += [_pad_table(rope_cos), _pad_table(rope_sin)]
        in_specs += [
            pl.BlockSpec((block, hd), lambda g, si: (si, 0)),
            pl.BlockSpec((block, hd), lambda g, si: (si, 0)),
        ]

    head_spec = pl.BlockSpec((hper, block, hd), lambda g, si: (g, si, 0))
    out_shapes = [
        jax.ShapeDtypeStruct((bh, s_pad, hd), qk_dtype),
        jax.ShapeDtypeStruct((bh, s_pad, hd), qk_dtype),
        jax.ShapeDtypeStruct((bh, s_pad, 128), xv.dtype),
        jax.ShapeDtypeStruct((groups, n_tiles, 8, 128), jnp.float32),
    ]
    out_specs = [
        head_spec,
        head_spec,
        pl.BlockSpec((hper, block, 128), lambda g, si: (g, si, 0)),
        pl.BlockSpec((1, 1, 8, 128), lambda g, si: (g, si, 0, 0)),
    ]

    kern = functools.partial(
        _prologue_kernel,
        eps=eps,
        fold=fold,
        s_valid=s_valid,
        block_s=block,
        quantize=quantize,
        has_rope=has_rope,
        dim=hd,
    )
    # every buffer is streamed once; the f32 intermediates dominate VMEM.
    # 3x headroom over the named buffers (Mosaic materializes broadcast /
    # select temporaries beyond them), 64 MB floor.
    vmem = int(
        (3 * hper * block * hd * xq.dtype.itemsize * 2
         + 2 * block * (hd + 128) * 4
         + 6 * hper * block * hd * 4
         + 2 * hper * block * 128 * xv.dtype.itemsize) * 3.0
    )
    q, k, v_ext, stats = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        grid=(groups, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=max(vmem, 64 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nh * s_pad * hd * (hd + 128),
            bytes_accessed=b * s_pad * nh * hd
            * (3 * xq.dtype.itemsize + 2 + 2 * xv.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)

    return (q, k, v_ext,
            stats[:, :, 0, 0], stats[:, :, 0, 1], stats[:, :, 0, 2],
            stats[:, :, 0, 3], s_pad)


def fused_joint_attention(
    xq: jnp.ndarray,
    xk: jnp.ndarray,
    xv: jnp.ndarray,
    norm_q_scale: jnp.ndarray,
    norm_q_bias: jnp.ndarray,
    norm_k_scale: jnp.ndarray,
    norm_k_bias: jnp.ndarray,
    rope_cos: Optional[jnp.ndarray],
    rope_sin: Optional[jnp.ndarray],
    *,
    num_heads: int,
    head_dim: int,
    eps: float,
    sm_scale: Optional[float] = None,
    quantize: bool = True,
    noshift: Optional[bool] = False,
    interpret: bool = False,
    block_q: int = 1024,
    block_k: int = 1024,
    heads_per_cell: int = 4,
    s_valid: Optional[int] = None,
) -> jnp.ndarray:
    """Projection outputs [B, S, H*D] -> attention output [B, S, H*D].

    ``qkv_prologue`` + ``flash_attention_prepacked`` + the head-merge
    epilogue. The QK-norm / RoPE / quantize / v-packing glue and the
    full-tensor stat reductions of the unfused path all disappear into the
    two kernels.
    """
    b, s, _ = xq.shape
    q, k, v_ext, qsc, qn, ksc, kn, s_pad = qkv_prologue(
        xq, xk, xv, norm_q_scale, norm_q_bias, norm_k_scale, norm_k_bias,
        rope_cos, rope_sin, num_heads=num_heads, head_dim=head_dim, eps=eps,
        sm_scale=sm_scale, quantize=quantize, block_q=block_q,
        heads_per_cell=heads_per_cell, interpret=interpret, s_valid=s_valid,
    )
    out = flash_attention_prepacked(
        q, k, v_ext, qsc=qsc, ksc=ksc, qn=qn, kn=kn, dim=head_dim,
        out_dtype=xq.dtype, block_q=block_q, block_k=block_k,
        heads_per_cell=heads_per_cell, noshift=noshift, interpret=interpret,
    )  # [B*H, S_pad, D]
    out = out.reshape(b, num_heads, s_pad, head_dim)
    if s_pad != s:
        out = out[:, :, :s]
    return out.transpose(0, 2, 1, 3).reshape(b, s, num_heads * head_dim)
