"""Pallas TPU flash attention for the joint text+video DiT attention.

The Aether DiT attends over ~15k tokens (226 text + 14 850 video at 41f x 480p,
reference ``aetherv1_pipeline_cogvideox.py:535-542``) with head_dim 64 and no mask.
A (15k, 15k) score matrix per head would be ~450 MB — far beyond VMEM — so the
kernel tiles K/V with an online softmax (running max m, running sum l, unnormalized
accumulator) and never materializes scores.

Design notes (TPU, measured on v5e at the 48-head 15k-token window):
- grid = (batch*heads/hper, q_tiles, kv_tiles), kv innermost so the VMEM
  scratch (m, l, acc) persists across the kv reduction for one q tile.
- ``hper`` heads are processed per grid cell with batched matmuls: same MXU
  work, 1/hper the grid cells — per-cell overhead amortizes. Measured ~14%
  faster at hper=4, 1024x1024 blocks than single-head 1536x1536 (39.7 vs
  45.7 ms in-run), which in turn beat single-head 1024x1024 (49.5 ms).
- softmax runs in base 2: sm_scale*log2(e) is folded into q OUTSIDE the kernel
  (one S*d elementwise pass instead of an S^2 multiply per cell).
- padded kv positions are masked with a large negative score (one iota+select
  pass per cell, ~1 ms at this shape — a mask-free variant that zero-pads K/V
  and corrects the softmax denominator at store time measured the same within
  noise, but breaks when every real score underflows exp2 while padding pins
  the running max at 0, so the robust mask stays). Predicating the mask on
  the last kv block via ``lax.cond`` DOUBLED the kernel time on v5e (Mosaic
  handles value-returning conditionals terribly: 40 -> 79 ms measured) and
  was also WRONG whenever lcm(block_q, block_k) > block_k spreads padding
  over several kv blocks — the experiment was removed.
- the softmax denominator rides the PV matmul by default (``denom="mxu"``):
  v is packed [v | ones | zeros] into a 128-lane-aligned tile so ``p @ v_ext``
  emits [o | sum(p)] in one MXU pass — N <= 128 costs the same as N = 64 at
  head_dim 64, and the separate l-scratch + VPU sum-reduce disappear.
  Measured 38.2 vs 40.2 ms. A dim+1-lane tile instead of 128 is
  catastrophically misaligned (130-byte rows, ~2x slower).
- the scratch needs the per-kernel VMEM limit raised above the 16 MB default
  (hper=4 s/p tiles are 16 MB each in f32).
- matmuls accumulate in f32 via preferred_element_type; with head_dim 64 both
  MXU matmuls run at 50% lane utilization, so the roofline for this shape is
  ~2x the bf16 peak-FLOPs time (~28 ms; the kernel runs ~38, vs 44.4 for the
  jax-bundled flash kernel and 47.5 for splash attention at this shape).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
_LOG2E = 1.4426950408889634


def attention_reference(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, sm_scale: Optional[float] = None
) -> jnp.ndarray:
    """Plain XLA attention, fp32 softmax. Shapes [B, H, S, D]."""
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * sm_scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def _flash_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    kv_len: int,
    block_k: int,
    num_kv_blocks: int,
    dim: int,
    denom: str,
):
    """Online-softmax attention cell. Two static tuning knobs:

    ``denom="mxu"``: the softmax DENOMINATOR rides the PV matmul — v carries a
    ones column at lane ``dim`` inside a 128-lane-aligned tile (see caller),
    so ``p @ v_ext`` yields [o | sum(p)] in one MXU pass (N <= 128 costs the
    same as N=64) and the separate l-scratch + VPU sum-reduce pass disappear;
    the l column obeys the same ``acc*alpha + new`` recurrence as o.
    ``denom="vpu"`` keeps the classic separate l accumulator.

    """
    kv_idx = pl.program_id(2)
    mxu_denom = denom == "mxu"

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)
        if not mxu_denom:
            l_scratch[...] = jnp.zeros_like(l_scratch)

    q = q_ref[...]  # (hper, block_q, d), pre-scaled by sm_scale*log2(e)
    k = k_ref[...]  # (hper, block_k, d)

    s = jax.lax.dot_general(
        q,
        k,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (hper, block_q, block_k), log2-domain scores

    # Mask out padded kv positions (no-op when nothing is padded).
    if kv_len < num_kv_blocks * block_k:
        col = (kv_idx * block_k
               + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2))
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_scratch[...]  # (hper, block_q, 128) lane-replicated
    m_curr = jnp.max(s, axis=2, keepdims=True)  # (hper, block_q, 1)
    m_next = jnp.maximum(m_prev, m_curr)  # (hper, block_q, 128)
    alpha = jnp.exp2(m_prev - m_next)
    m_scratch[...] = m_next

    p = jnp.exp2(s - m_next[:, :, :1])  # (hper, block_q, block_k)
    if not mxu_denom:
        l_scratch[...] = alpha * l_scratch[...] + jnp.sum(p, axis=2,
                                                          keepdims=True)

    v = v_ref[...]  # (hper, block_k, d) or 128-lane [v | ones | 0] when mxu
    o_curr = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    acc_scratch[...] = acc_scratch[...] * alpha[:, :, :1] + o_curr

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        acc = acc_scratch[...]
        if mxu_denom:
            l_final = acc[:, :, dim : dim + 1]
        else:
            l_final = l_scratch[...][:, :, :1]
        l_inv = jnp.where(l_final <= 0.0, 1.0, 1.0 / l_final)
        o_ref[...] = (acc[:, :, :dim] * l_inv).astype(o_ref.dtype)


def _flash_kernel_fixed_max(
    mmax_ref,
    scale_ref,
    q_ref,
    k_ref,
    v_ref,
    *rest,
    kv_len: int,
    block_k: int,
    num_kv_blocks: int,
    dim: int,
    noshift: bool = False,
    qk_int8: bool = False,
    unnormalized: bool = False,
):
    """Fixed-softmax-max attention cell (``fixed_max=True`` path).

    When an a-priori upper bound m on every score is available (the caller
    computes the Cauchy-Schwarz bound max_row||q|| * max_row||k|| per head
    group — tight enough for QK-NORMALIZED attention, see
    :func:`flash_attention`), the online-softmax machinery collapses:
    ``p = exp2(s - m)`` needs no running max, no alpha rescale, no m-scratch
    RMW — the only per-element VPU work left on the score tile is one exp2.
    Softmax is shift-invariant, so any valid upper bound gives the exact
    result as long as ``row_max - m`` stays above exp2's underflow (~-126):
    guaranteed when the bound is within ~100 of the true row max, which
    QK-norm enforces by construction. Denominator rides the PV matmul
    (128-lane [v | ones | 0] tile).

    No kv-padding mask either: without a running max, padded (zero) k rows
    merely produce a harmless p = 2^-m weight, and the caller zero-pads BOTH
    the v rows AND their ones-column, so padded rows contribute exactly
    nothing to the numerator or the denominator. (The online-max kernel
    cannot do this: zero-padding pins its running max at 0 and underflows
    every real score when they are all very negative.)

    ``noshift=True`` goes one step further and drops the shift altogether:
    ``p = exp2(s)``. Softmax is shift-invariant, so the 2^-m factor cancels
    exactly in the numerator/denominator ratio — the shift exists ONLY to
    keep exp2 inside the f32/bf16 exponent range. When the caller's score
    bound itself is < ~96 (log2 domain; always true under QK-norm), every
    weight lies in [2^-96, 2^96] and the f32 accumulator tops out below
    2^{96+log2(S)} << 2^128, so no shift is needed and the per-score VPU
    work drops to the single exp2 (the broadcast subtract pass disappears).

    ``qk_int8=True`` runs the QK^T matmul on the int8 MXU path (2x the bf16
    peak on v5e): the caller quantizes q and k per head-group with a
    symmetric max-abs scale, the kernel's dot accumulates in int32, and one
    scalar-prefetched per-cell factor (scale_q * scale_k * sm_scale * log2e)
    restores log2-domain scores before the exp2. Under QK-norm every row of
    q/k has near-identical magnitude (layer_norm pins the row norm), so a
    per-head-group scale loses almost nothing vs per-row — and the scalar
    multiply fuses into the exp2 pipeline instead of an S^2 outer-product
    rescale.
    """
    if unnormalized:
        o_ref, l_ref, acc_scratch = rest
    else:
        o_ref, acc_scratch = rest
        l_ref = None
    kv_idx = pl.program_id(2)
    del kv_len, block_k  # padding handled via the zeroed ones-column

    @pl.when(kv_idx == 0)
    def _init():
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[...]  # (hper, block_q, d), pre-scaled by sm_scale*log2(e)
    k = k_ref[...]  # (hper, block_k, d)

    s = jax.lax.dot_general(
        q,
        k,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32 if qk_int8 else jnp.float32,
    )  # (hper, block_q, block_k), log2-domain scores (int8: raw i32 dots)

    if qk_int8:
        s = s.astype(jnp.float32) * scale_ref[pl.program_id(0)]

    if noshift:
        p = jnp.exp2(s)  # (hper, block_q, block_k)
    else:
        p = jnp.exp2(s - mmax_ref[pl.program_id(0)])

    v = v_ref[...]  # (hper, block_k, 128): [v | ones | 0]
    acc_scratch[...] += jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        acc = acc_scratch[...]
        l_final = acc[:, :, dim : dim + 1]
        if unnormalized:
            # ring/sequence-parallel merge path: emit the RAW numerator and
            # denominator (both in the shared 2^-m scale) — partials from
            # other kv stripes computed under the SAME fixed max just add
            o_ref[...] = acc[:, :, :dim].astype(o_ref.dtype)
            l_ref[...] = l_final
        else:
            l_inv = jnp.where(l_final <= 0.0, 1.0, 1.0 / l_final)
            o_ref[...] = (acc[:, :, :dim] * l_inv).astype(o_ref.dtype)


def _flash_kernel_pv8(
    mmax_ref,
    scale_ref,
    vscale_ref,
    q_ref,
    k_ref,
    v_ref,
    bias_ref,
    o_ref,
    m_scratch,
    acc_scratch,
    *,
    num_kv_blocks: int,
    dim: int,
    qk_int8: bool,
    has_bias: bool,
):
    """Full-int8 attention cell (``pv_int8=True`` path): BOTH matmuls ride
    the int8 MXU (2x the bf16 peak on v5e).

    The PV matmul cannot reuse the fixed-max trick: the per-head-group
    Cauchy-Schwarz bound is loose per ROW (a row whose true max score sits g
    below the bound has all its weights crushed to 2^-g, which dies at int8
    granularity). So this kernel brings back an online running max — but
    quantized to INTEGERS (``ceil`` of the block row max), which makes the
    accumulator rescale ``alpha = 2^(m_prev - m_next)`` an exact power of two
    and pins the row-max weight in (0.5, 1]: ``p8 = rint(127 * exp2(s - m))``
    always keeps >= 6.5 significant bits below each row's true max.

    v is quantized per head-group (symmetric max-abs, scale prefetched in
    ``vscale_ref``); its ones column is EXACTLY 127, so every shared quant
    factor cancels in the numerator/denominator ratio at store time and one
    per-group ``vscale`` multiply restores the output magnitude.

    Padded kv columns are zero int8 k rows -> score 0, which would pin the
    running max at 0 and underflow rows whose true max is negative. The
    caller therefore passes a per-column additive bias (0 valid / -1e9
    padded, ``has_bias``), folded into the scores before the max — one
    broadcast VPU add, measurably cheaper than an iota+select mask pass, and
    it also zeroes the padded weights outright.

    ``mmax_ref`` (the fixed-max bound) is unused here but kept in the
    scalar-prefetch signature so the fixed-max kernel family shares one
    pallas_call scaffold.
    """
    del mmax_ref
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        # -1e9 (not -inf): alpha = exp2(m_prev - m_next) must not produce
        # inf - inf = nan on the first block
        m_scratch[...] = jnp.full_like(m_scratch, -1e9)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[...]  # (hper, block_q, d) int8 (qk_int8) or pre-scaled bf16
    k = k_ref[...]  # (hper, block_k, d)

    s = jax.lax.dot_general(
        q,
        k,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32 if qk_int8 else jnp.float32,
    )  # (hper, block_q, block_k)
    if qk_int8:
        s = s.astype(jnp.float32) * scale_ref[pl.program_id(0)]
    if has_bias:
        s = s + bias_ref[...][:, None, :]  # (1, block_k) ref -> broadcast

    m_prev = m_scratch[...]  # (hper, block_q, 128) lane-replicated, integer
    m_curr = jnp.ceil(jnp.max(s, axis=2, keepdims=True))  # (hper, block_q, 1)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)  # exact: integer exponent
    m_scratch[...] = m_next

    p = jnp.exp2(s - m_next[:, :, :1])  # in (0, 1]
    p8 = jnp.rint(p * 127.0).astype(jnp.int8)

    v = v_ref[...]  # (hper, block_k, 128) int8: [v*127/av | 127 | 0]
    pv = jax.lax.dot_general(
        p8,
        v,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    acc_scratch[...] = acc_scratch[...] * alpha[:, :, :1] + pv

    vscale = vscale_ref[pl.program_id(0)]  # read outside pl.when (interpret)

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        acc = acc_scratch[...]
        l_final = acc[:, :, dim : dim + 1]
        l_inv = jnp.where(l_final <= 0.0, 1.0, 1.0 / l_final)
        # num/den = sum(p v)/(av * sum(p)) -> one vscale multiply restores av
        o_ref[...] = (acc[:, :, :dim] * l_inv * vscale).astype(o_ref.dtype)


def _vmem_limit_bytes(
    block_q: int, block_k: int, hper: int, dim: int, itemsize: int
) -> int:
    """Derive the per-kernel VMEM budget from the actual tile footprint.

    Previously hard-coded to 110 MB for the default (1024, 1024, hper=4, d=64)
    shape; callers passing bigger blocks or more heads per cell silently ran
    past it. Accounted buffers: double-buffered q/k/v/o pipeline tiles, the f32
    scores/probs intermediate (the dominant term: hper*block_q*block_k), and
    the m/l/acc scratch. The 2.55x headroom factor calibrates the default shape
    to the 110 MB budget measured working on v5e (Mosaic materializes masks,
    broadcasts and select temporaries beyond the named buffers); oversized
    configurations now fail loudly at compile time instead of overflowing a
    fixed cap.
    """
    io_tiles = 2 * (block_q + 2 * block_k + block_q) * hper * dim * itemsize
    s_and_p = 2 * hper * block_q * block_k * 4
    scratch = hper * block_q * (128 + 128 + dim) * 4
    return int((io_tiles + s_and_p + scratch) * 2.55)


def _pick_block(seq: int, requested: int) -> int:
    """Block size <= requested (multiple of 128).

    Bigger blocks amortize per-cell overhead (measured: 1024 blocks beat
    smaller ones at the 15k window), so keep the requested size unless its
    padding waste is egregious; then fall back to the candidate with the
    least padding (ties -> larger block).
    """
    if seq <= requested:
        # single tile: round the whole sequence up to a 128 multiple
        return max(128, -(-seq // 128) * 128)
    pad = -(-seq // requested) * requested - seq
    if pad <= 0.15 * seq:
        return requested
    best, best_pad = 128, float("inf")
    for cand in range(128, requested + 1, 128):
        pad = -(-seq // cand) * cand - seq
        if pad <= best_pad:
            best, best_pad = cand, pad
    return best


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "block_q", "block_k", "heads_per_cell",
                     "interpret", "denom", "fixed_max", "noshift", "kv_valid",
                     "qk_int8", "pv_int8", "unnormalized"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    sm_scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 1024,
    heads_per_cell: int = 4,
    interpret: bool = False,
    denom: str = "mxu",
    fixed_max: bool = False,
    noshift: Optional[bool] = False,
    kv_valid: Optional[int] = None,
    qk_int8: bool = False,
    pv_int8: bool = False,
    score_bound: Optional[jnp.ndarray] = None,
    unnormalized: bool = False,
):
    """Flash attention over q [B, H, Sq, D] x k/v [B, H, Skv, D]; full
    (non-causal) attention. Sq == Skv for self-attention; Sq < Skv is the
    sequence-parallel path (each shard's q stripe against the gathered full
    K/V).

    ``kv_valid``: treat only the first ``kv_valid`` key/value rows as real
    (the tail is caller-side padding, e.g. the gathered KV of a
    sequence-parallel shard whose global length was padded to the shard
    count). Padded k/v rows are zeroed in the wrapper and masked exactly in
    both kernels; queries are NOT truncated (the caller slices its own
    padded q rows).

    Sq and Skv are padded independently to block_q / block_k multiples;
    padded keys are masked and padded query rows are sliced away on return.
    ``heads_per_cell`` is clamped to the largest divisor of B*H not exceeding
    it. ``denom`` is a kernel tuning knob (see :func:`_flash_kernel`); a
    lax.cond-predicated "mask only the last kv block" experiment was REMOVED —
    it doubled kernel time on v5e (Mosaic value-returning cond) and was wrong
    whenever lcm(block_q, block_k) > block_k spreads padding over several kv
    blocks.

    ``fixed_max=True`` replaces the online running max with a per-head-group
    Cauchy-Schwarz score bound computed outside the kernel — exact for
    QK-NORMALIZED attention (bounded scores), where the bound sits well
    within exp2's underflow margin of every row max; do NOT use it for
    unnormalized q/k whose score range is unbounded (an adversarial gap
    > ~100 between the bound and a row's max underflows that row's weights).
    See :func:`_flash_kernel_fixed_max`.

    ``noshift`` (fixed_max only) drops even the fixed shift: ``p = exp2(s)``
    raw, the 2^-m factor cancelling in the normalization. Valid whenever the
    score bound itself is < ~96 in the log2 domain. ``None`` picks
    automatically at RUNTIME via ``lax.cond`` on the already-computed bound;
    ``True``/``False`` force one branch. Default ``False``: the on-chip A/B
    at the 48h x 15k x 64 window measured the subtract-free kernel ~1 ms
    SLOWER (36.9 vs 35.5 ms) — the broadcast scalar subtract rides the exp2
    pipeline for free on v5e, so the shifted kernel stays the default and
    noshift remains a bench knob only.

    ``qk_int8`` (fixed_max only) quantizes q and k symmetrically per
    head-group (max-abs / 127) and runs QK^T on the int8 MXU path (2x bf16
    peak on v5e); the dequantization factor rides the same scalar-prefetch
    channel as the score bound. APPROXIMATE: per-element score error is
    ~0.5% of the group score bound — comparable to the bf16 input rounding
    already present, and safe for QK-NORMALIZED q/k whose rows all share the
    same magnitude (layer_norm pins row norms, so one scale per group is as
    good as per-row). Do not use for unnormalized q/k with wildly uneven
    row magnitudes.

    ``pv_int8`` (fixed_max only; composes with qk_int8 for the full-int8
    cell) additionally quantizes the softmax weights to int8 and runs the PV
    matmul on the int8 MXU — see :func:`_flash_kernel_pv8` for why this
    brings back an (integer-quantized) running max and a per-column padding
    bias. APPROXIMATE at the ~1/254-of-row-max weight granularity;
    ``noshift`` is ignored on this path (the integer running max IS the
    shift).
    """
    if qk_int8 and not fixed_max:
        raise ValueError("qk_int8 requires fixed_max=True (the int8 "
                         "dequantization rides the fixed-max scalar prefetch)")
    if pv_int8 and not fixed_max:
        raise ValueError("pv_int8 requires fixed_max=True (it shares the "
                         "fixed-max family's scalar-prefetch scaffold)")
    if pv_int8 and not qk_int8:
        # bf16-QK^T + int8-PV reproducibly SIGABRTs the Mosaic compiler on
        # v5e (observed 2026-08, with both 1-D and 2-D bias layouts) and is
        # a pointless combination anyway — the full-int8 cell is the only
        # deployment shape for this kernel
        raise ValueError("pv_int8 requires qk_int8=True (the mixed "
                         "bf16-QK/int8-PV cell crashes the TPU compiler)")
    if (score_bound is not None or unnormalized) and (not fixed_max or pv_int8):
        raise ValueError("score_bound / unnormalized are fixed-max-family "
                         "options (the ring/sequence-parallel merge relies "
                         "on every stripe sharing one softmax shift; the "
                         "pv_int8 cell re-derives its own integer max)")
    batch, heads, q_len, dim = q.shape
    kv_len_in = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / (dim**0.5)

    kv_len_eff = kv_len_in if kv_valid is None else min(kv_valid, kv_len_in)
    if kv_len_eff < kv_len_in:
        # zero the caller-padding tail so the fixed-max path's numerator and
        # score bound ignore it (its ones-column entry is zeroed below; the
        # online-max kernel additionally masks the scores by kv_len)
        kv_mask = (jnp.arange(kv_len_in) < kv_len_eff)[None, None, :, None]
        k = jnp.where(kv_mask, k, jnp.zeros((), k.dtype))
        v = jnp.where(kv_mask, v, jnp.zeros((), v.dtype))

    block_q = _pick_block(q_len, block_q)
    block_k = _pick_block(kv_len_in, block_k)

    bh = batch * heads
    hper = max(h for h in range(1, min(heads_per_cell, bh) + 1) if bh % h == 0)

    # log2-domain softmax with the scale folded into q (int8 path: the fold
    # cannot ride an int8 tensor, so it rides the per-group dequant scalar)
    if not qk_int8:
        q = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q.dtype)

    # q and kv pad independently (they need not share a length: the
    # sequence-parallel path runs a q stripe against the full gathered K/V)
    q_pad_len = -(-q_len // block_q) * block_q
    kv_pad_len = -(-kv_len_in // block_k) * block_k

    def _pad_to(x, target):
        cur = x.shape[2]
        if target == cur:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, target - cur), (0, 0)))

    qp = _pad_to(q, q_pad_len).reshape(bh, q_pad_len, dim)
    kp = _pad_to(k, kv_pad_len).reshape(bh, kv_pad_len, dim)
    dim_v = dim
    if dim >= 128:
        # no spare lane for the ones column in a 128-lane tile: fall back to
        # the VPU denominator (fixed_max and qk_int8 depend on the mxu layout)
        if unnormalized:
            raise ValueError("unnormalized (ring merge) needs the mxu "
                             "ones-column denominator, unavailable at "
                             "head_dim >= 128")
        denom = "vpu"
        fixed_max = False
        qk_int8 = False
        pv_int8 = False
    if fixed_max:
        denom = "mxu"  # the fixed-max kernel always uses the ones-column l
    if denom == "mxu":
        # [v | ones | zeros] padded to a full 128-lane tile (a dim+1 tile is
        # catastrophically misaligned: 130-byte rows; measured 2x slowdown).
        # The PV matmul then emits [o | sum(p)] in the same MXU pass (N <= 128
        # costs the same as N=64 at head_dim 64). The ones column is built
        # BEFORE seq padding, so padded kv rows carry a ZERO there: with
        # fixed_max that alone excludes them from the denominator (no mask
        # pass in the kernel at all); the online-max kernel masks their
        # scores to _NEG_INF anyway.
        dim_v = 128
        if pv_int8:
            # per-head-group symmetric max-abs quantization of v; the ones
            # column is EXACTLY 127 so every shared quant factor cancels in
            # the num/den ratio and one vscale multiply at store restores
            # the magnitude (see _flash_kernel_pv8)
            vscales = jnp.maximum(
                jnp.max(jnp.abs(v.astype(jnp.float32)), axis=(2, 3))
                .reshape(bh // hper, hper).max(axis=-1), 1e-30)
            rv = jnp.repeat(127.0 / vscales, hper).reshape(
                batch, heads, 1, 1)
            v = jnp.rint(v.astype(jnp.float32) * rv).astype(jnp.int8)
            ones_val = jnp.full((), 127, jnp.int8)
        else:
            vscales = None
            ones_val = jnp.ones((), v.dtype)
        if kv_len_eff < kv_len_in:
            valid = (jnp.arange(kv_len_in) < kv_len_eff)[None, None, :, None]
            ones_col = jnp.where(valid, ones_val, jnp.zeros((), v.dtype))
        else:
            ones_col = jnp.broadcast_to(ones_val, (1, 1, 1, 1))
        ones_col = jnp.broadcast_to(ones_col, (*v.shape[:-1], 1))
        v_ext = jnp.concatenate(
            [v, ones_col.astype(v.dtype),
             jnp.zeros((*v.shape[:-1], dim_v - dim - 1), v.dtype)], axis=-1
        )
        vp = _pad_to(v_ext, kv_pad_len).reshape(bh, kv_pad_len, dim_v)
    else:
        vp = _pad_to(v, kv_pad_len).reshape(bh, kv_pad_len, dim)

    num_q_blocks = q_pad_len // block_q
    num_kv_blocks = kv_pad_len // block_k

    # scaffolding shared by both kernels (any tuning change applies to both)
    out_shape = jax.ShapeDtypeStruct((bh, q_pad_len, dim), q.dtype)
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        vmem_limit_bytes=_vmem_limit_bytes(
            block_q, block_k, hper, dim, q.dtype.itemsize
        ),
    )
    cost_estimate = pl.CostEstimate(
        flops=4 * bh * q_pad_len * kv_pad_len * dim,
        bytes_accessed=(2 * bh * kv_pad_len * dim + 2 * bh * q_pad_len * dim)
        * q.dtype.itemsize,
        transcendentals=bh * q_pad_len * kv_pad_len,
    )

    def _finish(out):
        out = out.reshape(batch, heads, q_pad_len, dim)
        return out[:, :, :q_len] if q_pad_len != q_len else out

    if fixed_max:
        if score_bound is not None:
            # externally supplied bound (ring attention: the pmax-shared
            # global bound so every kv stripe's partials land in the same
            # 2^-m scale). Already in the folded log2 score domain.
            bounds = jnp.broadcast_to(
                jnp.asarray(score_bound, jnp.float32).reshape(()),
                (bh // hper,))
        else:
            # per-head-group score upper bound (log2 domain; the
            # sm_scale*log2e fold is already inside q on the bf16 path,
            # applied explicitly on the int8 path): max_row ||q|| *
            # max_row ||k|| over each grid cell's hper heads. Padded rows
            # are zero and cannot raise it.
            qn = jnp.sqrt(jnp.sum(jnp.square(qp.astype(jnp.float32)),
                                  axis=-1))
            kn = jnp.sqrt(jnp.sum(jnp.square(kp.astype(jnp.float32)),
                                  axis=-1))
            bounds = (jnp.max(qn, axis=-1) * jnp.max(kn, axis=-1)).reshape(
                bh // hper, hper
            ).max(axis=-1)  # (bh//hper,)

        if qk_int8:
            fold = sm_scale * _LOG2E
            if score_bound is None:
                bounds = bounds * fold
            # symmetric per-head-group max-abs quantization; the combined
            # dequant (scale_q * scale_k * sm_scale * log2e) prefetches as
            # one scalar per grid cell
            aq = jnp.maximum(
                jnp.max(jnp.abs(qp.astype(jnp.float32)), axis=(1, 2))
                .reshape(bh // hper, hper).max(axis=-1), 1e-30)
            ak = jnp.maximum(
                jnp.max(jnp.abs(kp.astype(jnp.float32)), axis=(1, 2))
                .reshape(bh // hper, hper).max(axis=-1), 1e-30)
            scales = aq * ak * (fold / (127.0 * 127.0))
            rq = jnp.repeat(127.0 / aq, hper)[:, None, None]
            rk = jnp.repeat(127.0 / ak, hper)[:, None, None]
            qp = jnp.rint(qp.astype(jnp.float32) * rq).astype(jnp.int8)
            kp = jnp.rint(kp.astype(jnp.float32) * rk).astype(jnp.int8)
        else:
            scales = jnp.ones_like(bounds)

        if pv_int8:
            has_bias = kv_pad_len > kv_len_eff
            kern = functools.partial(
                _flash_kernel_pv8,
                num_kv_blocks=num_kv_blocks,
                dim=dim,
                qk_int8=qk_int8,
                has_bias=has_bias,
            )
            in_specs = [
                pl.BlockSpec((hper, block_q, dim),
                             lambda b, qi, ki, *_: (b, qi, 0)),
                pl.BlockSpec((hper, block_k, dim),
                             lambda b, qi, ki, *_: (b, ki, 0)),
                pl.BlockSpec((hper, block_k, dim_v),
                             lambda b, qi, ki, *_: (b, ki, 0)),
            ]
            operands = [bounds, scales, vscales, qp, kp, vp]
            if has_bias:
                # 2-D (1, block_k) tile: the canonical TPU layout for a
                # per-column vector (1-D refs are a Mosaic rough edge)
                in_specs.append(
                    pl.BlockSpec((1, block_k), lambda b, qi, ki, *_: (0, ki)))
                operands.append(
                    jnp.where(jnp.arange(kv_pad_len) < kv_len_eff,
                              0.0, -1e9).astype(jnp.float32)[None, :])
            else:
                # keep the kernel arity fixed: splice a None bias_ref in
                inner = kern

                def kern(mm, sc, vs, qr, kr, vr, o, ms, acc,
                         _inner=inner):
                    _inner(mm, sc, vs, qr, kr, vr, None, o, ms, acc)

            out = pl.pallas_call(
                kern,
                out_shape=out_shape,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3,
                    grid=(bh // hper, num_q_blocks, num_kv_blocks),
                    in_specs=in_specs,
                    out_specs=pl.BlockSpec((hper, block_q, dim),
                                           lambda b, qi, ki, *_: (b, qi, 0)),
                    scratch_shapes=[
                        pltpu.VMEM((hper, block_q, 128), jnp.float32),
                        pltpu.VMEM((hper, block_q, dim_v), jnp.float32),
                    ],
                ),
                compiler_params=compiler_params,
                cost_estimate=cost_estimate,
                interpret=interpret,
            )(*operands)
            return _finish(out)

        def _run_fixed(ns: bool):
            o_spec = pl.BlockSpec((hper, block_q, dim),
                                  lambda b, qi, ki, *_: (b, qi, 0))
            if unnormalized:
                shapes = (out_shape,
                          jax.ShapeDtypeStruct((bh, q_pad_len, 1),
                                               jnp.float32))
                specs = (o_spec,
                         pl.BlockSpec((hper, block_q, 1),
                                      lambda b, qi, ki, *_: (b, qi, 0)))
            else:
                shapes, specs = out_shape, o_spec
            return pl.pallas_call(
                functools.partial(
                    _flash_kernel_fixed_max,
                    kv_len=kv_len_eff,
                    block_k=block_k,
                    num_kv_blocks=num_kv_blocks,
                    dim=dim,
                    noshift=ns,
                    qk_int8=qk_int8,
                    unnormalized=unnormalized,
                ),
                out_shape=shapes,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(bh // hper, num_q_blocks, num_kv_blocks),
                    # index maps receive the scalar-prefetch refs as trailing
                    # args
                    in_specs=[
                        pl.BlockSpec((hper, block_q, dim),
                                     lambda b, qi, ki, *_: (b, qi, 0)),
                        pl.BlockSpec((hper, block_k, dim),
                                     lambda b, qi, ki, *_: (b, ki, 0)),
                        pl.BlockSpec((hper, block_k, dim_v),
                                     lambda b, qi, ki, *_: (b, ki, 0)),
                    ],
                    out_specs=specs,
                    scratch_shapes=[
                        pltpu.VMEM((hper, block_q, dim_v), jnp.float32),
                    ],
                ),
                compiler_params=compiler_params,
                cost_estimate=cost_estimate,
                interpret=interpret,
            )(bounds, scales, qp, kp, vp)

        if unnormalized:
            # ring-merge path: ns is forced shifted (the caller's shared
            # bound IS the scale; noshift would put stripes on a different
            # scale than the caller's padding correction assumes)
            o, l = _run_fixed(False)
            o = _finish(o)
            l = l.reshape(batch, heads, q_pad_len, 1)
            if q_pad_len != q_len:
                l = l[:, :, :q_len]
            return o, l

        if noshift is None:
            # runtime auto-pick: exp2(s) raw stays in the f32/bf16 exponent
            # range iff every |score| < ~96 (bound is symmetric: |s| <=
            # ||q||*||k||). QK-normed attention always lands in the noshift
            # branch; adversarial unbounded inputs fall back to the shifted
            # kernel. Both branches compile once; cond picks per call.
            out = jax.lax.cond(
                jnp.max(bounds) < 96.0,
                lambda: _run_fixed(True),
                lambda: _run_fixed(False),
            )
        else:
            out = _run_fixed(noshift)
        return _finish(out)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel,
            kv_len=kv_len_eff,
            block_k=block_k,
            num_kv_blocks=num_kv_blocks,
            dim=dim,
            denom=denom,
        ),
        out_shape=out_shape,
        grid=(bh // hper, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((hper, block_q, dim), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((hper, block_k, dim), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((hper, block_k, dim_v), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((hper, block_q, dim),
                               lambda b, qi, ki: (b, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((hper, block_q, 128), jnp.float32),
            pltpu.VMEM((hper, block_q, 128), jnp.float32),
            pltpu.VMEM((hper, block_q, dim_v), jnp.float32),
        ],
        compiler_params=compiler_params,
        cost_estimate=cost_estimate,
        interpret=interpret,
    )(qp, kp, vp)
    return _finish(out)


def _flash_kernel_prepacked(
    mmax_ref,
    qsc_ref,
    ksc_ref,
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    acc_scratch,
    *,
    num_kv_blocks: int,
    dim: int,
    noshift: bool,
    qk_int8: bool,
):
    """Fixed-max cell over prologue-packed operands (``ops/attn_prologue.py``).

    Identical math to :func:`_flash_kernel_fixed_max`'s normalized path, but
    the int8 dequantization scale is per-(head-group, token-tile): the
    prologue quantizes q/k in tiles that coincide with this kernel's grid
    cells, so the rescale is ``qsc[b, qi] * ksc[b, ki]`` — two SMEM scalar
    prefetch reads and the same single fused scalar multiply as the
    group-scale path, at strictly finer quantization granularity.
    """
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[...]  # (hper, block_q, d) int8 or pre-folded float
    k = k_ref[...]  # (hper, block_k, d)

    s = jax.lax.dot_general(
        q,
        k,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32 if qk_int8 else jnp.float32,
    )
    if qk_int8:
        s = s.astype(jnp.float32) * (
            qsc_ref[pl.program_id(0), pl.program_id(1)]
            * ksc_ref[pl.program_id(0), kv_idx])

    if noshift:
        p = jnp.exp2(s)
    else:
        p = jnp.exp2(s - mmax_ref[pl.program_id(0)])

    v = v_ref[...]  # (hper, block_k, 128): [v | ones | 0]
    acc_scratch[...] += jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        acc = acc_scratch[...]
        l_final = acc[:, :, dim : dim + 1]
        l_inv = jnp.where(l_final <= 0.0, 1.0, 1.0 / l_final)
        o_ref[...] = (acc[:, :, :dim] * l_inv).astype(o_ref.dtype)


def flash_attention_prepacked(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v_ext: jnp.ndarray,
    *,
    qsc: jnp.ndarray,
    ksc: jnp.ndarray,
    qn: jnp.ndarray,
    kn: jnp.ndarray,
    dim: int,
    out_dtype,
    block_q: int = 1024,
    block_k: int = 1024,
    heads_per_cell: int = 4,
    noshift: Optional[bool] = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fixed-max flash attention over operands already packed by
    ``ops/attn_prologue.py::qkv_prologue`` — no padding, folding, packing or
    stat reductions here; the prologue kernel produced everything.

    Args:
        q / k: [B*H, S_pad, D] int8 (per-(group, tile) symmetric
            quantization) or a float dtype (then q carries the
            ``sm_scale*log2e`` fold and only the norms are used).
        qsc / ksc: [G, T] f32 per-(head-group, token-tile) dequantization
            scales, T tiles of ``block_q`` tokens; qsc includes the fold.
        qn / kn: [G, T] f32 per-(group, tile) L2-norm maxima (qn folded like
            qsc) — the softmax shift is the per-group Cauchy-Schwarz bound
            ``max_T(qn) * max_T(kn)``, exactly the unfused path's bound. The
            shift must track the true score RANGE within exp2's ~126-doubling
            underflow margin, so a looser absmax-derived bound (off by up to
            a factor of D in the exponent domain) is NOT acceptable here.
        v_ext: [B*H, S_pad, 128] ``[v | 1 | 0]`` MXU-denominator tile with
            padded rows fully zeroed (that alone excludes them from the
            softmax numerator AND denominator — no kv mask in the kernel).
    """
    bh, s_pad, _ = q.shape
    kv_pad = k.shape[1]
    qk_int8 = q.dtype == jnp.int8

    block_q = _pick_block(s_pad, block_q)
    block_k = _pick_block(kv_pad, block_k)
    if s_pad % block_q or kv_pad % block_k:
        raise ValueError(
            f"prepacked operands must tile exactly: {s_pad} % {block_q}, "
            f"{kv_pad} % {block_k}")
    num_q_blocks = s_pad // block_q
    num_kv_blocks = kv_pad // block_k
    if qk_int8 and (qsc.shape[-1] != num_q_blocks
                    or ksc.shape[-1] != num_kv_blocks):
        raise ValueError(
            "prologue tile count must match the kernel grid "
            f"(scales {qsc.shape[-1]}/{ksc.shape[-1]} vs blocks "
            f"{num_q_blocks}/{num_kv_blocks}) — pass the same block_q to "
            "qkv_prologue and flash_attention_prepacked")

    hper = max(h for h in range(1, min(heads_per_cell, bh) + 1) if bh % h == 0)
    if qsc.shape[0] != bh // hper:
        raise ValueError(
            f"prologue head-group count {qsc.shape[0]} != kernel's "
            f"{bh // hper} — pass the same heads_per_cell to both")

    # per-head-group Cauchy-Schwarz score bound (log2 domain; qn already
    # carries sm_scale*log2e)
    bounds = jnp.max(qn, axis=-1) * jnp.max(kn, axis=-1)

    out_shape = jax.ShapeDtypeStruct((bh, s_pad, dim), out_dtype)
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        vmem_limit_bytes=_vmem_limit_bytes(
            block_q, block_k, hper, dim, max(q.dtype.itemsize, 1)
        ),
    )
    cost_estimate = pl.CostEstimate(
        flops=4 * bh * s_pad * kv_pad * dim,
        bytes_accessed=(2 * bh * kv_pad * dim + 2 * bh * s_pad * dim)
        * q.dtype.itemsize,
        transcendentals=bh * s_pad * kv_pad,
    )

    def _run(ns: bool):
        return pl.pallas_call(
            functools.partial(
                _flash_kernel_prepacked,
                num_kv_blocks=num_kv_blocks,
                dim=dim,
                noshift=ns,
                qk_int8=qk_int8,
            ),
            out_shape=out_shape,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(bh // hper, num_q_blocks, num_kv_blocks),
                in_specs=[
                    pl.BlockSpec((hper, block_q, dim),
                                 lambda b, qi, ki, *_: (b, qi, 0)),
                    pl.BlockSpec((hper, block_k, dim),
                                 lambda b, qi, ki, *_: (b, ki, 0)),
                    pl.BlockSpec((hper, block_k, 128),
                                 lambda b, qi, ki, *_: (b, ki, 0)),
                ],
                out_specs=pl.BlockSpec((hper, block_q, dim),
                                       lambda b, qi, ki, *_: (b, qi, 0)),
                scratch_shapes=[
                    pltpu.VMEM((hper, block_q, 128), jnp.float32),
                ],
            ),
            compiler_params=compiler_params,
            cost_estimate=cost_estimate,
            interpret=interpret,
        )(bounds, qsc, ksc, q, k, v_ext)

    if noshift is None:
        return jax.lax.cond(
            jnp.max(bounds) < 96.0, lambda: _run(True), lambda: _run(False)
        )
    return _run(noshift)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    axis_size: int,
    sm_scale: Optional[float] = None,
    n_pad: int = 0,
    interpret: bool = False,
    qk_int8: bool = False,
    block_q: int = 1024,
    block_k: int = 1024,
    heads_per_cell: int = 4,
) -> jnp.ndarray:
    """Ring (sequence-parallel) flash attention: call INSIDE ``shard_map``.

    ``q``/``k``/``v`` are each shard's token stripe ``[B, H, S/axis_size, D]``
    of a sequence sharded over mesh axis ``axis_name``. Instead of
    all-gathering the full K/V (peak memory S*D per shard, one big collective
    up front — the default `'gather'` sp path in ``models/dit.py``), the K/V
    stripes ROTATE around the ring: ``axis_size - 1`` single-hop ``ppermute``
    steps over ICI, each overlapping the next stripe's transfer with the
    current stripe's kernel. Per-shard K/V memory stays S/axis_size * D.

    TPU-first merge trick: the fixed-max kernel family takes an a-priori
    score bound as the softmax shift, so sharing ONE bound across every
    stripe (``pmax`` of per-shard Cauchy-Schwarz bounds — one scalar
    collective) puts all per-stripe partial numerators/denominators in the
    SAME ``2^-m`` scale: merging is pure addition, none of the
    (max, rescale) bookkeeping classic ring attention needs. Exact for
    QK-normalized attention, like ``fixed_max`` itself.

    Sequence padding (``n_pad`` zero rows appended to the globally padded
    sequence, living in the LAST stripe) is corrected EXACTLY on the
    denominator: zeroed k rows score exactly 0, so across the full ring each
    q row accumulates precisely ``n_pad * 2^-bound`` of spurious denominator
    mass — one scalar subtraction removes it (their v rows are zero, so the
    numerator needs nothing). This avoids a per-stripe ``kv_valid`` that
    would have to vary with the runtime ring position.

    ``qk_int8`` composes: stripes quantize locally (the dequant scale rides
    scalar prefetch and is applied before the exp2, so per-stripe scales
    don't break the shared shift).

    Reference scaling context: the reference handles long sequences only
    algorithmically (sliding windows, SURVEY.md section 5 — no ring/Ulysses
    anywhere); this is new TPU-native capability, exact vs the gathered path.
    """
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)

    f32 = jnp.float32
    # per-shard Cauchy-Schwarz bound pieces: max row norm of the LOCAL q
    # stripe (q never moves) x the GLOBAL max k row norm (pmax, one scalar)
    nq = jnp.sqrt(jnp.max(jnp.sum(jnp.square(q.astype(f32)), axis=-1)))
    nk = jnp.sqrt(jnp.max(jnp.sum(jnp.square(k.astype(f32)), axis=-1)))
    gk = jax.lax.pmax(nk, axis_name)
    bound = nq * gk * (sm_scale * _LOG2E)  # folded log2 score domain

    num = jnp.zeros(q.shape[:3] + (q.shape[-1],), f32)
    den = jnp.zeros(q.shape[:3] + (1,), f32)
    perm = [(j, (j - 1) % axis_size) for j in range(axis_size)]
    k_cur, v_cur = k, v
    for step in range(axis_size):
        o_s, l_s = flash_attention(
            q, k_cur, v_cur, sm_scale=sm_scale, fixed_max=True,
            noshift=False, qk_int8=qk_int8, score_bound=bound,
            unnormalized=True, interpret=interpret, block_q=block_q,
            block_k=block_k, heads_per_cell=heads_per_cell,
        )
        num = num + o_s.astype(f32)
        den = den + l_s
        if step != axis_size - 1:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
    if n_pad:
        den = den - n_pad * jnp.exp2(-bound)
    den = jnp.where(den <= 0.0, 1.0, den)
    return (num / den).astype(q.dtype)
