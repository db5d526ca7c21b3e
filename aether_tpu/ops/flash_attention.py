"""Pallas TPU flash attention for the joint text+video DiT attention.

The Aether DiT attends over ~15k tokens (226 text + 14 850 video at 41f x 480p,
reference ``aetherv1_pipeline_cogvideox.py:535-542``) with head_dim 64 and no mask.
A (15k, 15k) score matrix per head would be ~450 MB — far beyond VMEM — so the
kernel tiles K/V with an online softmax (running max m, running sum l, unnormalized
accumulator) and never materializes scores.

Design notes (TPU):
- grid = (batch*heads, q_tiles, kv_tiles), kv innermost so the VMEM scratch
  (m, l, acc) persists across the kv reduction for one q tile.
- softmax statistics are lane-replicated (block_q, 128) f32 buffers; matmuls
  accumulate in f32 via preferred_element_type.
- normalization is deferred: acc holds sum(p @ v); divide by l once at the final
  kv tile.
- sequence padding to a block multiple is masked with a large negative score in
  the kv tiles that straddle the true length.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


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
    sm_scale: float,
    kv_len: int,
    block_k: int,
    num_kv_blocks: int,
):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (block_k, d)

    s = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, block_k)
    s = s * sm_scale

    # Mask out padded kv positions (no-op when nothing is padded).
    if kv_len < num_kv_blocks * block_k:
        col = kv_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_scratch[...]  # (block_q, 128) lane-replicated
    l_prev = l_scratch[...]

    m_curr = jnp.max(s, axis=1, keepdims=True)  # (block_q, 1)
    m_next = jnp.maximum(m_prev, m_curr)  # (block_q, 128)
    alpha = jnp.exp(m_prev - m_next)

    p = jnp.exp(s - m_next[:, :1])  # (block_q, block_k)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    m_scratch[...] = m_next
    l_scratch[...] = l_next

    v = v_ref[0]  # (block_k, d)
    o_curr = jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )  # (block_q, d)
    acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + o_curr

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l_final = l_scratch[...][:, :1]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    sm_scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over [B, H, S, D]; full (non-causal) attention.

    S is padded internally to a block multiple; padded keys are masked and padded
    query rows are sliced away on return.
    """
    batch, heads, seq, dim = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / (dim**0.5)

    block_q = min(block_q, max(128, 1 << (seq - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (seq - 1).bit_length()))

    pad_q = (-seq) % block_q
    pad_k = (-seq) % block_k
    pad = max(pad_q, pad_k)
    # pad both q and kv to a common padded length divisible by both blocks
    seq_pad = seq + pad
    if seq_pad % block_q:
        seq_pad += block_q - seq_pad % block_q
    if seq_pad % block_k:
        seq_pad += block_k - seq_pad % block_k

    def _pad(x):
        if seq_pad == seq:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, seq_pad - seq), (0, 0)))

    qp, kp, vp = _pad(q), _pad(k), _pad(v)
    bh = batch * heads
    qp = qp.reshape(bh, seq_pad, dim)
    kp = kp.reshape(bh, seq_pad, dim)
    vp = vp.reshape(bh, seq_pad, dim)

    num_q_blocks = seq_pad // block_q
    num_kv_blocks = seq_pad // block_k

    kernel = functools.partial(
        _flash_kernel,
        sm_scale=sm_scale,
        kv_len=seq,
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, seq_pad, dim), q.dtype),
        grid=(bh, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, dim), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, dim), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, dim), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dim), lambda b, qi, ki: (b, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * seq_pad * seq_pad * dim,
            bytes_accessed=3 * bh * seq_pad * dim * q.dtype.itemsize
            + bh * seq_pad * dim * q.dtype.itemsize,
            transcendentals=bh * seq_pad * seq_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp)

    out = out.reshape(batch, heads, seq_pad, dim)
    if seq_pad != seq:
        out = out[:, :, :seq]
    return out
