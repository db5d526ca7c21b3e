"""Memory-efficient differentiable attention (online softmax over K/V blocks).

Training at the full 15k-token window cannot materialize the (S, S) score
matrix (~450 MB/head in f32), and the Pallas flash kernel
(:mod:`aether_tpu.ops.flash_attention`) has no backward rule. This is the
differentiable counterpart: a ``lax.scan`` over K/V blocks carrying the online
softmax statistics (running max, running sum, unnormalized accumulator), with
``jax.checkpoint`` on the block body so autodiff rematerializes each block's
probabilities instead of saving them — peak memory O(S·D + block²) in both
passes (the Rabe-Staats/flash recurrence, expressed in pure JAX so XLA
differentiates it).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_k"))
def chunked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    sm_scale: Optional[float] = None,
    block_k: int = 1024,
) -> jnp.ndarray:
    """Full (non-causal) attention over [B, H, S, D] without an (S, S) buffer."""
    batch, heads, seq, dim = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / (dim**0.5)

    block_k = min(block_k, max(seq, 1))
    pad = (-seq) % block_k
    if pad:
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    else:
        kp, vp = k, v
    n_blocks = kp.shape[2] // block_k
    # (n_blocks, B, H, block_k, D)
    kb = jnp.moveaxis(
        kp.reshape(batch, heads, n_blocks, block_k, dim), 2, 0
    )
    vb = jnp.moveaxis(
        vp.reshape(batch, heads, n_blocks, block_k, dim), 2, 0
    )
    if pad:
        valid = jnp.arange(n_blocks * block_k) < seq
        valid = jnp.moveaxis(valid.reshape(n_blocks, block_k)[:, None, None],
                             0, 0)  # (n_blocks, 1, 1, block_k)
    else:
        valid = jnp.ones((n_blocks, 1, 1, block_k), bool)

    qf = q.astype(jnp.float32) * sm_scale

    @jax.checkpoint
    def body(carry, blk):
        m_prev, l_prev, acc = carry
        k_blk, v_blk, valid_blk = blk
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, k_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(valid_blk[..., None, :], s, -jnp.inf)
        m_curr = jnp.max(s, axis=-1)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[..., None])
        l_next = alpha * l_prev + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return (m_next, l_next, acc), None

    init = (
        jnp.full((batch, heads, seq), -jnp.inf, jnp.float32),
        jnp.zeros((batch, heads, seq), jnp.float32),
        jnp.zeros((batch, heads, seq, dim), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(
        body, init, (kb, vb, jnp.broadcast_to(valid, (n_blocks, 1, 1, block_k)))
    )
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(q.dtype)


@jax.custom_vjp
def flash_attention_trainable(q, k, v):
    """Differentiable attention with the Pallas flash kernel on the forward.

    The Pallas kernel has no backward rule; the VJP here is the autodiff of
    :func:`chunked_attention` (the same exact softmax, so the gradient is the
    true gradient of the forward up to float error). Forward speed of the
    tuned kernel, backward memory profile of the blockwise scan.
    """
    from aether_tpu.ops.flash_attention import flash_attention

    return flash_attention(q, k, v)


def _fat_fwd(q, k, v):
    from aether_tpu.ops.flash_attention import flash_attention

    return flash_attention(q, k, v), (q, k, v)


def _fat_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: chunked_attention(a, b, c), q, k, v)
    return vjp(g)


flash_attention_trainable.defvjp(_fat_fwd, _fat_bwd)
