"""Chunked (memory-efficient, differentiable) attention: forward parity with
the reference implementation and gradient parity with naive attention."""

import jax
import jax.numpy as jnp
import numpy as np

from aether_tpu.ops.chunked_attention import chunked_attention
from aether_tpu.ops.flash_attention import attention_reference


def _rand_qkv(key, b=1, h=2, s=37, d=16):
    kq, kk, kv = jax.random.split(key, 3)
    shape = (b, h, s, d)
    return (jax.random.normal(kq, shape, jnp.float32),
            jax.random.normal(kk, shape, jnp.float32),
            jax.random.normal(kv, shape, jnp.float32))


def test_forward_matches_reference_with_padding():
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), s=37)  # 37 % 16 != 0: pad path
    ref = attention_reference(q, k, v)
    out = chunked_attention(q, k, v, block_k=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_forward_single_block_and_exact_multiple():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), s=32)
    ref = attention_reference(q, k, v)
    for block in (8, 32, 1024):  # multiple blocks, exact fit, oversized
        out = chunked_attention(q, k, v, block_k=block)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_gradients_match_naive_attention():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), s=24, d=8)

    def loss_chunked(q, k, v):
        return jnp.sum(jnp.square(chunked_attention(q, k, v, block_k=8)))

    def loss_naive(q, k, v):
        return jnp.sum(jnp.square(attention_reference(q, k, v)))

    g_c = jax.grad(loss_chunked, argnums=(0, 1, 2))(q, k, v)
    g_n = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for gc, gn, name in zip(g_c, g_n, "qkv"):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gn),
                                   atol=5e-4, rtol=5e-4, err_msg=name)


def test_dit_forward_with_chunked_attention():
    from aether_tpu.config import DiTConfig
    from aether_tpu.models.dit import dit_forward, init_dit_params
    from aether_tpu.models.rope import prepare_rotary_positional_embeddings

    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    f, h, w = 2, 8, 12
    hidden = jax.random.normal(jax.random.PRNGKey(1),
                               (1, f, cfg.in_channels, h, w), jnp.float32)
    text = jnp.zeros((1, cfg.max_text_seq_length, cfg.text_embed_dim))
    cos, sin = prepare_rotary_positional_embeddings(cfg, h * 8, w * 8, f, fps=12)
    args = (hidden, text, jnp.array([500]), jnp.asarray(cos), jnp.asarray(sin))
    out_x = dit_forward(params, cfg, *args, attn_impl="xla")
    out_c = dit_forward(params, cfg, *args, attn_impl="chunked")
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_x),
                               atol=1e-4, rtol=1e-4)
