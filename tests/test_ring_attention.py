"""Ring (sequence-parallel) flash attention tests.

The ring path (``ops/flash_attention.py::ring_attention``) rotates K/V
stripes over the 'sp' mesh axis with single-hop ppermutes instead of
all-gathering the full K/V; a globally shared fixed-max score bound makes the
cross-stripe merge pure addition. The reference has no analogue (long
sequences are handled only by sliding windows, SURVEY.md section 5) — these
tests pin it exactly against unsharded attention on the 8-device CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from aether_tpu.ops.flash_attention import (
    attention_reference,
    flash_attention,
    ring_attention,
)
from aether_tpu.parallel.mesh import make_mesh


def _normed(rng, shape):
    """QK-norm-like rows (unit-ish norms) — the fixed-max family's domain."""
    x = rng.normal(size=shape)
    return jnp.asarray(x / np.linalg.norm(x, axis=-1, keepdims=True) * 3.0,
                       jnp.float32)


def test_unnormalized_recomposes_to_normalized():
    """(num, den) from unnormalized=True must divide back to the normalized
    output, and den must be positive."""
    rng = np.random.default_rng(0)
    shape = (1, 4, 320, 16)
    q, k = _normed(rng, shape), _normed(rng, shape)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)
    ref = flash_attention(q, k, v, block_q=128, block_k=128, fixed_max=True,
                          interpret=True)
    num, den = flash_attention(q, k, v, block_q=128, block_k=128,
                               fixed_max=True, unnormalized=True,
                               interpret=True)
    assert den.shape == (1, 4, 320, 1)
    assert np.all(np.asarray(den) > 0)
    np.testing.assert_allclose(np.asarray(num / den), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_score_bound_override_is_exact():
    """Any valid external bound gives the same output (softmax shift
    invariance) — the mechanism the ring's shared bound relies on."""
    rng = np.random.default_rng(1)
    shape = (1, 2, 256, 16)
    q, k = _normed(rng, shape), _normed(rng, shape)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)
    base = flash_attention(q, k, v, block_q=128, block_k=128,
                           fixed_max=True, interpret=True)
    for extra in (0.0, 7.5, 30.0):
        # a bound looser than the internal Cauchy-Schwarz one by `extra`
        nq = float(jnp.max(jnp.linalg.norm(q, axis=-1)))
        nk = float(jnp.max(jnp.linalg.norm(k, axis=-1)))
        bound = jnp.asarray(nq * nk * (1.0 / 4.0) * 1.4426950408889634
                            + extra, jnp.float32)
        out = flash_attention(q, k, v, block_q=128, block_k=128,
                              fixed_max=True, score_bound=bound,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"extra={extra}")


def test_unnormalized_requires_fixed_max():
    rng = np.random.default_rng(2)
    shape = (1, 2, 128, 16)
    q, k, v = (jnp.asarray(rng.normal(size=shape), jnp.float32)
               for _ in range(3))
    with pytest.raises(ValueError):
        flash_attention(q, k, v, unnormalized=True, interpret=True)
    with pytest.raises(ValueError):
        flash_attention(q, k, v, fixed_max=True, qk_int8=True, pv_int8=True,
                        unnormalized=True, interpret=True)


@pytest.mark.parametrize("seq,qk_int8", [(512, False), (500, False),
                                         (500, True)])
def test_ring_matches_unsharded(seq, qk_int8):
    """Ring attention over sp=8 == unsharded attention. seq=500 does not
    divide by 8 (63 pad rows in the last stripe) — exercises the exact
    denominator correction; seq=512 is the clean path."""
    rng = np.random.default_rng(3)
    b, h, d = 1, 4, 16
    q, k = _normed(rng, (b, h, seq, d)), _normed(rng, (b, h, seq, d))
    v = jnp.asarray(rng.normal(size=(b, h, seq, d)), jnp.float32)
    ref = np.asarray(attention_reference(q, k, v))

    sp = 8
    mesh = make_mesh(sp=sp)
    seq_pad = -(-seq // sp) * sp
    pad = ((0, 0), (0, 0), (0, seq_pad - seq), (0, 0))
    qp, kp, vp = (jnp.pad(x, pad) for x in (q, k, v))
    spec = P(None, None, "sp", None)

    def _ring(q_s, k_s, v_s):
        return ring_attention(q_s, k_s, v_s, "sp", sp,
                              n_pad=seq_pad - seq, interpret=True,
                              qk_int8=qk_int8, block_q=128, block_k=128)

    with mesh:
        out = jax.jit(jax.shard_map(
            _ring, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        ))(qp, kp, vp)
    out = np.asarray(out)[:, :, :seq]
    atol = 2e-2 if qk_int8 else 1e-4
    np.testing.assert_allclose(out, ref, atol=atol)


def test_dit_sp_ring_matches_unsharded(monkeypatch):
    """The AETHER_SP_RING=1 path through the DiT matches the unsharded XLA
    forward on a (tp=2, sp=4) mesh — mirrors
    test_sp_flash_attention_matches_unsharded but over the ring."""
    from aether_tpu.config import DiTConfig
    from aether_tpu.models.dit import dit_forward, init_dit_params
    from aether_tpu.models.rope import prepare_rotary_positional_embeddings
    from aether_tpu.parallel.mesh import dit_param_sharding, shard_params

    monkeypatch.setenv("AETHER_SP_RING", "1")
    cfg = DiTConfig(
        num_layers=2, num_heads=4, head_dim=16, text_embed_dim=32,
        max_text_seq_length=8, time_embed_dim=32, sample_height=8,
        sample_width=10,
    )
    key = jax.random.PRNGKey(6)
    params = init_dit_params(key, cfg)
    f, h, w = 3, 8, 10
    rng = np.random.default_rng(12)
    hidden = jnp.asarray(rng.normal(size=(1, f, cfg.in_channels, h, w)),
                         jnp.float32)
    text = jnp.asarray(
        rng.normal(size=(1, cfg.max_text_seq_length, cfg.text_embed_dim)),
        jnp.float32)
    t = jnp.array([500], jnp.int32)
    cos, sin = prepare_rotary_positional_embeddings(
        cfg, h * 8, w * 8, f, vae_scale_factor_spatial=8, fps=12)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    ref = dit_forward(params, cfg, hidden, text, t, cos, sin, attn_impl="xla")

    mesh = make_mesh(tp=2, sp=4)
    sh_params = shard_params(params, dit_param_sharding(cfg, mesh), mesh)
    with mesh:
        out = jax.jit(
            lambda p, x, e, ts: dit_forward(
                p, cfg, x, e, ts, cos, sin, attn_impl="flash_interpret",
                mesh=mesh, fixed_max=True,
            )
        )(sh_params, hidden, text, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
