"""Fused QKV attention prologue (``ops/attn_prologue.py``) parity tests.

The prologue must reproduce, in one Pallas pass, exactly what the unfused
path composes from separate ops: head-layout transpose -> per-head QK
LayerNorm -> interleaved-pair RoPE -> (optional) per-row int8 quantization,
plus the v ``[v | 1 | 0]`` MXU-denominator packing with padded rows zeroed.
All kernels run in interpret mode on CPU (SURVEY.md section 4 strategy).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aether_tpu.models.dit import layer_norm, apply_rotary_emb
from aether_tpu.ops.attn_prologue import fused_joint_attention, qkv_prologue
from aether_tpu.ops.flash_attention import attention_reference

B, S, NH, HD = 2, 300, 4, 64
EPS = 1e-6
FOLD = (1.0 / np.sqrt(HD)) * 1.4426950408889634


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    d = NH * HD
    xq, xk, xv = (
        jnp.asarray(rng.standard_normal((B, S, d)), jnp.float32)
        for _ in range(3)
    )
    gq, gk = (
        jnp.asarray(1.0 + 0.1 * rng.standard_normal((HD,)), jnp.float32)
        for _ in range(2)
    )
    bq, bk = (
        jnp.asarray(0.1 * rng.standard_normal((HD,)), jnp.float32)
        for _ in range(2)
    )
    ang = rng.standard_normal((S, HD // 2)) * 0.5
    cos = jnp.asarray(np.repeat(np.cos(ang), 2, axis=1), jnp.float32)
    sin = jnp.asarray(np.repeat(np.sin(ang), 2, axis=1), jnp.float32)
    return xq, xk, xv, gq, bq, gk, bk, cos, sin


def _reference_qkv(xq, xk, xv, gq, bq, gk, bk, cos, sin):
    """The unfused path's composition (models/dit.py::_attention)."""
    def qk(x, g, b):
        y = x.reshape(B, S, NH, HD).transpose(0, 2, 1, 3)
        y = layer_norm(y, g, b, EPS)
        return apply_rotary_emb(y, cos, sin)

    v = xv.reshape(B, S, NH, HD).transpose(0, 2, 1, 3)
    return qk(xq, gq, bq), qk(xk, gk, bk), v


def test_prologue_matches_unfused_composition(data):
    xq, xk, xv, gq, bq, gk, bk, cos, sin = data
    q_ref, k_ref, v_ref = _reference_qkv(xq, xk, xv, gq, bq, gk, bk, cos, sin)

    q, k, v_ext, qsc, qn, ksc, kn, s_pad = qkv_prologue(
        xq, xk, xv, gq, bq, gk, bk, cos, sin, num_heads=NH, head_dim=HD,
        eps=EPS, quantize=False, interpret=True,
    )
    qr = q.reshape(B, NH, s_pad, HD)[:, :, :S]
    kr = k.reshape(B, NH, s_pad, HD)[:, :, :S]
    np.testing.assert_allclose(np.asarray(qr), np.asarray(q_ref) * FOLD,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(kr), np.asarray(k_ref), atol=1e-5)

    ve = np.asarray(v_ext.reshape(B, NH, s_pad, 128))
    np.testing.assert_array_equal(ve[:, :, :S, :HD], np.asarray(v_ref))
    assert (ve[:, :, :S, HD] == 1.0).all()          # ones column
    assert (ve[:, :, :S, HD + 1:] == 0.0).all()     # zero lanes
    assert (ve[:, :, S:] == 0.0).all()              # padded rows fully zero

    # the softmax-shift stats are the folded per-(group, tile) norm maxima
    nq = np.linalg.norm(np.asarray(q_ref), axis=-1).max() * FOLD
    assert abs(np.asarray(qn).max() - nq) < 1e-4
    nk = np.linalg.norm(np.asarray(k_ref), axis=-1).max()
    assert abs(np.asarray(kn).max() - nk) < 1e-4


def test_prologue_int8_roundtrip(data):
    xq, xk, xv, gq, bq, gk, bk, cos, sin = data
    q_ref, k_ref, _ = _reference_qkv(xq, xk, xv, gq, bq, gk, bk, cos, sin)

    q, k, v_ext, qsc, qn, ksc, kn, s_pad = qkv_prologue(
        xq, xk, xv, gq, bq, gk, bk, cos, sin, num_heads=NH, head_dim=HD,
        eps=EPS, quantize=True, interpret=True,
    )
    assert q.dtype == jnp.int8 and k.dtype == jnp.int8
    # dequantize with the per-(head-group, token-tile) scale; tile = the
    # whole (short) padded sequence here, group = heads_per_cell heads
    groups, n_tiles = qsc.shape
    hper = (B * NH) // groups
    tile = s_pad // n_tiles
    deq = np.asarray(q, np.float32).reshape(groups, hper, n_tiles, tile, HD)
    deq = deq * np.asarray(qsc).reshape(groups, 1, n_tiles, 1, 1)
    deq = deq.reshape(B, NH, s_pad, HD)[:, :, :S]
    ref = np.asarray(q_ref) * FOLD
    scale_err = (np.asarray(qsc).max() * 0.51)
    assert (np.abs(deq - ref) <= scale_err + 1e-8).all()


def test_fused_attention_matches_reference(data):
    xq, xk, xv, gq, bq, gk, bk, cos, sin = data
    q_ref, k_ref, v_ref = _reference_qkv(xq, xk, xv, gq, bq, gk, bk, cos, sin)
    ref = attention_reference(q_ref, k_ref, v_ref)
    ref = np.asarray(ref.transpose(0, 2, 1, 3).reshape(B, S, NH * HD))

    # float mode: numerically equivalent to the exact path
    out = fused_joint_attention(
        xq, xk, xv, gq, bq, gk, bk, cos, sin, num_heads=NH, head_dim=HD,
        eps=EPS, quantize=False, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)

    # int8 mode: approximate by design. The honest bar is the UNFUSED qk8
    # path on the same data — per-(group, tile) scales are at least as fine
    # as its per-(group, sequence) scale, so the fused cosine must match or
    # beat it (tiny slack for rounding-path differences).
    from aether_tpu.ops.flash_attention import flash_attention

    unfused8 = flash_attention(q_ref, k_ref, v_ref, fixed_max=True,
                               qk_int8=True, interpret=True)
    u = np.asarray(
        unfused8.transpose(0, 2, 1, 3).reshape(B, S, NH * HD))

    def _cos(a, b):
        return (a * b).sum() / np.sqrt((a**2).sum() * (b**2).sum())

    out8 = fused_joint_attention(
        xq, xk, xv, gq, bq, gk, bk, cos, sin, num_heads=NH, head_dim=HD,
        eps=EPS, quantize=True, interpret=True,
    )
    o = np.asarray(out8)
    assert _cos(o, ref) >= _cos(u, ref) - 1e-5, (_cos(o, ref), _cos(u, ref))
    np.testing.assert_allclose(o, ref, atol=2e-2)


def test_fused_attention_prepadded_s_valid(data):
    """The dit fast path pre-pads the joint stream so the padding rides the
    enc/hidden concat; ``s_valid`` must mask the pad rows exactly."""
    xq, xk, xv, gq, bq, gk, bk, cos, sin = data
    out = fused_joint_attention(
        xq, xk, xv, gq, bq, gk, bk, cos, sin, num_heads=NH, head_dim=HD,
        eps=EPS, quantize=False, interpret=True,
    )

    pad = ((0, 0), (0, 84), (0, 0))
    out_p = fused_joint_attention(
        jnp.pad(xq, pad), jnp.pad(xk, pad),
        jnp.pad(xv, pad), gq, bq, gk, bk, cos, sin,
        num_heads=NH, head_dim=HD, eps=EPS, quantize=False, interpret=True,
        s_valid=S,
    )
    np.testing.assert_allclose(np.asarray(out_p[:, :S]), np.asarray(out),
                               atol=1e-6)


def test_fused_no_rope(data):
    xq, xk, xv, gq, bq, gk, bk, _, _ = data

    def qk(x, g, b):
        y = x.reshape(B, S, NH, HD).transpose(0, 2, 1, 3)
        return layer_norm(y, g, b, EPS)

    ref = attention_reference(
        qk(xq, gq, bq), qk(xk, gk, bk),
        xv.reshape(B, S, NH, HD).transpose(0, 2, 1, 3))
    ref = np.asarray(ref.transpose(0, 2, 1, 3).reshape(B, S, NH * HD))
    out = fused_joint_attention(
        xq, xk, xv, gq, bq, gk, bk, None, None, num_heads=NH, head_dim=HD,
        eps=EPS, quantize=False, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_dit_forward_fused_matches_unfused():
    """End-to-end: dit_forward with the fused prologue ON vs OFF (both via the
    interpreted flash kernel) and vs the XLA path."""
    from aether_tpu.config import DiTConfig
    from aether_tpu.models.dit import dit_forward, init_dit_params
    from aether_tpu.models.rope import prepare_rotary_positional_embeddings

    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(3), cfg)
    f, h, w = 3, cfg.sample_height, cfg.sample_width
    rng = np.random.default_rng(5)
    hidden = jnp.asarray(rng.normal(size=(1, f, cfg.in_channels, h, w)),
                         jnp.float32)
    text = jnp.asarray(
        rng.normal(size=(1, cfg.max_text_seq_length, cfg.text_embed_dim)),
        jnp.float32)
    t = jnp.array([500], jnp.int32)
    cos, sin = prepare_rotary_positional_embeddings(
        cfg, h * 8, w * 8, f, vae_scale_factor_spatial=8, fps=12)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    xla = dit_forward(params, cfg, hidden, text, t, cos, sin, attn_impl="xla")
    unfused = dit_forward(params, cfg, hidden, text, t, cos, sin,
                          attn_impl="flash_interpret", fixed_max=True,
                          fused_qkv=False)
    fused = dit_forward(params, cfg, hidden, text, t, cos, sin,
                        attn_impl="flash_interpret", fixed_max=True,
                        fused_qkv=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(xla), atol=2e-4)


def test_pick_pad_and_block_always_tiles():
    """Round-3 advisor finding: `_pick_block`'s <=15%-waste early return can
    keep the requested 1024 block on a pad it does not divide (e.g. joint
    lengths 1665-1792 -> pad 1792), which used to trip the trace-time
    divisibility assert on the DEFAULT fused path. The pad must now be
    derived FROM the block."""
    from aether_tpu.ops.attn_prologue import _pick_pad_and_block

    for s in list(range(1, 4200)) + list(range(4200, 20000, 7)):
        for req in (1024, 768, 512):
            s_pad, block = _pick_pad_and_block(s, req)
            assert s_pad >= s
            assert s_pad % block == 0, (s, req, s_pad, block)
            assert block % 128 == 0 and 128 <= block <= max(req, 128)


def test_fused_attention_previously_untileable_length():
    """s=852 -> joint pad 896; _pick_block(896, 1024) returns 896 (single
    tile) — fine — but s=1700 -> pad 1792 vs block 1024 was the crash class.
    Run the real fused path (interpret) at such a length end to end."""
    s = 1700
    nh, hd = 2, 64
    rng = np.random.default_rng(11)
    d = nh * hd
    xq, xk, xv = (
        jnp.asarray(rng.standard_normal((1, s, d)), jnp.float32)
        for _ in range(3)
    )
    g = jnp.ones((hd,), jnp.float32)
    b = jnp.zeros((hd,), jnp.float32)
    out = fused_joint_attention(
        xq, xk, xv, g, b, g, b, None, None, num_heads=nh, head_dim=hd,
        eps=EPS, quantize=False, interpret=True,
    )
    assert out.shape == (1, s, d)
    ref = attention_reference(
        *(x.reshape(1, s, nh, hd).transpose(0, 2, 1, 3) for x in
          (layer_norm(xq.reshape(1, s, nh, hd).transpose(0, 2, 1, 3), g, b, EPS)
           .transpose(0, 2, 1, 3).reshape(1, s, d),
           layer_norm(xk.reshape(1, s, nh, hd).transpose(0, 2, 1, 3), g, b, EPS)
           .transpose(0, 2, 1, 3).reshape(1, s, d),
           xv)))
    ref = np.asarray(ref.transpose(0, 2, 1, 3).reshape(1, s, d))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
