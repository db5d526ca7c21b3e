"""Flash attention kernel vs reference attention (interpret mode on CPU)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from aether_tpu.ops import attention_reference, flash_attention


@pytest.mark.parametrize(
    "shape,blocks",
    [
        ((1, 2, 256, 64), (128, 128)),  # exact block multiples
        ((2, 2, 200, 64), (128, 128)),  # padding + kv mask
        ((1, 1, 256, 64), (256, 128)),  # asymmetric q/k blocks
    ],
)
def test_flash_matches_reference(shape, blocks):
    b, h, s, d = shape
    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), shape, jnp.float32)
        for i in range(3)
    )
    ref = attention_reference(q, k, v)
    out = flash_attention(q, k, v, block_q=blocks[0], block_k=blocks[1], interpret=True)
    # tolerance covers JAX's default (bf16-pass) matmul precision on both paths
    assert float(jnp.max(jnp.abs(ref - out))) < 2.5e-3


def test_flash_padding_rows_do_not_leak():
    """Padded kv positions must receive zero attention weight."""
    b, h, s, d = 1, 1, 130, 64  # pads to 256
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, s, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, s, d), jnp.float32)
    ref = attention_reference(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    assert float(jnp.max(jnp.abs(ref - out))) < 2.5e-3


def test_flash_bf16():
    shape = (1, 2, 256, 64)
    key = jax.random.PRNGKey(2)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), shape, jnp.bfloat16)
        for i in range(3)
    )
    ref = attention_reference(q, k, v).astype(jnp.float32)
    out = flash_attention(q, k, v, interpret=True).astype(jnp.float32)
    assert float(jnp.max(jnp.abs(ref - out))) < 2e-2


def test_asymmetric_blocks_mask_padded_keys():
    """Regression: seq divisible by block_k but not block_q still pads K/V;
    the padding mask must key off the padded length, not kv_len % block_k."""
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 384, 32), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 384, 32), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 384, 32), jnp.float32)
    ref = attention_reference(q, k, v)
    out = flash_attention(q, k, v, block_q=256, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_extreme_negative_scores_with_padding():
    """All real scores deeply negative + kv padding: the kernel must still
    return the correct (near-uniform) softmax average, not collapse to zero.
    (Pins the choice of explicit padding masks over zero-pad denominator
    correction, which underflows here.)"""
    b, h, s, d = 1, 1, 200, 64  # pads to 256
    q = jnp.full((b, h, s, d), 5.0, jnp.float32)
    k = -jnp.full((b, h, s, d), 5.0, jnp.float32)  # scores = -25*64/8 = -200
    v = jax.random.normal(jax.random.PRNGKey(3), (b, h, s, d), jnp.float32)
    ref = attention_reference(q, k, v)  # uniform average of v
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_block_picker():
    from aether_tpu.ops.flash_attention import _pick_block

    assert _pick_block(15076, 1536) == 1536   # 15360, 1.9% pad
    assert _pick_block(256, 128) == 128       # explicit small blocks honored
    assert _pick_block(100, 1536) == 128      # single-tile round-up
    assert _pick_block(7202, 1536) % 128 == 0


def test_flash_train_gradient_matches_reference():
    """custom_vjp hybrid (pallas fwd / chunked bwd): value and gradient must
    match the plain attention's autodiff."""
    from aether_tpu.ops.chunked_attention import flash_attention_trainable

    shape = (1, 2, 192, 32)  # pads inside the kernel
    key = jax.random.PRNGKey(5)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), shape, jnp.float32)
               for i in range(3))

    def loss_hybrid(q, k, v):
        return jnp.sum(jnp.square(flash_attention_trainable(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(attention_reference(q, k, v)))

    # interpret-mode pallas on CPU (sys.modules: the package re-exports a
    # function with the submodule's name, shadowing attribute imports)
    import sys

    fa = sys.modules["aether_tpu.ops.flash_attention"]
    orig = fa.flash_attention
    fa.flash_attention = lambda *a, **kw: orig(*a, **kw, interpret=True)
    try:
        val, grads = jax.value_and_grad(loss_hybrid, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa.flash_attention = orig
    val_ref, grads_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    np.testing.assert_allclose(float(val), float(val_ref), rtol=1e-3)
    for g, gr in zip(grads, grads_ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                                   atol=5e-3, rtol=1e-2)


@pytest.mark.parametrize("denom", ["mxu", "vpu"])
def test_kernel_variants_match_reference(denom):
    """The denom=mxu (ones-column PV matmul) knob must be numerically
    equivalent to the baseline kernel, including with padded kv positions."""
    rng = np.random.default_rng(9)
    q, k, v = (jnp.asarray(rng.normal(size=(1, 2, 300, 64)), jnp.float32)
               for _ in range(3))
    ref = attention_reference(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128, denom=denom,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_head_dim_128_falls_back_to_vpu_denom():
    """denom=mxu has no spare lane for the ones column at head_dim >= 128;
    the kernel must fall back instead of emitting a negative pad width."""
    rng = np.random.default_rng(21)
    q, k, v = (jnp.asarray(rng.normal(size=(1, 2, 256, 128)), jnp.float32)
               for _ in range(3))
    ref = attention_reference(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
    # fixed_max depends on the mxu layout and must fall back too
    out2 = flash_attention(q, k, v, block_q=128, block_k=128, fixed_max=True,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=3e-5)


@pytest.mark.parametrize("fixed_max", [False, True])
def test_kv_valid_masks_caller_padding(fixed_max):
    """kv_valid must exclude caller-side K/V tail padding exactly (the
    sequence-parallel path pads the global token axis to the shard count and
    gathers K/V back to full padded length). Padded rows here carry GARBAGE
    (not zeros) to prove the wrapper masks/zeros them itself."""
    rng = np.random.default_rng(23)
    n, pad = 200, 56  # padded length 256
    q = jnp.asarray(rng.normal(size=(1, 2, 256, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 256, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 256, 64)), jnp.float32)
    ref = attention_reference(q, k[:, :, :n], v[:, :, :n])
    out = flash_attention(q, k, v, block_q=128, block_k=128,
                          fixed_max=fixed_max, kv_valid=n, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def _rownorm(x):
    """Per-row layer_norm, mimicking the DiT's QK-norm (the precondition for
    the qk_int8 per-head-group quantization being accurate)."""
    m = x.mean(-1, keepdims=True)
    v = x.var(-1, keepdims=True)
    return (x - m) / np.sqrt(v + 1e-6)


def test_qk_int8_close_on_normed_inputs():
    """int8 QK^T (per-head-group symmetric quantization) must track the f32
    reference closely for QK-NORMED inputs — the path is approximate by
    design; the tolerance here is ~bf16-input rounding level."""
    rng = np.random.default_rng(11)
    shape = (1, 4, 520, 64)  # pads to 640: exercises padding too
    q = jnp.asarray(_rownorm(rng.normal(size=shape)), jnp.float32)
    k = jnp.asarray(_rownorm(rng.normal(size=shape)), jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)
    ref = np.asarray(attention_reference(q, k, v))
    out = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                     fixed_max=True, qk_int8=True,
                                     interpret=True))
    assert np.max(np.abs(out - ref)) < 2e-2
    cos = float((out * ref).sum()
                / (np.linalg.norm(out) * np.linalg.norm(ref)))
    assert cos > 0.9995


def test_qk_int8_requires_fixed_max():
    q = jnp.zeros((1, 1, 128, 64), jnp.float32)
    with pytest.raises(ValueError):
        flash_attention(q, q, q, qk_int8=True, fixed_max=False,
                        interpret=True)


def test_qk_int8_kv_valid_masks_padding():
    """qk_int8 composes with the sequence-parallel kv_valid mask."""
    rng = np.random.default_rng(12)
    n = 200  # padded region 200..256 carries garbage
    q = jnp.asarray(_rownorm(rng.normal(size=(1, 2, 256, 64))), jnp.float32)
    k = jnp.asarray(_rownorm(rng.normal(size=(1, 2, 256, 64))), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 256, 64)), jnp.float32)
    ref = np.asarray(attention_reference(q, k[:, :, :n], v[:, :, :n]))
    out = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                     fixed_max=True, qk_int8=True,
                                     kv_valid=n, interpret=True))
    assert np.max(np.abs(out - ref)) < 2e-2


def test_noshift_matches_reference_bounded_scores():
    """noshift (p = exp2(s) raw, shift cancelled by normalization) must be
    exact for bounded-score inputs, in both forced and auto (lax.cond) mode,
    including padded kv positions and bf16."""
    rng = np.random.default_rng(17)
    for dtype, tol in ((jnp.float32, 2e-5), (jnp.bfloat16, 2e-2)):
        q, k, v = (jnp.asarray(rng.normal(size=(1, 4, 300, 64)), dtype)
                   for _ in range(3))
        ref = attention_reference(q, k, v).astype(jnp.float32)
        for ns in (True, None):
            out = flash_attention(q, k, v, block_q=128, block_k=128,
                                  fixed_max=True, noshift=ns, interpret=True
                                  ).astype(jnp.float32)
            assert float(jnp.max(jnp.abs(out - ref))) < tol, (dtype, ns)


def test_noshift_auto_falls_back_on_large_scores():
    """Scores ~200 in the log2 domain overflow exp2 in the noshift kernel;
    the auto (noshift=None) cond must route such inputs to the shifted
    fixed-max kernel and stay exact. Constructed with aligned q/k rows so the
    Cauchy-Schwarz bound is TIGHT (gap << exp2 underflow margin) — the
    fixed-max path itself remains valid, only the shift is mandatory."""
    rng = np.random.default_rng(19)
    d = 64
    direction = rng.normal(size=d)
    direction /= np.linalg.norm(direction)
    # ||q||*||k||*sm_scale*log2e ~ 200 >> the 96 threshold
    qn = 33.0 * (1 + 0.05 * rng.random(size=(1, 2, 300, 1)))
    kn = 33.0 * (1 + 0.05 * rng.random(size=(1, 2, 300, 1)))
    q = jnp.asarray(qn * direction, jnp.float32)
    k = jnp.asarray(kn * direction, jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 300, d)), jnp.float32)
    ref = attention_reference(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128,
                          fixed_max=True, noshift=None, interpret=True)
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fixed_max_matches_reference_qk_normed():
    """fixed_max (a-priori Cauchy-Schwarz score bound) must be exact for
    QK-norm-style bounded inputs, including padded kv positions and bf16."""
    rng = np.random.default_rng(13)
    for dtype, tol in ((jnp.float32, 2e-5), (jnp.bfloat16, 2e-2)):
        q, k, v = (jnp.asarray(rng.normal(size=(1, 4, 300, 64)), dtype)
                   for _ in range(3))
        ref = attention_reference(q, k, v).astype(jnp.float32)
        out = flash_attention(q, k, v, block_q=128, block_k=128,
                              fixed_max=True, interpret=True
                              ).astype(jnp.float32)
        assert float(jnp.max(jnp.abs(out - ref))) < tol


def test_pv_int8_close_on_normed_inputs():
    """Full-int8 attention cell (int8 QK^T + int8 softmax weights on the PV
    matmul, see ``_flash_kernel_pv8``): the softmax weights carry ~1/254 of
    each row's max-weight granularity, so the tolerance is one notch looser
    than qk_int8 alone. Exercises the padding-bias path (520 pads to 640)."""
    rng = np.random.default_rng(21)
    shape = (1, 4, 520, 64)
    q = jnp.asarray(_rownorm(rng.normal(size=shape)), jnp.float32)
    k = jnp.asarray(_rownorm(rng.normal(size=shape)), jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)
    ref = np.asarray(attention_reference(q, k, v))
    out = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                     fixed_max=True, qk_int8=True,
                                     pv_int8=True, interpret=True))
    assert np.max(np.abs(out - ref)) < 5e-2
    cos = float((out * ref).sum()
                / (np.linalg.norm(out) * np.linalg.norm(ref)))
    assert cos > 0.999, cos


def test_pv_int8_no_padding_path():
    """block-aligned sequence: the kernel's static has_bias=False arity."""
    rng = np.random.default_rng(22)
    shape = (1, 2, 512, 64)
    q = jnp.asarray(_rownorm(rng.normal(size=shape)), jnp.float32)
    k = jnp.asarray(_rownorm(rng.normal(size=shape)), jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)
    ref = np.asarray(attention_reference(q, k, v))
    out = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                     fixed_max=True, qk_int8=True,
                                     pv_int8=True, interpret=True))
    assert np.max(np.abs(out - ref)) < 5e-2


def test_pv_int8_negative_row_max_with_padding():
    """The padding bias must keep the running max tied to REAL scores: rows
    whose true max score is negative would otherwise be crushed by the
    zero-score padding columns pinning the integer running max at 0."""
    rng = np.random.default_rng(23)
    d = 64
    # anti-aligned q/k: every real score is strongly negative
    base = _rownorm(rng.normal(size=(1, 2, 200, d)))
    q = jnp.asarray(base, jnp.float32)
    k = jnp.asarray(-base + 0.05 * _rownorm(rng.normal(size=(1, 2, 200, d))),
                    jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 200, d)), jnp.float32)
    ref = np.asarray(attention_reference(q, k, v))
    out = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                     fixed_max=True, qk_int8=True,
                                     pv_int8=True, interpret=True))
    assert np.isfinite(out).all()
    assert np.max(np.abs(out - ref)) < 5e-2


def test_pv_int8_kv_valid_masks_padding():
    """pv_int8 composes with the sequence-parallel kv_valid mask."""
    rng = np.random.default_rng(24)
    n = 200
    q = jnp.asarray(_rownorm(rng.normal(size=(1, 2, 256, 64))), jnp.float32)
    k = jnp.asarray(_rownorm(rng.normal(size=(1, 2, 256, 64))), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 256, 64)), jnp.float32)
    ref = np.asarray(attention_reference(q, k[:, :, :n], v[:, :, :n]))
    out = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                     fixed_max=True, qk_int8=True,
                                     pv_int8=True, kv_valid=n,
                                     interpret=True))
    assert np.max(np.abs(out - ref)) < 5e-2


def test_pv_int8_requires_fixed_max_and_qk_int8():
    q = jnp.zeros((1, 1, 128, 64), jnp.float32)
    with pytest.raises(ValueError):
        flash_attention(q, q, q, pv_int8=True, fixed_max=False,
                        interpret=True)
    # bf16-QK + int8-PV SIGABRTs the v5e Mosaic compiler: rejected up front
    with pytest.raises(ValueError):
        flash_attention(q, q, q, pv_int8=True, qk_int8=False, fixed_max=True,
                        interpret=True)
