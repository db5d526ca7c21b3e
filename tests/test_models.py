"""DiT + VAE structural tests at tiny config (SURVEY.md section 7 minimum slice)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aether_tpu.config import DiTConfig, VAEConfig
from aether_tpu.models import (
    dit_forward,
    init_dit_params,
    init_vae_params,
    prepare_rotary_positional_embeddings,
    vae_decode,
    vae_encode,
)
from aether_tpu.models.rope import get_resize_crop_region_for_grid


def test_rope_shapes_and_dim_split():
    cfg = DiTConfig.tiny()  # head_dim 16 -> dims 4 | 6 | 6
    cos, sin = prepare_rotary_positional_embeddings(
        cfg, height=64, width=96, num_latent_frames=3, fps=12
    )
    s_video = 3 * (64 // 16) * (96 // 16)
    assert cos.shape == (s_video, cfg.head_dim)
    assert sin.shape == (s_video, cfg.head_dim)
    # first token is position 0 everywhere: cos = 1, sin = 0
    np.testing.assert_allclose(cos[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(sin[0], 0.0, atol=1e-6)


def test_rope_fps_factor_scales_time():
    cfg = DiTConfig.tiny()
    cos12, _ = prepare_rotary_positional_embeddings(cfg, 64, 96, 4, fps=12)
    cos24, _ = prepare_rotary_positional_embeddings(cfg, 64, 96, 4, fps=24)
    per_frame = (64 // 16) * (96 // 16)
    dim_t = cfg.head_dim // 4
    # fps 24 -> fps_factor 0.5: frame 2 at fps 24 matches frame 1 at fps 12
    np.testing.assert_allclose(
        cos24[2 * per_frame, :dim_t], cos12[1 * per_frame, :dim_t], atol=1e-6
    )


def test_resize_crop_region():
    # full-size grid maps to (0,0)-(grid) on the base grid
    assert get_resize_crop_region_for_grid((30, 45), 45, 30) == ((0, 0), (30, 45))
    top_left, bottom_right = get_resize_crop_region_for_grid((30, 30), 45, 30)
    assert top_left[0] == 0 and top_left[1] > 0  # pillarboxed horizontally


def test_dit_forward_shapes():
    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    b, f, h, w = 1, 3, 8, 12
    hidden = jax.random.normal(jax.random.PRNGKey(1), (b, f, cfg.in_channels, h, w))
    text = jax.random.normal(jax.random.PRNGKey(2), (b, 8, cfg.text_embed_dim))
    cos, sin = prepare_rotary_positional_embeddings(
        cfg, h * 8, w * 8, f, vae_scale_factor_spatial=8, fps=12
    )
    out = dit_forward(params, cfg, hidden, text, jnp.array([999]),
                      cos, sin, attn_impl="xla")
    assert out.shape == (b, f, cfg.out_channels, h, w)
    assert jnp.isfinite(out).all()


def test_dit_block_unroll_equivalence():
    """AETHER_BLOCK_UNROLL only changes the scan's loop structure — outputs
    must match the unroll=1 default to float tolerance (on-chip A/B in
    BASELINE.md round 5 measured drift <= 2e-6 at full size)."""
    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    b, f, h, w = 1, 2, 4, 4
    hidden = jax.random.normal(jax.random.PRNGKey(1), (b, f, cfg.in_channels, h, w))
    text = jax.random.normal(jax.random.PRNGKey(2), (b, 4, cfg.text_embed_dim))
    outs = [
        dit_forward(params, cfg, hidden, text, jnp.array([999]),
                    attn_impl="xla", block_unroll=u)
        for u in (1, 2, 3)
    ]
    for other in outs[1:]:
        np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(other),
                                   atol=1e-5)


def test_dit_cfg_batch_and_jit():
    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    b, f, h, w = 2, 2, 4, 4
    hidden = jax.random.normal(jax.random.PRNGKey(1), (b, f, cfg.in_channels, h, w))
    text = jax.random.normal(jax.random.PRNGKey(2), (b, 4, cfg.text_embed_dim))

    fwd = jax.jit(lambda p, x, t, ts: dit_forward(p, cfg, x, t, ts, attn_impl="xla"))
    out = fwd(params, hidden, text, jnp.array([999, 999]))
    assert out.shape == (b, f, cfg.out_channels, h, w)
    # identical batch rows + identical timesteps -> identical outputs
    hidden_same = jnp.concatenate([hidden[:1]] * 2)
    text_same = jnp.concatenate([text[:1]] * 2)
    out_same = fwd(params, hidden_same, text_same, jnp.array([500, 500]))
    np.testing.assert_allclose(np.asarray(out_same[0]), np.asarray(out_same[1]),
                               atol=1e-5)


def test_dit_flash_matches_xla_attention():
    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    b, f, h, w = 1, 2, 8, 12  # S_video = 2*4*6 = 48
    hidden = jax.random.normal(jax.random.PRNGKey(1), (b, f, cfg.in_channels, h, w))
    text = jax.random.normal(jax.random.PRNGKey(2), (b, 8, cfg.text_embed_dim))
    out_xla = dit_forward(params, cfg, hidden, text, jnp.array([500]),
                          attn_impl="xla")
    out_flash = dit_forward(params, cfg, hidden, text, jnp.array([500]),
                            attn_impl="flash_interpret")
    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(out_flash),
                               atol=5e-3)


@pytest.fixture(scope="module")
def tiny_vae():
    cfg = VAEConfig.tiny()
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_vae_encode_decode_shapes(tiny_vae):
    cfg, params = tiny_vae
    video = jax.random.normal(jax.random.PRNGKey(1), (1, 9, 32, 48, 3)) * 0.1
    lat = vae_encode(params, cfg, video, sample_mode="argmax")
    assert lat.shape == (1, 3, 4, 6, cfg.latent_channels)  # T: 1+(9-1)/4, 8x spatial
    rec = vae_decode(params, cfg, lat)
    assert rec.shape == (1, 9, 32, 48, 3)
    assert jnp.isfinite(rec).all()


def test_vae_single_frame(tiny_vae):
    """Image conditions are encoded per frame (reference pipeline:552-565)."""
    cfg, params = tiny_vae
    img = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 32, 48, 3)) * 0.1
    lat = vae_encode(params, cfg, img, sample_mode="argmax")
    assert lat.shape == (1, 1, 4, 6, cfg.latent_channels)
    rec = vae_decode(params, cfg, lat)
    assert rec.shape == (1, 1, 32, 48, 3)


def test_vae_posterior_sampling(tiny_vae):
    cfg, params = tiny_vae
    video = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 32, 32, 3)) * 0.1
    mean = vae_encode(params, cfg, video, sample_mode="argmax")
    s1 = vae_encode(params, cfg, video, key=jax.random.PRNGKey(4))
    s2 = vae_encode(params, cfg, video, key=jax.random.PRNGKey(5))
    assert not np.allclose(np.asarray(s1), np.asarray(s2))
    assert np.asarray(jnp.abs(mean - s1)).mean() < 5.0  # samples near the mean


def test_vae_chunked_shapes_match_full(tiny_vae):
    from aether_tpu.models import vae_decode_chunked, vae_encode_chunked

    cfg, params = tiny_vae
    video = jax.random.normal(jax.random.PRNGKey(7), (1, 17, 32, 32, 3)) * 0.1
    full = vae_encode(params, cfg, video, sample_mode="argmax")
    chunked = vae_encode_chunked(params, cfg, video, sample_mode="argmax",
                                 frame_batch_size=8)
    assert chunked.shape == full.shape  # (1, 5, 4, 4, C)
    rec_full = vae_decode(params, cfg, full)
    # reference framewise decode: 2 latent frames per chunk, first chunk odd
    rec_chunked = vae_decode_chunked(params, cfg, full, frame_batch_size=2)
    assert rec_chunked.shape == rec_full.shape == (1, 17, 32, 32, 3)


def test_conv_cache_is_exact():
    """Chunked processing with ConvCache must equal full-clip for a causal conv."""
    from aether_tpu.models.vae import ConvCache, causal_conv3d

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 9, 8, 8, 4))
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, 4, 6)) * 0.1
    b = jnp.zeros((6,))
    full = causal_conv3d(x, w, b)

    c1 = ConvCache(None)
    y1 = c1.conv(x[:, :5], w, b, "c")
    c2 = ConvCache(c1.cache_out)
    y2 = c2.conv(x[:, 5:], w, b, "c")
    chunked = jnp.concatenate([y1, y2], axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), atol=1e-5)


def test_fp8_weight_quantization_close_to_bf16():
    """Weight-only fp8 with per-column scales must track the full-precision
    forward within a few percent and halve matmul-weight bytes."""
    from aether_tpu.models.dit import quantize_dit_params

    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)

    f, h, w = 2, 8, 12
    hidden = jax.random.normal(jax.random.PRNGKey(1),
                               (1, f, cfg.in_channels, h, w), jnp.float32)
    text = jax.random.normal(
        jax.random.PRNGKey(2),
        (1, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32)
    cos, sin = prepare_rotary_positional_embeddings(cfg, h * 8, w * 8, f, fps=12)
    args = (hidden, text, jnp.array([500]), jnp.asarray(cos), jnp.asarray(sin))
    # full-precision forward FIRST: quantize_dit_params mutates in place
    # (leaf-by-leaf, to halve peak memory on the real 16 GB chip)
    out = dit_forward(params, cfg, *args, attn_impl="xla")
    qparams = quantize_dit_params(params)
    qout = dit_forward(qparams, cfg, *args, attn_impl="xla")
    assert isinstance(params["blocks"]["attn"]["q_w"], dict)  # mutated in place
    rel = np.abs(np.asarray(out) - np.asarray(qout)).mean() / (
        np.abs(np.asarray(out)).mean() + 1e-9
    )
    assert rel < 0.10, rel
    # every stacked attn weight is stored as {"q": fp8, "s": per-column scale}
    attn_q = qparams["blocks"]["attn"]["q_w"]
    assert attn_q["q"].dtype == jnp.float8_e4m3fn
    assert attn_q["s"].shape == (cfg.num_layers, cfg.hidden_size)


def test_int8_weight_quantization():
    """int8 weight-only path: same layout, coarser dtype, still close."""
    from aether_tpu.models.dit import quantize_dit_params

    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    f, h, w = 2, 8, 12
    hidden = jax.random.normal(jax.random.PRNGKey(1),
                               (1, f, cfg.in_channels, h, w), jnp.float32)
    text = jnp.zeros((1, cfg.max_text_seq_length, cfg.text_embed_dim))
    cos, sin = prepare_rotary_positional_embeddings(cfg, h * 8, w * 8, f, fps=12)
    args = (hidden, text, jnp.array([100]), jnp.asarray(cos), jnp.asarray(sin))
    out = dit_forward(params, cfg, *args, attn_impl="xla")
    qparams = quantize_dit_params(params, dtype=jnp.int8)
    qout = dit_forward(qparams, cfg, *args, attn_impl="xla")
    assert qparams["blocks"]["mlp"]["w1"]["q"].dtype == jnp.int8
    rel = np.abs(np.asarray(out) - np.asarray(qout)).mean() / (
        np.abs(np.asarray(out)).mean() + 1e-9
    )
    assert rel < 0.05, rel  # int8 per-column is tighter than fp8


def test_quantized_init_layout_matches_quantized_conversion():
    """Direct fp8-layout init must produce the same tree structure as
    quantizing a bf16 init (so checkpoints and benches are interchangeable)."""
    from aether_tpu.models.dit import (
        init_quantized_dit_params,
        quantize_dit_params,
    )

    cfg = DiTConfig.tiny()
    a = init_quantized_dit_params(jax.random.PRNGKey(0), cfg)
    b = quantize_dit_params(init_dit_params(jax.random.PRNGKey(0), cfg))
    ta = jax.tree_util.tree_structure(a)
    tb = jax.tree_util.tree_structure(b)
    assert ta == tb, (ta, tb)
    sa = jax.tree_util.tree_map(lambda x: x.shape, a)
    sb = jax.tree_util.tree_map(lambda x: x.shape, b)
    assert sa == sb


def test_rope_golden_angles_and_fps_factor():
    """3D RoPE golden values: dim split d/4|3d/8|3d/8, linspace grid semantics,
    fps_factor temporal scaling, and the interleaved-pair rotation identity."""
    import math

    from aether_tpu.models.rope import (
        get_3d_rotary_pos_embed,
        get_resize_crop_region_for_grid,
    )
    from aether_tpu.models.dit import apply_rotary_emb

    d, gh, gw, t = 16, 3, 4, 2
    crops = get_resize_crop_region_for_grid((gh, gw), gw, gh)  # full grid
    cos, sin = get_3d_rotary_pos_embed(d, crops, (gh, gw), t)
    assert cos.shape == (t * gh * gw, d)

    dim_t, dim_h = d // 4, d // 8 * 3
    # token (t=1, h=0, w=0): temporal angle at freq_0 (=1) is grid_t[1]
    grid_t1 = t * (t - 1) / t / (t - 1) * 1  # linspace(0, t*(t-1)/t, t)[1]
    tok = gh * gw  # flat index of (1, 0, 0)
    assert cos[tok, 0] == pytest.approx(math.cos(grid_t1), abs=1e-6)
    assert sin[tok, 1] == pytest.approx(math.sin(grid_t1), abs=1e-6)  # pair
    # token (0, 1, 0): first height angle = grid_h[1]
    grid_h = np.linspace(0, gh * (gh - 1) / gh, gh)
    tok_h = gw
    assert cos[tok_h, dim_t] == pytest.approx(math.cos(grid_h[1]), abs=1e-6)
    # spatial dims have NO temporal dependence and vice versa
    assert cos[tok, dim_t] == pytest.approx(1.0)  # h=0 -> angle 0
    assert cos[tok_h, 0] == pytest.approx(1.0)  # t=0 -> angle 0

    # fps_factor scales ONLY the temporal angles
    cos2, _ = get_3d_rotary_pos_embed(d, crops, (gh, gw), t, fps_factor=0.5)
    assert cos2[tok, 0] == pytest.approx(math.cos(0.5 * grid_t1), abs=1e-6)
    np.testing.assert_allclose(cos2[tok_h, dim_t:], cos[tok_h, dim_t:])

    # rotation identity: a (1,0) pair rotates to (cos a, sin a)
    x = np.zeros((1, 1, t * gh * gw, d), np.float32)
    x[..., 0] = 1.0
    rotated = np.asarray(apply_rotary_emb(jnp.asarray(x), jnp.asarray(cos),
                                          jnp.asarray(sin)))
    np.testing.assert_allclose(rotated[0, 0, tok, 0], math.cos(grid_t1),
                               atol=1e-6)
    np.testing.assert_allclose(rotated[0, 0, tok, 1], math.sin(grid_t1),
                               atol=1e-6)


def test_subpixel_upsampler_equals_nearest_plus_conv():
    """The folded 2x2 parity-kernel upsample (4/9 FLOPs) must exactly equal
    nearest-2x upsample + per-frame 3x3 conv (diffusers CogVideoXUpsample3D
    semantics), including the temporal first-frame split."""
    from aether_tpu.models.vae import _conv3d, _nearest_resize, _upsample3d

    key = jax.random.PRNGKey(0)
    with jax.default_matmul_precision("float32"):
        for t, compress in [(5, True), (4, True), (1, True), (5, False)]:
            x = jax.random.normal(key, (2, t, 6, 7, 8))
            w = jax.random.normal(jax.random.fold_in(key, 1),
                                  (1, 3, 3, 8, 9)) * 0.3
            b = jax.random.normal(jax.random.fold_in(key, 2), (9,)) * 0.1
            new = _upsample3d(x, {"conv_w": w, "conv_b": b}, compress)

            tt, h, wd = x.shape[1], x.shape[2], x.shape[3]
            if compress and tt > 1 and tt % 2 == 1:
                xi = jnp.concatenate(
                    [_nearest_resize(x[:, :1], (1, 2 * h, 2 * wd)),
                     _nearest_resize(x[:, 1:], (2 * (tt - 1), 2 * h, 2 * wd))],
                    axis=1)
            elif compress and tt > 1:
                xi = _nearest_resize(x, (2 * tt, 2 * h, 2 * wd))
            else:
                xi = _nearest_resize(x, (tt, 2 * h, 2 * wd))
            old = _conv3d(xi, w, b, (1, 1, 1), ((0, 0), (1, 1), (1, 1)))
            np.testing.assert_allclose(np.asarray(new), np.asarray(old),
                                       atol=2e-5)


def test_patchify_unpatchify_temporal_inverse():
    """CogVideoX-1.5 branch: with an identity projection, unpatchify inverts
    patchify exactly (pins the (c, pt, p, p) feature order)."""
    from aether_tpu.models.dit import _patchify, _unpatchify

    rng = np.random.default_rng(0)
    b, f, c, h, w, p, pt = 2, 4, 3, 8, 12, 2, 2
    x = jnp.asarray(rng.normal(size=(b, f, c, h, w)).astype(np.float32))
    feat = c * pt * p * p
    eye = jnp.eye(feat, dtype=jnp.float32)
    tokens = _patchify(x, eye, None, p, pt)
    assert tokens.shape == (b, (f // pt) * (h // p) * (w // p), feat)
    back = _unpatchify(tokens, f, h // p, w // p, c, p, pt)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)

    # 1.0 branch unchanged
    tokens = _patchify(x, jnp.eye(c * p * p, dtype=jnp.float32), None, p, None)
    back = _unpatchify(tokens, f, h // p, w // p, c, p, None)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_dit_forward_cogvideox15_branch():
    """patch_size_t + ofs embedding: forward runs, shapes round-trip, and the
    ofs embedding changes the output (it is actually wired in)."""
    import dataclasses

    from aether_tpu.config import DiTConfig
    from aether_tpu.models.dit import dit_forward, init_dit_params
    from aether_tpu.models.rope import prepare_rotary_positional_embeddings

    cfg = dataclasses.replace(DiTConfig.tiny(), patch_size_t=2)
    cfg = dataclasses.replace(cfg, ofs_embed_dim=cfg.time_embed_dim)
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    assert "ofs_embed" in params

    b, f, h, w = 1, 4, 8, 12
    hidden = jax.random.normal(
        jax.random.PRNGKey(1), (b, f, cfg.in_channels, h, w), jnp.float32)
    text = jax.random.normal(
        jax.random.PRNGKey(2),
        (b, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32)
    ts = jnp.array([500], jnp.int32)
    cos, sin = prepare_rotary_positional_embeddings(
        cfg, h * 8, w * 8, f, vae_scale_factor_spatial=8, fps=12)

    out = dit_forward(params, cfg, hidden, text, ts,
                      jnp.asarray(cos), jnp.asarray(sin), attn_impl="xla")
    assert out.shape == (b, f, cfg.out_channels, h, w)
    assert np.all(np.isfinite(np.asarray(out)))

    out_ofs = dit_forward(params, cfg, hidden, text, ts,
                          jnp.asarray(cos), jnp.asarray(sin), attn_impl="xla",
                          ofs=jnp.array([2.0], jnp.float32))
    assert np.max(np.abs(np.asarray(out_ofs) - np.asarray(out))) > 1e-6


def test_w8a8_linear_accuracy():
    """int8 weight x int8 activation matmul must track the float result within
    dynamic-quantization error (per-token activation scales)."""
    from aether_tpu.models.dit import _linear, quantize_dit_params

    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 96)).astype(np.float32) / 8.0
    x = jnp.asarray(rng.normal(size=(5, 33, 64)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(96,)).astype(np.float32) * 0.1)
    ref = np.asarray(_linear(x, jnp.asarray(w), b))

    tree = {"attn": {"q_w": jnp.asarray(w)}}
    quantize_dit_params(tree, dtype=jnp.int8)
    got = np.asarray(_linear(x, tree["attn"]["q_w"], b, a8=True))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel

    # fp8 weights silently fall back to the weight-only path under a8
    tree2 = {"attn": {"q_w": jnp.asarray(w)}}
    quantize_dit_params(tree2)  # fp8
    got2 = np.asarray(_linear(x, tree2["attn"]["q_w"], b, a8=True))
    rel2 = np.linalg.norm(got2 - ref) / np.linalg.norm(ref)
    assert rel2 < 0.05  # fp8 e4m3 weight-quantization error only


def test_dit_forward_act_quant():
    from aether_tpu.config import DiTConfig
    from aether_tpu.models.dit import (dit_forward, init_dit_params,
                                       quantize_dit_params)
    from aether_tpu.models.rope import prepare_rotary_positional_embeddings

    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_dit_params(
        jax.tree_util.tree_map(lambda x: x, params), dtype=jnp.int8)

    b, f, h, w = 1, 2, 8, 12
    hidden = jax.random.normal(jax.random.PRNGKey(1),
                               (b, f, cfg.in_channels, h, w), jnp.float32)
    text = jax.random.normal(
        jax.random.PRNGKey(2),
        (b, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32)
    ts = jnp.array([500], jnp.int32)
    cos, sin = prepare_rotary_positional_embeddings(
        cfg, h * 8, w * 8, f, vae_scale_factor_spatial=8, fps=12)

    ref = dit_forward(params, cfg, hidden, text, ts, jnp.asarray(cos),
                      jnp.asarray(sin), attn_impl="xla")
    got = dit_forward(qparams, cfg, hidden, text, ts, jnp.asarray(cos),
                      jnp.asarray(sin), attn_impl="xla", act_quant=True)
    assert got.shape == ref.shape and np.all(np.isfinite(np.asarray(got)))
    rel = (np.linalg.norm(np.asarray(got) - np.asarray(ref))
           / np.linalg.norm(np.asarray(ref)))
    assert rel < 0.2, rel  # quantization-scale deviation, not garbage


def test_attn_env_defaults(monkeypatch):
    """Pin the SHIPPED attention defaults (conftest overrides them for the
    exactness tests, so this is the only place the real defaults are
    asserted): env unset -> fixed_max ON, int8 QK^T ON (promoted by the
    full-config quality gate, BASELINE.md round 2), int8 PV OFF."""
    from aether_tpu.models.dit import (
        use_fixed_max_default,
        use_pv_int8_default,
        use_qk_int8_default,
    )

    for var in ("AETHER_ATTN_FIXED_MAX", "AETHER_ATTN_QK8",
                "AETHER_ATTN_PV8"):
        monkeypatch.delenv(var, raising=False)
    assert use_fixed_max_default() is True
    assert use_qk_int8_default() is True
    assert use_pv_int8_default() is False
    monkeypatch.setenv("AETHER_ATTN_QK8", "0")
    assert use_qk_int8_default() is False


def test_fused_mesh_ok_gate():
    """A non-trivial mesh that neither 'tp' (head-divisible) nor 'dp'
    (batch-divisible) can shard must disqualify the fused prologue path so
    _attention takes the unfused _sharded_flash_attention branch instead of
    running the whole chain GSPMD-replicated (advisor finding, round 3)."""
    from jax.sharding import Mesh
    from aether_tpu.models.dit import _fused_mesh_ok

    devs = np.array(jax.devices()[:6]).reshape(2, 3)
    mesh = Mesh(devs, ("dp", "tp"))
    assert _fused_mesh_ok(None, 48, 1)
    assert not _fused_mesh_ok(mesh, 4, 1)      # 4 % 3 != 0, 1 % 2 != 0
    assert _fused_mesh_ok(mesh, 6, 1)          # heads divide tp
    assert _fused_mesh_ok(mesh, 4, 2)          # batch divides dp
    triv = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "tp"))
    assert _fused_mesh_ok(triv, 5, 1)          # trivial mesh: single-chip ok


def test_dit_flops_counter_matches_xla_cost_analysis():
    """Pin the analytic MFU numerator against XLA's own FLOP count.

    The analytic counter (utils/flops.py) counts matmuls only; XLA's
    cost_analysis additionally counts norms/softmax/elementwise, so the
    analytic value must sit just UNDER the XLA total — within a band wide
    enough for the elementwise tail at this width. num_layers=1 because XLA
    cost analysis counts a ``lax.scan`` body ONCE regardless of trip count
    (the DiT scans its stacked blocks)."""
    from aether_tpu.utils.flops import dit_forward_flops

    cfg = DiTConfig(num_layers=1, num_heads=8, head_dim=32,
                    text_embed_dim=64, max_text_seq_length=16,
                    time_embed_dim=64, sample_height=8, sample_width=12)
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    b, f, h, w = 1, 3, 8, 12
    hidden = jnp.zeros((b, f, cfg.in_channels, h, w))
    text = jnp.zeros((b, cfg.max_text_seq_length, cfg.text_embed_dim))
    cos, sin = prepare_rotary_positional_embeddings(
        cfg, h * 8, w * 8, f, vae_scale_factor_spatial=8, fps=12
    )

    fn = jax.jit(lambda p, x, t, ts: dit_forward(p, cfg, x, t, ts,
                                                 cos, sin, attn_impl="xla"))
    cost = fn.lower(params, hidden, text, jnp.array([999])).compile()
    xla_flops = cost.cost_analysis()["flops"]
    analytic = dit_forward_flops(cfg, b, f, h, w)
    assert 0.80 * xla_flops <= analytic <= 1.02 * xla_flops, (
        f"analytic {analytic:.3e} vs xla {xla_flops:.3e}"
    )


def test_vae_decode_flops_counter_matches_xla_cost_analysis():
    """Same pin for the decode counter, with a wider band than the DiT test:
    XLA's conv cost is PADDING-AWARE (border outputs contract fewer valid
    taps), so at this tiny 6x8 spatial grid it sits ~10-15% under the naive
    dense-tap count the analytic counter uses — negligible (<2%) at the real
    480p grids the MFU report divides by. The analytic value must stay in a
    band around the XLA total: well under 2x (would mean a double-counted
    stage) and no more than ~15% above (border effect + elementwise tail)."""
    from aether_tpu.models.vae import decode_frames
    from aether_tpu.utils.flops import vae_decode_flops

    cfg = VAEConfig(block_out_channels=(16, 32, 32, 64), layers_per_block=2,
                    norm_num_groups=8)
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    b, t, hh, ww = 1, 3, 6, 8
    lat = jnp.zeros((b, t, hh, ww, cfg.latent_channels))

    fn = jax.jit(lambda p, z: decode_frames(p, cfg, z)[0])
    cost = fn.lower(params, lat).compile()
    xla_flops = cost.cost_analysis()["flops"]
    analytic = vae_decode_flops(cfg, b, t, hh, ww)
    assert 0.55 * xla_flops <= analytic <= 1.15 * xla_flops, (
        f"analytic {analytic:.3e} vs xla {xla_flops:.3e}"
    )


def test_stacked_batch_decode_equals_serial_decodes():
    """The pipeline's stacked RGB+disparity decode rides one batch-2 pass
    (pipeline._decode_rgb_and_disparity); with the T-major trunk every op is
    batch-independent (GroupNorm stats are per batch element, convs batch
    over rows), so the stacked result must match two serial batch-1 decodes
    to within bf16-accumulation noise. Also covers the chunked/cached path
    (odd first chunk absorbing the remainder)."""
    from aether_tpu.models.vae import vae_decode_chunked

    cfg = VAEConfig(block_out_channels=(8, 16, 16, 32), layers_per_block=1,
                    norm_num_groups=4)
    params = init_vae_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(3)
    za = jnp.asarray(rng.normal(size=(1, 3, 4, 6, cfg.latent_channels)),
                     jnp.float32)
    zb = jnp.asarray(rng.normal(size=(1, 3, 4, 6, cfg.latent_channels)),
                     jnp.float32)
    stacked = vae_decode_chunked(params, cfg, jnp.concatenate([za, zb], 0))
    va = vae_decode_chunked(params, cfg, za)
    vb = vae_decode_chunked(params, cfg, zb)
    np.testing.assert_allclose(np.asarray(stacked),
                               np.asarray(jnp.concatenate([va, vb], 0)),
                               atol=1e-5)
