"""End-to-end tiny-config pipeline tests: all three tasks + windowing.

This is SURVEY.md section 7's "minimum end-to-end slice": random-init 2-block DiT +
tiny VAE, 17 frames, CPU-runnable, proving shapes, the denoise scan, CFG plumbing
and the decode path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aether_tpu.config import PipelineConfig
from aether_tpu.geometry import camera_pose_to_raymap, get_intrinsics
from aether_tpu.models import init_dit_params, init_vae_params
from aether_tpu.pipeline import (
    AetherPipeline,
    AetherPipelineOutput,
    blend_and_merge_window_results,
    get_window_starts,
)
from aether_tpu.pipeline.aether import pack_raymap, unpack_raymap

H, W, F = 64, 96, 17


@pytest.fixture(scope="module")
def tiny_pipeline():
    cfg = PipelineConfig.tiny()
    key = jax.random.PRNGKey(0)
    dit_params = init_dit_params(key, cfg.dit, dtype=jnp.float32)
    vae_params = init_vae_params(jax.random.fold_in(key, 1), cfg.vae, jnp.float32)
    text = np.random.default_rng(0).normal(
        size=(1, cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim)
    ).astype(np.float32)
    return AetherPipeline(cfg, dit_params, vae_params, text,
                          attn_impl="xla", compute_dtype=jnp.float32)


def test_pack_unpack_raymap_roundtrip(rng):
    raymap = jnp.asarray(rng.normal(size=(1, 17, 6, 8, 12)).astype(np.float32))
    packed = pack_raymap(raymap)
    assert packed.shape == (1, 5, 24, 8, 12)
    unpacked = unpack_raymap(packed, 17)
    np.testing.assert_allclose(np.asarray(unpacked), np.asarray(raymap), atol=1e-6)


def test_reconstruction_task(tiny_pipeline, rng):
    video = (rng.uniform(0, 1, size=(F, H, W, 3)) * 255).astype(np.uint8)
    out = tiny_pipeline(
        task="reconstruction", video=video, height=H, width=W,
        num_frames=F, num_inference_steps=2, fps=12, seed=42,
    )
    assert out.rgb.shape == (F, H, W, 3)
    assert out.disparity.shape == (F, H, W)
    assert out.raymap.shape == (F, 6, H // 8, W // 8)
    assert out.rgb.min() >= 0.0 and out.rgb.max() <= 1.0
    assert out.disparity.min() >= 0.0  # square keeps it non-negative
    assert np.isfinite(out.raymap).all()


def test_prediction_task_with_raymap_action(tiny_pipeline, rng):
    image = (rng.uniform(0, 1, size=(H, W, 3)) * 255).astype(np.uint8)
    poses = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    poses[:, 2, 3] = np.linspace(0, 1, F)  # forward motion
    K, _ = get_intrinsics(F, H, W, focal=60.0)
    raymap = np.asarray(camera_pose_to_raymap(poses, np.asarray(K),
                                              height=H, width=W))
    out = tiny_pipeline(
        task="prediction", image=image, raymap=raymap, height=H, width=W,
        num_frames=F, num_inference_steps=2, guidance_scale=3.0,
        use_dynamic_cfg=True, fps=12, seed=1,
    )
    assert out.rgb.shape == (F, H, W, 3)
    assert np.isfinite(out.rgb).all()


def test_planning_task(tiny_pipeline, rng):
    obs = (rng.uniform(0, 1, size=(H, W, 3)) * 255).astype(np.uint8)
    goal = (rng.uniform(0, 1, size=(H, W, 3)) * 255).astype(np.uint8)
    out = tiny_pipeline(
        task="planning", image=obs, goal=goal, height=H, width=W,
        num_frames=F, num_inference_steps=2, guidance_scale=3.0, fps=12, seed=2,
    )
    assert out.rgb.shape == (F, H, W, 3)
    assert np.isfinite(out.disparity).all()


def test_task_inference_and_validation(tiny_pipeline, rng):
    video = rng.uniform(0, 1, size=(F, H, W, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="num_frames"):
        tiny_pipeline(video=video, height=H, width=W, num_frames=18)
    with pytest.raises(ValueError, match="fps"):
        tiny_pipeline(video=video, height=H, width=W, num_frames=F, fps=7)
    with pytest.raises(ValueError, match="image"):
        tiny_pipeline(task="reconstruction", image=video[0], height=H, width=W,
                      num_frames=F)
    with pytest.raises(ValueError, match="raymap"):
        tiny_pipeline(video=video, raymap=np.zeros((F, 6, 4, 4)), height=H,
                      width=W, num_frames=F)


def test_determinism_same_seed(tiny_pipeline, rng):
    video = (rng.uniform(0, 1, size=(F, H, W, 3)) * 255).astype(np.uint8)
    kwargs = dict(task="reconstruction", video=video, height=H, width=W,
                  num_frames=F, num_inference_steps=2, fps=12, seed=7)
    out1 = tiny_pipeline(**kwargs)
    out2 = tiny_pipeline(**kwargs)
    np.testing.assert_array_equal(out1.rgb, out2.rgb)
    np.testing.assert_array_equal(out1.raymap, out2.raymap)


# ---------------------------------------------------------------------------
# windowing
# ---------------------------------------------------------------------------


def test_get_window_starts():
    assert get_window_starts(41, 41, 24) == [0]
    assert get_window_starts(100, 41, 24) == [0, 24, 48, 59]
    assert get_window_starts(89, 41, 24) == [0, 24, 48]


def _synthetic_window(rng, poses, focal=60.0, h=64, w=96):
    f = poses.shape[0]
    K, _ = get_intrinsics(f, h, w, focal=focal)
    raymap = np.asarray(
        camera_pose_to_raymap(poses.astype(np.float32), np.asarray(K),
                              height=h, width=w)
    )
    rgb = rng.uniform(0, 1, size=(f, h, w, 3)).astype(np.float32)
    disparity = np.full((f, h, w), 0.5, dtype=np.float32)
    return AetherPipelineOutput(rgb=rgb, disparity=disparity, raymap=raymap)


def test_blend_and_merge_windows(rng):
    """Two overlapping windows along a smooth trajectory stitch continuously."""
    total, size, stride = 25, 17, 8
    poses = np.tile(np.eye(4), (total, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 2.4, total)  # constant-velocity x motion

    starts = get_window_starts(total, size, stride)
    assert starts == [0, 8]
    windows = [_synthetic_window(rng, poses[s : s + size]) for s in starts]

    rgb, disparity, merged_poses, pointmaps = blend_and_merge_window_results(
        windows, starts, height=64, width=96, smooth_camera=False,
    )
    assert rgb.shape == (total, 64, 96, 3)
    assert disparity.shape == (total, 64, 96)
    assert merged_poses.shape == (total, 4, 4)
    assert pointmaps.shape == (total, 64, 96, 3)
    # stitched trajectory must remain monotone in x with roughly constant steps
    x = merged_poses[:, 0, 3]
    steps = np.diff(x)
    assert (steps > 0).all()
    assert steps.std() / steps.mean() < 0.2


def test_tiled_decode_matches_full_away_from_seams():
    """Spatially-tiled VAE decode (used on memory-constrained chips) must agree
    with the full decode up to groupnorm-statistics drift, with exact shape."""
    import jax
    import jax.numpy as jnp

    from aether_tpu.config import PipelineConfig
    from aether_tpu.models import init_vae_params
    from aether_tpu.pipeline.aether import (
        _decode_pixels,
        _decode_pixels_tiled,
        _tile_spans,
    )

    for n, tile, ov in [(60, 32, 8), (90, 48, 12), (30, 48, 12)]:
        spans = _tile_spans(n, tile, ov)
        assert spans[0][0] == 0 and spans[-1][1] == n
        assert all(e - s == min(tile, n) for s, e in spans)
        for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
            assert e0 - s1 >= ov

    cfg = PipelineConfig.tiny()
    vae = init_vae_params(jax.random.PRNGKey(0), cfg.vae)
    z = jax.random.normal(
        jax.random.PRNGKey(1), (1, 2, cfg.vae.latent_channels, 12, 18),
        jnp.float32,
    )
    full = _decode_pixels(cfg, jnp.float32, vae, z)
    tiled = _decode_pixels_tiled(cfg, jnp.float32, vae, z,
                                 tile_latent=(8, 10), min_overlap=(4, 4))
    assert tiled.shape == full.shape
    diff = np.abs(np.asarray(full) - np.asarray(tiled))
    # tiles see different groupnorm stats; agreement is approximate by design
    assert diff.mean() < 0.05, diff.mean()


def test_tiled_encode_matches_full_approximately():
    """Tiled VAE encode (HBM-constrained path) blends latent moments across
    tiles; must be deterministic and close to the untiled encode."""
    import jax
    import jax.numpy as jnp

    from aether_tpu.config import PipelineConfig
    from aether_tpu.models import init_vae_params
    from aether_tpu.pipeline.aether import _encode_pixels, _encode_pixels_tiled

    cfg = PipelineConfig.tiny()
    vae = init_vae_params(jax.random.PRNGKey(0), cfg.vae)
    frames = jax.random.uniform(
        jax.random.PRNGKey(1), (5, 96, 144, 3), jnp.float32, -1, 1
    )
    k = jax.random.PRNGKey(7)
    full = _encode_pixels(cfg, jnp.float32, vae, frames, k)
    tiled = _encode_pixels_tiled(cfg, jnp.float32, vae, frames, k,
                                 tile_latent=(8, 10), min_overlap=(4, 4))
    assert tiled.shape == full.shape
    t2 = _encode_pixels_tiled(cfg, jnp.float32, vae, frames, k,
                              tile_latent=(8, 10), min_overlap=(4, 4))
    np.testing.assert_array_equal(np.asarray(tiled), np.asarray(t2))
    # groupnorm-statistics drift only; gross disagreement means a seam bug
    diff = np.abs(np.asarray(full) - np.asarray(tiled))
    assert diff.mean() < 0.2, diff.mean()


def test_fit_num_frames_and_short_video_windows():
    from aether_tpu.pipeline.windowing import fit_num_frames, get_window_starts

    assert fit_num_frames(100, 41) == 41
    assert fit_num_frames(30, 41) == 25  # shrink to largest allowed window
    assert fit_num_frames(17, 41) == 17
    with pytest.raises(ValueError):
        fit_num_frames(10, 41)
    assert get_window_starts(17, 17, 8) == [0]  # video == one window
    assert get_window_starts(12, 17, 8) == [0]  # shorter than window


def test_explicit_falsy_overrides_honored(tiny_pipeline):
    """use_dynamic_cfg=False for prediction must NOT be re-enabled by the task
    default (regression for the 'x or default' pattern)."""
    from unittest import mock

    import aether_tpu.pipeline.aether as mod

    rng = np.random.default_rng(0)
    image = (rng.uniform(0, 1, (64, 96, 3)) * 255).astype(np.uint8)
    with mock.patch.object(mod, "dynamic_cfg_schedule",
                           wraps=mod.dynamic_cfg_schedule) as spy:
        tiny_pipeline(task="prediction", image=image, height=64, width=96,
                      num_frames=17, num_inference_steps=1,
                      use_dynamic_cfg=False, seed=0)
        assert spy.call_count == 0  # static guidance used
        tiny_pipeline(task="prediction", image=image, height=64, width=96,
                      num_frames=17, num_inference_steps=1, seed=0)
        assert spy.call_count == 1  # None -> task default (dynamic on)


def test_yuv420_wire_roundtrip():
    """Device pack -> host unpack must be near-lossless for smooth content and
    exactly invertible for gray (chroma-free) images."""
    from aether_tpu.pipeline.aether import (_rgb_to_yuv420_wire,
                                            _yuv420_wire_to_rgb)

    rng = np.random.default_rng(0)
    # smooth low-frequency content (what chroma subsampling is built for)
    base = rng.uniform(0.2, 0.8, size=(2, 4, 4, 3)).astype(np.float32)
    rgb = np.repeat(np.repeat(base, 8, axis=1), 8, axis=2)  # (2, 32, 32, 3)
    y, cb, cr = _rgb_to_yuv420_wire(jnp.asarray(rgb))
    assert y.dtype == jnp.uint8 and cb.shape == (2, 16, 16)
    back = _yuv420_wire_to_rgb(y, cb, cr)
    assert np.max(np.abs(back - rgb)) < 0.02

    gray = np.repeat(rng.uniform(0, 1, size=(1, 8, 8, 1)), 3, -1).astype(np.float32)
    back = _yuv420_wire_to_rgb(*_rgb_to_yuv420_wire(jnp.asarray(gray)))
    assert np.max(np.abs(back - gray)) < 0.01  # u8 quantization only

    # wire byte budget: 1.5 B/px
    nbytes = y.size + cb.size + cr.size
    assert nbytes == rgb.shape[0] * rgb.shape[1] * rgb.shape[2] * 3 // 2


def test_yuv420_input_wire():
    """H2D yuv420 codec: device unpack of the host pack must agree with the
    exact u8 upload within chroma-subsampling error on smooth content."""
    from aether_tpu.pipeline.aether import (_rgb_u8_to_yuv420_host,
                                            _u8_to_unit, _yuv420_to_unit)

    rng = np.random.default_rng(3)
    base = rng.uniform(0, 1, size=(2, 4, 6, 3)).astype(np.float32)
    px = np.round(np.repeat(np.repeat(base, 8, 1), 8, 2) * 255).astype(np.uint8)
    y, cb, cr = _rgb_u8_to_yuv420_host(px)
    assert y.shape == (2, 32, 48) and cb.shape == (2, 16, 24)
    got = np.asarray(_yuv420_to_unit(y, cb, cr, jnp.float32))
    exact = np.asarray(_u8_to_unit(px, jnp.float32))
    assert got.shape == exact.shape
    assert np.mean(np.abs(got - exact)) < 0.01
    assert np.max(np.abs(got - exact)) < 0.08

    # gray content has no chroma: must be u8-exact
    gray = np.repeat(rng.integers(0, 256, size=(1, 8, 8, 1), dtype=np.uint8), 3, -1)
    got = np.asarray(_yuv420_to_unit(*_rgb_u8_to_yuv420_host(gray), jnp.float32))
    exact = np.asarray(_u8_to_unit(gray, jnp.float32))
    assert np.max(np.abs(got - exact)) < 2.5 / 255.0


def test_wire_input_pipeline_runs(tiny_pipeline, rng):
    cfg = tiny_pipeline.config
    pipe = AetherPipeline(
        cfg, tiny_pipeline.dit_params, tiny_pipeline.vae_params,
        np.asarray(tiny_pipeline.empty_prompt_embeds[0]),
        attn_impl="xla", compute_dtype=jnp.float32, wire_input="yuv420",
    )
    base = rng.uniform(0, 1, size=(F, H // 8, W // 8, 3))
    video = (np.repeat(np.repeat(base, 8, 1), 8, 2) * 255).astype(np.uint8)
    kwargs = dict(task="reconstruction", video=video, height=H, width=W,
                  num_frames=F, num_inference_steps=1, fps=12, seed=7)
    got = pipe(**kwargs)
    exact = tiny_pipeline(**kwargs)
    assert np.all(np.isfinite(got.rgb))
    # smooth input: the input perturbation must stay small through the model
    assert np.mean(np.abs(got.rgb - exact.rgb)) < 0.12


def test_u8_disparity_wire(tiny_pipeline, rng):
    """u8 sqrt-domain disparity wire: quantization-scale error after squaring."""
    cfg = tiny_pipeline.config
    video = (rng.uniform(0, 1, size=(F, H, W, 3)) * 255).astype(np.uint8)
    kwargs = dict(task="reconstruction", video=video, height=H, width=W,
                  num_frames=F, num_inference_steps=1, fps=12, seed=7)
    exact = tiny_pipeline(**kwargs)
    pipe = AetherPipeline(
        cfg, tiny_pipeline.dit_params, tiny_pipeline.vae_params,
        np.asarray(tiny_pipeline.empty_prompt_embeds[0]),
        attn_impl="xla", compute_dtype=jnp.float32,
        compact_transfer=True, wire_rgb="u8", wire_disparity="u8",
    )
    got = pipe(**kwargs)
    # in-gamut sqrt-disparity: error <= d/du(u^2) * (1/510) ~ 2/255
    in_gamut = exact.disparity <= 1.0
    err = np.abs(got.disparity - exact.disparity)
    assert np.max(err[in_gamut]) < 2.5 / 255.0
    # out-of-gamut values are clipped to 1.0 by design (downstream depth
    # conversion clips disparity to [1e-3, 1] anyway)
    assert np.all(got.disparity <= 1.0 + 1e-6)
    np.testing.assert_allclose(got.raymap, exact.raymap, atol=1e-5)


def test_compact_yuv_wire_pipeline_close_to_exact(tiny_pipeline, rng):
    """The yuv420 wire must only perturb rgb at quantization scale (and leave
    disparity/raymap untouched bit-for-bit vs the fp16/f32 wire)."""
    cfg = tiny_pipeline.config
    video = (rng.uniform(0, 1, size=(F, H, W, 3)) * 255).astype(np.uint8)
    kwargs = dict(task="reconstruction", video=video, height=H, width=W,
                  num_frames=F, num_inference_steps=1, fps=12, seed=7)
    exact = tiny_pipeline(**kwargs)

    pipe_yuv = AetherPipeline(
        cfg, tiny_pipeline.dit_params, tiny_pipeline.vae_params,
        np.asarray(tiny_pipeline.empty_prompt_embeds[0]),
        attn_impl="xla", compute_dtype=jnp.float32,
        compact_transfer=True, wire_rgb="yuv420",
    )
    got = pipe_yuv(**kwargs)
    # luma is carried per-pixel: u8-quantization accurate except where gamut
    # clipping bites (out-of-gamut chroma/luma recombinations)
    luma = lambda x: x @ np.array([0.299, 0.587, 0.114], np.float32)  # noqa
    lerr = np.abs(luma(got.rgb) - luma(exact.rgb))
    assert np.quantile(lerr, 0.99) < 0.01 and lerr.max() < 0.08
    # chroma is 2x2-subsampled: block means must survive the wire
    blk = lambda x: x.reshape(F, H // 2, 2, W // 2, 2, 3).mean((2, 4))  # noqa
    berr = np.abs(blk(got.rgb) - blk(exact.rgb))
    assert np.quantile(berr, 0.99) < 0.03 and berr.max() < 0.1
    assert np.mean(np.abs(got.rgb - exact.rgb)) < 0.05
    np.testing.assert_allclose(got.raymap, exact.raymap, atol=1e-5)
    np.testing.assert_allclose(got.disparity, exact.disparity, atol=1e-3)


def test_defer_host_identical(tiny_pipeline, rng):
    """defer_host=True must resolve to bit-identical outputs."""
    from aether_tpu.pipeline import DeferredOutput

    video = (rng.uniform(0, 1, size=(F, H, W, 3)) * 255).astype(np.uint8)
    kwargs = dict(task="reconstruction", video=video, height=H, width=W,
                  num_frames=F, num_inference_steps=1, fps=12, seed=11)
    eager = tiny_pipeline(**kwargs)
    deferred = tiny_pipeline(**kwargs, defer_host=True)
    assert isinstance(deferred, DeferredOutput)
    out = deferred.resolve()
    assert deferred.resolve() is out  # idempotent
    np.testing.assert_array_equal(out.rgb, eager.rgb)
    np.testing.assert_array_equal(out.disparity, eager.disparity)
    np.testing.assert_array_equal(out.raymap, eager.raymap)


def test_wire_mode_defaults_are_exact(tiny_pipeline, rng):
    """Compact defaults: u8 rgb (1/255-exact) + fp16 disparity; lossy wires
    require explicit opt-in."""
    assert tiny_pipeline._wire_modes(False, 64, 96) == ("f32", "f32")
    assert tiny_pipeline._wire_modes(True, 64, 96) == ("u8", "fp16")

    cfg = tiny_pipeline.config
    lossy = AetherPipeline(
        cfg, tiny_pipeline.dit_params, tiny_pipeline.vae_params,
        np.asarray(tiny_pipeline.empty_prompt_embeds[0]),
        attn_impl="xla", compute_dtype=jnp.float32,
        wire_rgb="yuv420", wire_disparity="u8",
    )
    assert lossy._wire_modes(True, 64, 96) == ("yuv420", "u8")
    assert lossy._wire_modes(True, 63, 96) == ("u8", "u8")  # odd dims fall back

    # compact u8 default tracks the exact f32 wire within quantization
    video = (rng.uniform(0, 1, size=(F, H, W, 3)) * 255).astype(np.uint8)
    kwargs = dict(task="reconstruction", video=video, height=H, width=W,
                  num_frames=F, num_inference_steps=1, fps=12, seed=3)
    exact = tiny_pipeline(**kwargs)
    compact = AetherPipeline(
        cfg, tiny_pipeline.dit_params, tiny_pipeline.vae_params,
        np.asarray(tiny_pipeline.empty_prompt_embeds[0]),
        attn_impl="xla", compute_dtype=jnp.float32, compact_transfer=True,
    )
    got = compact(**kwargs)
    assert np.max(np.abs(got.rgb - exact.rgb)) <= (0.5 / 255.0) + 1e-6
    assert np.max(np.abs(got.disparity - exact.disparity)) < 2e-3  # fp16 wire


def test_batched_tiled_encode_matches_serial():
    """The batched-window tiled encode (one graph per tile, windows on the VAE
    batch axis) must reproduce the serial per-window path EXACTLY — same tiles,
    same feathering, same per-window posterior keys (VERDICT round 1, item 5b)."""
    import jax
    import jax.numpy as jnp

    from aether_tpu.config import PipelineConfig
    from aether_tpu.models import init_vae_params
    from aether_tpu.pipeline.aether import (
        _encode_pixels_tiled,
        _encode_pixels_tiled_batch,
    )

    cfg = PipelineConfig.tiny()
    vae = init_vae_params(jax.random.PRNGKey(0), cfg.vae)
    video = jax.random.uniform(
        jax.random.PRNGKey(1), (3, 5, 96, 144, 3), jnp.float32, -1, 1
    )
    keys = [jax.random.fold_in(jax.random.PRNGKey(7), i) for i in range(3)]

    serial = jnp.concatenate([
        _encode_pixels_tiled(cfg, jnp.float32, vae, video[i], keys[i],
                             tile_latent=(8, 10), min_overlap=(4, 4))
        for i in range(3)
    ], axis=0)
    batched = _encode_pixels_tiled_batch(cfg, jnp.float32, vae, video, keys,
                                         tile_latent=(8, 10),
                                         min_overlap=(4, 4))
    np.testing.assert_allclose(np.asarray(batched), np.asarray(serial),
                               atol=1e-5)


def test_batch_reconstruct_defer_host(tiny_pipeline, rng):
    """batch_reconstruct(defer_host=True) resolves to the same outputs as the
    synchronous call."""
    video = (rng.uniform(0, 1, (25, 64, 96, 3)) * 255).astype(np.uint8)
    windows = np.stack([video[0:17], video[8:25]])
    sync = tiny_pipeline.batch_reconstruct(
        windows, height=64, width=96, num_frames=17, num_inference_steps=1,
        fps=12, seed=3)
    deferred = tiny_pipeline.batch_reconstruct(
        windows, height=64, width=96, num_frames=17, num_inference_steps=1,
        fps=12, seed=3, defer_host=True)
    resolved = deferred.resolve()
    assert len(resolved) == len(sync) == 2
    for a, b in zip(resolved, sync):
        np.testing.assert_array_equal(a.rgb, b.rgb)
        np.testing.assert_array_equal(a.disparity, b.disparity)
        np.testing.assert_array_equal(a.raymap, b.raymap)


def test_adaptive_full_strip_decode(monkeypatch):
    """AETHER_FULL_STRIP_DECODE=1 tries the whole-clip strip decode and
    permanently falls back to chunking after one allocation failure."""
    import jax
    import jax.numpy as jnp

    from aether_tpu.config import PipelineConfig
    from aether_tpu.models import init_vae_params
    from aether_tpu.pipeline import aether as A

    cfg = PipelineConfig.tiny()
    vae = init_vae_params(jax.random.PRNGKey(0), cfg.vae)
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 16, 8, 12), jnp.float32)

    chunked = A._decode_pixels(cfg, jnp.float32, vae, z, 2)

    # flag off: adaptive is a no-op passthrough to the chunked path
    monkeypatch.delenv("AETHER_FULL_STRIP_DECODE", raising=False)
    monkeypatch.setitem(A._FULL_STRIP_STATE, "ok", None)
    out = A._decode_strip_adaptive(cfg, jnp.float32, vae, z, 2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(chunked))

    # flag on, healthy runtime: full-strip result (== chunked here ONLY
    # because f_lat=3 fits one chunk — multi-chunk norm stats differ, which
    # is why full-strip is an opt-in numerics trade) and the verdict is
    # remembered as True
    monkeypatch.setenv("AETHER_FULL_STRIP_DECODE", "1")
    monkeypatch.setitem(A._FULL_STRIP_STATE, "ok", None)
    out = A._decode_strip_adaptive(cfg, jnp.float32, vae, z, 2)
    assert A._FULL_STRIP_STATE["ok"] is True
    np.testing.assert_allclose(np.asarray(out), np.asarray(chunked), atol=1e-5)

    # flag on, allocation failure: falls back to chunking and remembers
    def boom(*a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory in hbm")

    monkeypatch.setitem(A._FULL_STRIP_STATE, "ok", None)
    monkeypatch.setattr(A, "_decode_full", boom)
    out = A._decode_strip_adaptive(cfg, jnp.float32, vae, z, 2)
    assert A._FULL_STRIP_STATE["ok"] is False
    np.testing.assert_array_equal(np.asarray(out), np.asarray(chunked))
    # second call goes straight to chunked without retrying the strip
    out2 = A._decode_strip_adaptive(cfg, jnp.float32, vae, z, 2)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(chunked))


def test_batch_reconstruct_matches_serial_calls(tiny_pipeline, rng):
    """batch_reconstruct must reproduce a serial per-window loop (same seed
    per call, like the reference's per-call generator re-seeding): same VAE
    keys, broadcast init/SDE noise, identical outputs up to batching
    numerics."""
    video = (rng.uniform(0, 1, (25, 64, 96, 3)) * 255).astype(np.uint8)
    windows = np.stack([video[0:17], video[8:25]])
    kw = dict(height=64, width=96, num_frames=17, num_inference_steps=2,
              fps=12, seed=11)
    batched = tiny_pipeline.batch_reconstruct(windows, **kw)
    serial = [
        tiny_pipeline(task="reconstruction", video=w, guidance_scale=1.0,
                      use_dynamic_cfg=False, **kw)
        for w in windows
    ]
    for b, s in zip(batched, serial):
        np.testing.assert_allclose(b.rgb, s.rgb, atol=2e-4)
        np.testing.assert_allclose(b.disparity, s.disparity, atol=2e-4)
        np.testing.assert_allclose(b.raymap, s.raymap, atol=2e-4)


def test_segmented_denoise_matches_single_scan(tiny_pipeline, rng, monkeypatch):
    """Splitting the denoise scan into bounded segments (the tunneled-worker
    watchdog workaround) must be bit-identical to one long scan: absolute
    step indexing for plan/guidance/SDE keys."""
    image = (rng.uniform(0, 1, (64, 96, 3)) * 255).astype(np.uint8)
    kw = dict(task="prediction", image=image, height=64, width=96,
              num_frames=17, num_inference_steps=5, fps=12, seed=9)
    monkeypatch.delenv("AETHER_DENOISE_SEG", raising=False)
    ref = tiny_pipeline(**kw)
    monkeypatch.setenv("AETHER_DENOISE_SEG", "2")  # segments of 2,2,1
    seg = tiny_pipeline(**kw)
    np.testing.assert_array_equal(seg.rgb, ref.rgb)
    np.testing.assert_array_equal(seg.disparity, ref.disparity)
    np.testing.assert_array_equal(seg.raymap, ref.raymap)


def test_segmented_denoise_emits_progress_events(tiny_pipeline, rng,
                                                 monkeypatch):
    """With a stage listener registered, each completed denoise segment emits
    a ("denoise", "progress", frac) event — the web UI's live step counter.
    Headless (no listener) the driver never blocks between segments, and an
    unsegmented run emits no progress events at all."""
    from aether_tpu.utils.profiling import (
        add_stage_listener,
        remove_stage_listener,
    )

    image = (rng.uniform(0, 1, (64, 96, 3)) * 255).astype(np.uint8)
    kw = dict(task="prediction", image=image, height=64, width=96,
              num_frames=17, num_inference_steps=5, fps=12, seed=9)
    events = []

    def listener(name, event, seconds):
        if event == "progress":
            events.append((name, seconds))

    add_stage_listener(listener)
    try:
        monkeypatch.setenv("AETHER_DENOISE_SEG", "2")
        tiny_pipeline(**kw)
        assert events == [("denoise", 0.4), ("denoise", 0.8),
                          ("denoise", 1.0)], events
        events.clear()
        monkeypatch.delenv("AETHER_DENOISE_SEG", raising=False)
        tiny_pipeline(**kw)  # CPU default: one segment -> no progress spam
        assert events == []
    finally:
        remove_stage_listener(listener)


def test_batched_rgb_disparity_decode_matches_serial(tiny_pipeline, rng,
                                                     monkeypatch):
    """The stacked batch-2 RGB+disparity decode must reproduce the two
    serial 16-ch passes. VAE convs are batch-equivariant mathematically, but
    XLA picks a different reduction order for the batch-2 graph, so agreement
    is to f32 rounding (~6e-7 observed), not bit-exact."""
    video = (rng.uniform(0, 1, size=(F, H, W, 3)) * 255).astype(np.uint8)
    kw = dict(task="reconstruction", video=video, height=H, width=W,
              num_frames=F, num_inference_steps=2, fps=12, seed=7)
    batched = tiny_pipeline(**kw)
    monkeypatch.setenv("AETHER_BATCHED_DECODE", "0")
    serial = tiny_pipeline(**kw)
    np.testing.assert_allclose(batched.rgb, serial.rgb, atol=1e-5)
    np.testing.assert_allclose(batched.disparity, serial.disparity, atol=1e-5)
    np.testing.assert_array_equal(batched.raymap, serial.raymap)


def test_blend_rewrite_matches_serial_oracle():
    """The vectorized blend (stitch_overlap / batched SLERP / vmapped
    unprojection) must reproduce the original serial per-frame implementation
    bit-near (oracle fixture captured from the pre-rewrite code, VERDICT r2
    item 5) — for the demo path (with and without pointmap alignment) AND the
    rel-pose path on the same windows."""
    import pathlib

    from aether_tpu.eval.rel_pose import blend_window_outputs
    from aether_tpu.geometry.raymap import raymap_to_poses
    from aether_tpu.geometry.rays import get_intrinsics

    fix = pathlib.Path(__file__).parent / "fixtures" / "blend_oracle.npz"
    if not fix.exists():
        pytest.skip("blend oracle fixture not generated")
    g = np.load(fix)
    starts = [int(s) for s in g["starts"]]

    class Res:
        pass

    results = []
    for i in range(len(starts)):
        r = Res()
        r.rgb = g[f"in_rgb_{i}"]
        r.disparity = g[f"in_disp_{i}"]
        r.raymap = g[f"in_raymap_{i}"]
        results.append(r)
    T, H, W = results[0].disparity.shape

    rgb, disp, poses, pms = blend_and_merge_window_results(
        results, starts, H, W, smooth_camera=False, align_pointmaps=False)
    np.testing.assert_allclose(rgb, g["rgb"], atol=1e-6)
    np.testing.assert_allclose(disp, g["disparity"], atol=1e-6)
    np.testing.assert_allclose(poses, g["poses"], atol=1e-6)
    np.testing.assert_allclose(pms, g["pointmaps"], atol=1e-4)

    rgb, disp, poses, pms = blend_and_merge_window_results(
        results, starts, H, W, smooth_camera=False, align_pointmaps=True)
    np.testing.assert_allclose(rgb, g["pm_rgb"], atol=1e-6)
    np.testing.assert_allclose(poses, g["pm_poses"], atol=1e-6)
    np.testing.assert_allclose(pms, g["pm_pointmaps"], atol=1e-4)

    wins = []
    for s, r in zip(starts, results):
        p, fx, fy = raymap_to_poses(r.raymap, ray_o_scale_inv=0.1)
        K, f = get_intrinsics(batch_size=T, h=H, w=W, fovx=fx, fovy=fy)
        wins.append(dict(range=(s, s + T), rgb=r.rgb, disparity=r.disparity,
                         poses=np.asarray(p), focals=np.asarray(f)))
    rp = blend_window_outputs(wins)
    np.testing.assert_allclose(rp["rgb"], g["rp_rgb"], atol=1e-6)
    np.testing.assert_allclose(rp["disparity"], g["rp_disparity"], atol=1e-6)
    np.testing.assert_allclose(rp["poses"], g["rp_poses"], atol=1e-6)
    np.testing.assert_allclose(rp["focals"], g["rp_focals"], atol=1e-6)


def test_interpolate_poses_batch_matches_scalar(rng):
    """Batched SLERP == per-frame scalar interpolate_poses, including the
    near-identity lerp branch and degenerate rotations."""
    from scipy.spatial.transform import Rotation as R

    from aether_tpu.geometry.smoothing import (
        interpolate_poses,
        interpolate_poses_batch,
    )

    n = 16
    p1 = np.broadcast_to(np.eye(4), (n, 4, 4)).copy()
    p2 = np.broadcast_to(np.eye(4), (n, 4, 4)).copy()
    p1[:, :3, :3] = R.random(n, rng=np.random.default_rng(0)).as_matrix()
    # half the pairs nearly identical (lerp branch), half far apart
    p2[: n // 2, :3, :3] = R.from_rotvec(
        R.from_matrix(p1[: n // 2, :3, :3]).as_rotvec() + 1e-5
    ).as_matrix()
    p2[n // 2 :, :3, :3] = R.random(
        n // 2, rng=np.random.default_rng(1)).as_matrix()
    p1[:, :3, 3] = rng.normal(size=(n, 3))
    p2[:, :3, 3] = rng.normal(size=(n, 3))
    p2[-1, :3, :3] = 0.0  # degenerate: projected to identity on both paths
    w = np.linspace(1, 0, n)

    batched = interpolate_poses_batch(p1, p2, w)
    for i in range(n):
        np.testing.assert_allclose(
            batched[i], interpolate_poses(p1[i], p2[i], w[i]), atol=1e-9,
            err_msg=f"pair {i}")
