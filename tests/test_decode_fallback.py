"""Stacked RGB+disparity decode must fall back to serial per-stream decodes
when the batch-2 graph cannot compile (HBM OOM on-chip shows up as a
JaxRuntimeError at dispatch; observed in round-3 bench: the stacked chunk
workspace is 2x the serial one and whether it fits depends on what else is
resident). The fallback is the reference's own serial order
(``aetherv1_pipeline_cogvideox.py:931-940``) — identical numerics."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

import aether_tpu.pipeline.aether as pipe_mod
from aether_tpu.config import PipelineConfig
from aether_tpu.models import init_vae_params


def test_stacked_decode_falls_back_to_serial(monkeypatch):
    cfg = PipelineConfig.tiny()
    vae_params = init_vae_params(jax.random.PRNGKey(0), cfg.vae)
    lat = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, 3, 2 * cfg.vae.latent_channels, 8, 12), jnp.float32)

    rgb_ok, disp_ok = pipe_mod._decode_rgb_and_disparity(
        cfg, jnp.float32, vae_params, lat, tiling=False)

    real = pipe_mod._decode_strip_adaptive
    calls = []

    def oom_on_batch2(config, dtype, params, latents_16, *a, **kw):
        calls.append(latents_16.shape[0])
        if latents_16.shape[0] == 2:
            raise jax.errors.JaxRuntimeError(
                "INTERNAL: remote_compile: HTTP 500 (simulated hbm oom)")
        return real(config, dtype, params, latents_16, *a, **kw)

    monkeypatch.setattr(pipe_mod, "_decode_strip_adaptive", oom_on_batch2)
    rgb, disp = pipe_mod._decode_rgb_and_disparity(
        cfg, jnp.float32, vae_params, lat, tiling=False)

    assert calls == [2, 1, 1]  # stacked attempt, then one per stream
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ok), atol=1e-5)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(disp_ok),
                               atol=1e-5)


def test_stacked_decode_reraises_non_oom(monkeypatch):
    """Only HBM-exhaustion-shaped failures may trigger the serial fallback;
    a genuine kernel/runtime bug would fail identically in the serial
    decodes and the fallback would just bury the root cause (advisor
    finding, round 3)."""

    cfg = PipelineConfig.tiny()
    vae_params = init_vae_params(jax.random.PRNGKey(0), cfg.vae)
    lat = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, 3, 2 * cfg.vae.latent_channels, 8, 12), jnp.float32)

    def broken(config, dtype, params, latents_16, *a, **kw):
        raise jax.errors.JaxRuntimeError(
            "INTERNAL: Mosaic failed to compile (simulated kernel bug)")

    monkeypatch.setattr(pipe_mod, "_decode_strip_adaptive", broken)
    with pytest.raises(jax.errors.JaxRuntimeError, match="Mosaic"):
        pipe_mod._decode_rgb_and_disparity(
            cfg, jnp.float32, vae_params, lat, tiling=False)


def test_scanned_decode_bitmatches_chunked(monkeypatch):
    """AETHER_SCAN_DECODE=1 (one jitted scan per strip) must be BIT-identical
    to the host-loop 2-frame chunking: same chunk boundaries -> same per-chunk
    GroupNorm statistics, conv caches threaded as the scan carry. Covers the
    remainder-absorbing first chunk (t=5, fb=2 -> chunks 3+2), the exact
    division (t=4 -> 2+2) and the single-chunk degenerate (t=2)."""
    cfg = PipelineConfig.tiny()
    vae_params = init_vae_params(jax.random.PRNGKey(0), cfg.vae)
    for t in (5, 4, 2):
        lat = jax.random.normal(
            jax.random.PRNGKey(t), (1, t, cfg.vae.latent_channels, 8, 12),
            jnp.float32)
        monkeypatch.delenv("AETHER_SCAN_DECODE", raising=False)
        chunked = pipe_mod._decode_pixels(cfg, jnp.float32, vae_params, lat,
                                          frame_batch_size=2)
        monkeypatch.setenv("AETHER_SCAN_DECODE", "1")
        scanned = pipe_mod._decode_pixels(cfg, jnp.float32, vae_params, lat,
                                          frame_batch_size=2)
        assert scanned.shape == chunked.shape, t
        np.testing.assert_array_equal(np.asarray(scanned),
                                      np.asarray(chunked))


def test_scan_compile_failure_falls_back_to_host_loop(monkeypatch):
    """A remote-compile transport failure or compile-OOM on the whole-strip
    scan graph (observed on the tunneled runtime, round 4) must fall back to
    the bit-identical host-loop chunk decode for the process lifetime —
    while genuine kernel bugs still re-raise."""

    cfg = PipelineConfig.tiny()
    vae_params = init_vae_params(jax.random.PRNGKey(0), cfg.vae)
    lat = jax.random.normal(jax.random.PRNGKey(9),
                            (1, 4, cfg.vae.latent_channels, 8, 12),
                            jnp.float32)
    monkeypatch.setattr(pipe_mod, "_SCAN_DECODE_STATE", {"ok": None})

    # reference output from the host-loop path, then switch scan on
    monkeypatch.setenv("AETHER_SCAN_DECODE", "0")
    expected = pipe_mod._decode_pixels(cfg, jnp.float32, vae_params, lat, 2)
    monkeypatch.setenv("AETHER_SCAN_DECODE", "1")

    calls = {"n": 0}

    def failing_scan(*a, **k):
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError(
            "INTERNAL: http://127.0.0.1:8093/remote_compile: read body: "
            "response body closed before all bytes were read")

    monkeypatch.setattr(pipe_mod, "_decode_scanned", failing_scan)
    out = pipe_mod._decode_pixels(cfg, jnp.float32, vae_params, lat, 2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expected))
    assert calls["n"] == 1
    # verdict remembered: scan not retried
    out2 = pipe_mod._decode_pixels(cfg, jnp.float32, vae_params, lat, 2)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(expected))
    assert calls["n"] == 1

    # a genuine kernel bug must re-raise, not fall back
    monkeypatch.setattr(pipe_mod, "_SCAN_DECODE_STATE", {"ok": None})

    def kernel_bug(*a, **k):
        raise jax.errors.JaxRuntimeError(
            "INTERNAL: Mosaic failed to compile (simulated kernel bug)")

    monkeypatch.setattr(pipe_mod, "_decode_scanned", kernel_bug)
    with pytest.raises(jax.errors.JaxRuntimeError, match="Mosaic"):
        pipe_mod._decode_pixels(cfg, jnp.float32, vae_params, lat, 2)
