"""Opt-in CFG prefix skip (AETHER_CFG_SKIP_TOL): while the dynamic-CFG ramp
sits at ~1.0, the uncond stream is skipped (single-stream segments). Lossy by
one f32 rounding even at s==1.0, hence opt-in — these tests pin the segment
arithmetic and the near-equality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aether_tpu.config import PipelineConfig
from aether_tpu.models import init_dit_params
from aether_tpu.pipeline import aether as A
from aether_tpu.schedule.dpm import make_sampling_plan


@pytest.fixture
def tiny_setup():
    cfg = PipelineConfig.tiny()
    key = jax.random.PRNGKey(0)
    dit = init_dit_params(key, cfg.dit, dtype=jnp.float32)
    f_lat, h, w = 3, 8, 12
    cond = jax.random.normal(jax.random.PRNGKey(1),
                             (1, f_lat, 40, h, w), jnp.float32) * 0.1
    text = jnp.zeros((1, cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim),
                     jnp.float32)
    from aether_tpu.models.rope import prepare_rotary_positional_embeddings

    cos, sin = prepare_rotary_positional_embeddings(
        cfg.dit, h * 8, w * 8, f_lat, vae_scale_factor_spatial=8, fps=12)
    return cfg, dit, cond, text, jnp.asarray(cos), jnp.asarray(sin)


def _run(cfg, dit, cond, text, cos, sin, guidance, steps):
    plan = make_sampling_plan(cfg.scheduler, steps)
    return A._denoise(cfg, "xla", jnp.float32, "prediction", True, dit, text,
                      cond, plan, jnp.asarray(guidance, jnp.float32), cos,
                      sin, jax.random.PRNGKey(7))


def test_cfg_skip_prefix_matches_full_cfg(tiny_setup, monkeypatch):
    cfg, dit, cond, text, cos, sin = tiny_setup
    steps = 6
    # ramp exactly like dynamic CFG: ~1.0 early, >1 later
    guidance = np.array([1.0, 1.0 + 5e-4, 1.0, 2.0, 2.5, 3.0], np.float32)

    monkeypatch.delenv("AETHER_CFG_SKIP_TOL", raising=False)
    ref = _run(cfg, dit, cond, text, cos, sin, guidance, steps)

    calls = []
    orig = A._denoise_segment

    def spy(config, attn_impl, compute_dtype, task, do_cfg, *args, **kw):
        calls.append((kw["seg_len"], do_cfg))
        return orig(config, attn_impl, compute_dtype, task, do_cfg, *args, **kw)

    monkeypatch.setattr(A, "_denoise_segment", spy)
    monkeypatch.setenv("AETHER_CFG_SKIP_TOL", "1e-3")
    out = _run(cfg, dit, cond, text, cos, sin, guidance, steps)

    # steps 0-2 are within tol -> one single-stream segment, then CFG
    assert calls == [(3, False), (3, True)]
    # lossy only at f32 rounding scale: a + 1.0*(b - a) vs b
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_cfg_skip_all_steps_near_one_runs_single_stream(tiny_setup, monkeypatch):
    cfg, dit, cond, text, cos, sin = tiny_setup
    guidance = np.ones(4, np.float32)
    calls = []
    orig = A._denoise_segment

    def spy(config, attn_impl, compute_dtype, task, do_cfg, *args, **kw):
        calls.append(do_cfg)
        return orig(config, attn_impl, compute_dtype, task, do_cfg, *args, **kw)

    monkeypatch.setattr(A, "_denoise_segment", spy)
    monkeypatch.setenv("AETHER_CFG_SKIP_TOL", "1e-3")
    _run(cfg, dit, cond, text, cos, sin, guidance, 4)
    assert calls == [False]


def test_cfg_skip_off_by_default(tiny_setup, monkeypatch):
    cfg, dit, cond, text, cos, sin = tiny_setup
    guidance = np.array([1.0, 1.0, 3.0], np.float32)
    calls = []
    orig = A._denoise_segment

    def spy(config, attn_impl, compute_dtype, task, do_cfg, *args, **kw):
        calls.append(do_cfg)
        return orig(config, attn_impl, compute_dtype, task, do_cfg, *args, **kw)

    monkeypatch.setattr(A, "_denoise_segment", spy)
    monkeypatch.delenv("AETHER_CFG_SKIP_TOL", raising=False)
    _run(cfg, dit, cond, text, cos, sin, guidance, 3)
    assert calls == [True]  # one full-CFG segment, no skip
