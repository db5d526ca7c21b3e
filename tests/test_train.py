"""Training stack: latent precompute -> loader -> Trainer loss decreases."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aether_tpu.config import DiTConfig, PipelineConfig


@pytest.fixture(scope="module")
def tiny_pipe():
    from aether_tpu.models import init_dit_params, init_vae_params
    from aether_tpu.pipeline import AetherPipeline

    cfg = PipelineConfig.tiny()
    key = jax.random.PRNGKey(0)
    return AetherPipeline(
        cfg,
        init_dit_params(key, cfg.dit),
        init_vae_params(jax.random.fold_in(key, 1), cfg.vae),
        np.zeros((1, cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim),
                 np.float32),
        compute_dtype=jnp.float32,
    )


def test_precompute_and_load_latents(tmp_path, tiny_pipe):
    from aether_tpu.train.data import latent_batches, precompute_latents

    rng = np.random.default_rng(0)
    f, h, w = 5, 32, 48
    poses = np.broadcast_to(np.eye(4), (f, 4, 4)).copy()
    poses[:, 0, 3] = np.arange(f) * 0.1
    intr = np.broadcast_to(
        np.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]], np.float64),
        (f, 3, 3),
    ).copy()
    clips = [
        {
            "name": f"clip_{i}",
            "rgb": rng.uniform(0, 1, (f, h, w, 3)),
            "disparity": rng.uniform(0, 1, (f, h, w)),
            "poses": poses,
            "intrinsics": intr,
        }
        for i in range(3)
    ]
    written = precompute_latents(tiny_pipe, clips, str(tmp_path / "latents"))
    assert len(written) == 3

    batches = latent_batches(str(tmp_path / "latents"),
                             tiny_pipe.config.dit, batch_size=2, seed=1)
    batch = next(batches)
    f_lat = (f - 1) // tiny_pipe.config.vae_scale_factor_temporal + 1
    h_lat = h // tiny_pipe.config.vae_scale_factor_spatial
    w_lat = w // tiny_pipe.config.vae_scale_factor_spatial
    assert batch["clean_latents"].shape == (2, f_lat, 56, h_lat, w_lat)
    assert batch["condition_latents"].shape == (2, f_lat, 40, h_lat, w_lat)
    assert np.all(np.isfinite(batch["clean_latents"]))
    # camera channels of conditioning must equal the targets' camera channels
    np.testing.assert_array_equal(batch["condition_latents"][:, :, 16:],
                                  batch["clean_latents"][:, :, 32:])


def test_trainer_loss_decreases_on_fixed_batch(tmp_path):
    """Overfit check: a few steps on one repeated batch must reduce the loss."""
    from aether_tpu.train.trainer import (
        TrainConfig,
        Trainer,
        synthetic_batches,
    )

    cfg = DiTConfig.tiny()
    tcfg = TrainConfig(learning_rate=3e-3, warmup_steps=1, total_steps=30,
                       grad_clip_norm=1.0, remat=True, log_every=100)
    trainer = Trainer(cfg, tcfg, seed=0)

    batch = next(synthetic_batches(cfg, batch_size=2, seed=0))

    def fixed():
        while True:
            yield batch

    import jax as _jax

    state0 = trainer.state
    key = _jax.random.PRNGKey(42)
    loss_first = float(_jax.device_get(
        trainer._step_fn(state0, batch, key)[1]
    ))
    trainer.fit(fixed(), steps=20)
    loss_last = float(_jax.device_get(
        trainer._step_fn(trainer.state, batch, key)[1]
    ))
    assert loss_last < loss_first, (loss_first, loss_last)
