"""Sharded inference: the pipeline on a (dp, tp) mesh must match single-device
outputs (same PRNG stream, same math — GSPMD only changes the partitioning)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aether_tpu.config import PipelineConfig
from aether_tpu.models import init_dit_params, init_vae_params
from aether_tpu.parallel.mesh import make_mesh
from aether_tpu.pipeline import AetherPipeline


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = PipelineConfig.tiny()
    key = jax.random.PRNGKey(0)
    dit = init_dit_params(key, cfg.dit)
    vae = init_vae_params(jax.random.fold_in(key, 1), cfg.vae)
    text = np.zeros(
        (1, cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim), np.float32
    )
    return cfg, dit, vae, text


def _run(pipe, task="prediction", **kw):
    rng = np.random.default_rng(0)
    image = (rng.uniform(0, 1, (64, 96, 3)) * 255).astype(np.uint8)
    raymap = rng.normal(size=(17, 6, 8, 12)).astype(np.float32)
    return pipe(task=task, image=image, raymap=raymap, height=64, width=96,
                num_frames=17, num_inference_steps=2, fps=12, seed=7, **kw)


def test_sharded_matches_unsharded(tiny_setup):
    cfg, dit, vae, text = tiny_setup
    base = AetherPipeline(cfg, dit, vae, text, compute_dtype=jnp.float32)
    out_ref = _run(base)

    mesh = make_mesh(dp=2, tp=4)
    sharded = AetherPipeline(cfg, dit, vae, text, compute_dtype=jnp.float32,
                             mesh=mesh)
    out_sh = _run(sharded)

    # CFG batch of 2 rides dp; params ride tp. Same math, same PRNG.
    np.testing.assert_allclose(out_sh.rgb, out_ref.rgb, atol=2e-4)
    np.testing.assert_allclose(out_sh.disparity, out_ref.disparity, atol=2e-4)
    np.testing.assert_allclose(out_sh.raymap, out_ref.raymap, atol=2e-4)


def test_sharded_reconstruction_runs(tiny_setup):
    cfg, dit, vae, text = tiny_setup
    mesh = make_mesh(dp=1, tp=8)
    pipe = AetherPipeline(cfg, dit, vae, text, compute_dtype=jnp.float32,
                          mesh=mesh)
    rng = np.random.default_rng(1)
    video = (rng.uniform(0, 1, (17, 64, 96, 3)) * 255).astype(np.uint8)
    out = pipe(task="reconstruction", video=video, height=64, width=96,
               num_frames=17, num_inference_steps=1, fps=12, seed=0)
    assert out.rgb.shape == (17, 64, 96, 3)
    assert np.all(np.isfinite(out.disparity))


def test_batch_reconstruct_matches_shapes_and_runs_on_mesh(tiny_setup):
    """Batched multi-window reconstruction: B windows in one denoise, sharded
    over dp; outputs blend-compatible with the serial path."""
    from aether_tpu.pipeline.windowing import blend_and_merge_window_results

    cfg, dit, vae, text = tiny_setup
    mesh = make_mesh(dp=2, tp=4)
    pipe = AetherPipeline(cfg, dit, vae, text, compute_dtype=jnp.float32,
                          mesh=mesh)
    rng = np.random.default_rng(3)
    video = (rng.uniform(0, 1, (25, 64, 96, 3)) * 255).astype(np.uint8)
    starts = [0, 8]
    windows = np.stack([video[s : s + 17] for s in starts])
    outs = pipe.batch_reconstruct(windows, height=64, width=96, num_frames=17,
                                  num_inference_steps=1, fps=12, seed=0)
    assert len(outs) == 2
    for o in outs:
        assert o.rgb.shape == (17, 64, 96, 3)
        assert np.all(np.isfinite(o.disparity))

    # random weights decode to arbitrary (possibly left-handed) raymaps, which
    # the pose-stitching math rightly rejects; substitute geometrically valid
    # raymaps to exercise the blend stage (real checkpoints produce valid ones)
    from aether_tpu.geometry.raymap import camera_pose_to_raymap

    poses17 = np.broadcast_to(np.eye(4), (17, 4, 4)).copy()
    poses17[:, 0, 3] = np.arange(17) * 0.05
    intr = np.broadcast_to(
        np.array([[96.0, 0, 48], [0, 96.0, 32], [0, 0, 1]]), (17, 3, 3)
    ).copy()
    valid_raymap = np.asarray(
        camera_pose_to_raymap(poses17, intr, height=64, width=96)
    ).astype(np.float32)
    for o in outs:
        o.raymap = valid_raymap.copy()
    rgb, disparity, poses, pointmaps = blend_and_merge_window_results(
        outs, starts, 64, 96, smooth_camera=False
    )
    assert rgb.shape == (25, 64, 96, 3) and poses.shape == (25, 4, 4)
