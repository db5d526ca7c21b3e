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


def test_tp_flash_attention_matches_unsharded():
    """The Pallas flash kernel must partition under tp (VERDICT round 1, item 1):
    8-head DiT on the 8-device mesh with attn_impl='flash_interpret' under tp=8
    (1 head/chip — exercises heads_per_cell clamping 4 -> 1) must match the
    unsharded XLA path."""
    from aether_tpu.config import DiTConfig
    from aether_tpu.models.dit import dit_forward, init_dit_params
    from aether_tpu.models.rope import prepare_rotary_positional_embeddings
    from aether_tpu.parallel.mesh import dit_param_sharding, shard_params

    cfg = DiTConfig(
        num_layers=2, num_heads=8, head_dim=16, text_embed_dim=32,
        max_text_seq_length=8, time_embed_dim=32, sample_height=8,
        sample_width=12,
    )
    key = jax.random.PRNGKey(5)
    params = init_dit_params(key, cfg)
    f, h, w = 3, 8, 12
    rng = np.random.default_rng(11)
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

    mesh = make_mesh(dp=1, tp=8)
    sh_params = shard_params(params, dit_param_sharding(cfg, mesh), mesh)
    with mesh:
        out = jax.jit(
            lambda p, x, e, ts: dit_forward(
                p, cfg, x, e, ts, cos, sin, attn_impl="flash_interpret",
                mesh=mesh,
            )
        )(sh_params, hidden, text, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    # int8 QK^T under the same tp=8 shard_map: the quantized path is
    # approximate by design, so the tolerance is looser — this guards the
    # scalar-prefetch plumbing (per-shard bounds/scales) under partitioning
    with mesh:
        out8 = jax.jit(
            lambda p, x, e, ts: dit_forward(
                p, cfg, x, e, ts, cos, sin, attn_impl="flash_interpret",
                mesh=mesh, fixed_max=True, qk_int8=True,
            )
        )(sh_params, hidden, text, t)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(ref), atol=5e-2)


def test_sp_flash_attention_matches_unsharded():
    """Sequence/context parallelism: the flash kernel under sp=8 (q-token
    axis sharded, K/V all-gathered per shard) must match the unsharded XLA
    path. The 68-token stream (8 text + 60 video) does NOT divide by 8, so
    this also exercises the pad-and-kv_valid path."""
    from aether_tpu.config import DiTConfig
    from aether_tpu.models.dit import dit_forward, init_dit_params
    from aether_tpu.models.rope import prepare_rotary_positional_embeddings
    from aether_tpu.parallel.mesh import dit_param_sharding, shard_params

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

    for dp, tp, sp in ((1, 1, 8), (1, 2, 4)):
        mesh = make_mesh(dp=dp, tp=tp, sp=sp)
        sh_params = shard_params(params, dit_param_sharding(cfg, mesh), mesh)
        with mesh:
            out = jax.jit(
                lambda p, x, e, ts, m=mesh: dit_forward(
                    p, cfg, x, e, ts, cos, sin, attn_impl="flash_interpret",
                    mesh=m,
                )
            )(sh_params, hidden, text, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, err_msg=f"tp={tp} sp={sp}")


def test_sp_pipeline_runs(tiny_setup):
    """Full pipeline on a 3-axis (dp=2, tp=2, sp=2) mesh."""
    cfg, dit, vae, text = tiny_setup
    mesh = make_mesh(dp=2, tp=2, sp=2)
    pipe = AetherPipeline(cfg, dit, vae, text, compute_dtype=jnp.float32,
                          attn_impl="flash_interpret", mesh=mesh)
    out = _run(pipe)
    base = AetherPipeline(cfg, dit, vae, text, compute_dtype=jnp.float32,
                          attn_impl="xla")
    out_ref = _run(base)
    np.testing.assert_allclose(out.rgb, out_ref.rgb, atol=2e-4)
    np.testing.assert_allclose(out.disparity, out_ref.disparity, atol=2e-4)


def test_tp_flash_pipeline_runs(tiny_setup):
    """Full pipeline with the flash kernel partitioned under (dp=2, tp=4)."""
    cfg, dit, vae, text = tiny_setup
    mesh = make_mesh(dp=2, tp=4)
    base = AetherPipeline(cfg, dit, vae, text, compute_dtype=jnp.float32,
                          attn_impl="xla")
    out_ref = _run(base)
    sharded = AetherPipeline(cfg, dit, vae, text, compute_dtype=jnp.float32,
                             attn_impl="flash_interpret", mesh=mesh)
    out_sh = _run(sharded)
    np.testing.assert_allclose(out_sh.rgb, out_ref.rgb, atol=2e-4)
    np.testing.assert_allclose(out_sh.disparity, out_ref.disparity, atol=2e-4)


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


def test_batch_reconstruct_pads_short_chunk_to_dp(tiny_setup):
    """A tail chunk smaller than dp (here 2 windows on dp=4) must still run:
    batch_reconstruct pads by repeating the last window (exact copies — keys
    and noise are shared) and drops the padding on resolve. Outputs match the
    unsharded batched path."""
    cfg, dit, vae, text = tiny_setup
    rng = np.random.default_rng(5)
    video = (rng.uniform(0, 1, (25, 64, 96, 3)) * 255).astype(np.uint8)
    windows = np.stack([video[0:17], video[8:25]])

    ref = AetherPipeline(cfg, dit, vae, text, compute_dtype=jnp.float32)
    outs_ref = ref.batch_reconstruct(windows, height=64, width=96,
                                     num_frames=17, num_inference_steps=1,
                                     fps=12, seed=0)

    mesh = make_mesh(dp=4, tp=2)
    pipe = AetherPipeline(cfg, dit, vae, text, compute_dtype=jnp.float32,
                          mesh=mesh)
    outs = pipe.batch_reconstruct(windows, height=64, width=96, num_frames=17,
                                  num_inference_steps=1, fps=12, seed=0)
    assert len(outs) == 2
    for o, r in zip(outs, outs_ref):
        np.testing.assert_allclose(o.rgb, r.rgb, atol=2e-4)
        np.testing.assert_allclose(o.disparity, r.disparity, atol=2e-4)
        np.testing.assert_allclose(o.raymap, r.raymap, atol=2e-4)


def test_quantized_weights_shard_under_mesh(tiny_setup):
    """The int8 deployment layout ({"q", "s"} leaves) must shard over the tp
    mesh exactly like the bf16 tree — the <10 s north star is tp=8 ON TOP of
    int8 weights. Sharded quantized output == unsharded quantized output."""
    from aether_tpu.models.dit import quantize_dit_params

    cfg, dit, vae, text = tiny_setup
    qdit = quantize_dit_params(
        jax.tree_util.tree_map(lambda x: x, dit), dtype=jnp.int8
    )
    ref = AetherPipeline(cfg, qdit, vae, text, compute_dtype=jnp.float32)
    out_ref = _run(ref)

    mesh = make_mesh(dp=2, tp=4)
    sharded = AetherPipeline(cfg, qdit, vae, text, compute_dtype=jnp.float32,
                             mesh=mesh)
    w1 = sharded.dit_params["blocks"]["mlp"]["w1"]
    assert w1["q"].addressable_shards[0].data.size * 4 == w1["q"].size
    out_sh = _run(sharded)
    np.testing.assert_allclose(out_sh.rgb, out_ref.rgb, atol=2e-4)
    np.testing.assert_allclose(out_sh.disparity, out_ref.disparity, atol=2e-4)
    np.testing.assert_allclose(out_sh.raymap, out_ref.raymap, atol=2e-4)


def test_cfg_pair_physically_shards_over_dp(tiny_setup, monkeypatch):
    """Prove the uncond/cond CFG pair is SPLIT across dp, not replicated
    (VERDICT r2 item 7). The flash shard_map traces its body with per-shard
    shapes, so recording the q shapes seen by the kernel shows exactly what
    one chip computes: batch 2/dp = 1 and heads 4/tp = 1. Numerical parity
    of the dp=2 prediction against the single-device run is re-pinned on
    the same outputs."""
    import aether_tpu.models.dit as dit_mod

    cfg, dit, vae, text = tiny_setup
    base = AetherPipeline(cfg, dit, vae, text, compute_dtype=jnp.float32,
                          attn_impl="xla")
    out_ref = _run(base)

    recorded = []
    real_flash = dit_mod.flash_attention

    def recording_flash(q, k, v, **kw):
        recorded.append(tuple(q.shape))
        return real_flash(q, k, v, **kw)

    monkeypatch.setattr(dit_mod, "flash_attention", recording_flash)

    # the fused-prologue default path enters via fused_joint_attention with
    # per-shard [B_loc, S, H_loc*D] projections — record the same
    # (batch, heads) per-shard view from there
    import aether_tpu.ops.attn_prologue as prologue_mod

    real_fused = prologue_mod.fused_joint_attention

    def recording_fused(xq, xk, xv, *a, num_heads, head_dim, **kw):
        recorded.append((xq.shape[0], num_heads))
        return real_fused(xq, xk, xv, *a, num_heads=num_heads,
                          head_dim=head_dim, **kw)

    monkeypatch.setattr(prologue_mod, "fused_joint_attention", recording_fused)
    mesh = make_mesh(dp=2, tp=4)
    pipe = AetherPipeline(cfg, dit, vae, text, compute_dtype=jnp.float32,
                          attn_impl="flash_interpret", mesh=mesh)
    # the recorder only fires at TRACE time: drop any cached compilation of
    # the identical denoise signature left by earlier tests in this process
    from aether_tpu.pipeline.aether import _denoise_segment

    _denoise_segment.clear_cache()
    out = _run(pipe)  # prediction => do_cfg=True, batch-2 pair in _denoise

    # per-shard view: the CFG pair contributes batch 1 per dp cell and the
    # 4 heads split 1 per tp cell — the pair physically rides dp
    assert (1, 1) in {s[:2] for s in recorded}, recorded
    # and no kernel call saw the full replicated pair
    assert all(s[0] < 2 for s in recorded), recorded

    np.testing.assert_allclose(out.rgb, out_ref.rgb, atol=2e-4)
    np.testing.assert_allclose(out.disparity, out_ref.disparity, atol=2e-4)
