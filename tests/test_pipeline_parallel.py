"""GPipe pipeline parallelism (``parallel/pipeline.py``).

The pp executor reschedules the SAME scanned block body over a 'pp' mesh axis
(stage-sliced layer stack, microbatched GPipe ticks, ppermute hops). These
tests pin: (1) forward equality with the default ``lax.scan`` path, (2) dp
composition, (3) differentiability (grads through ppermute+scan match the
plain scan's grads), (4) the trace-time shape guards.

The reference has no pipeline parallelism (SURVEY.md section 2.3: its only
parallelism is dp eval sharding) — this is a beyond-reference scaling axis,
so correctness is pinned against our own default executor, not reference
outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aether_tpu.config import DiTConfig
from aether_tpu.models.dit import dit_forward, init_dit_params
from aether_tpu.models.rope import prepare_rotary_positional_embeddings
from aether_tpu.parallel.pipeline import (
    make_pipeline_block_scan,
    make_pp_mesh,
    shard_blocks_pp,
)


def _setup(batch, num_layers=4, seed=21):
    cfg = DiTConfig(
        num_layers=num_layers, num_heads=4, head_dim=16, text_embed_dim=32,
        max_text_seq_length=8, time_embed_dim=32, sample_height=8,
        sample_width=12,
    )
    params = init_dit_params(jax.random.PRNGKey(seed), cfg)
    f, h, w = 3, 8, 12
    rng = np.random.default_rng(seed)
    hidden = jnp.asarray(
        rng.normal(size=(batch, f, cfg.in_channels, h, w)), jnp.float32
    )
    text = jnp.asarray(
        rng.normal(size=(batch, cfg.max_text_seq_length, cfg.text_embed_dim)),
        jnp.float32,
    )
    t = jnp.asarray(rng.integers(0, 1000, size=(batch,)), jnp.int32)
    cos, sin = prepare_rotary_positional_embeddings(
        cfg, h * 8, w * 8, f, vae_scale_factor_spatial=8, fps=12
    )
    return cfg, params, hidden, text, t, jnp.asarray(cos), jnp.asarray(sin)


def _fwd(params, cfg, hidden, text, t, cos, sin, **kw):
    return dit_forward(params, cfg, hidden, text, t, cos, sin,
                       attn_impl="xla", **kw)


@pytest.mark.parametrize("pp,dp,n_micro,batch", [
    (4, 1, 4, 4),   # one microbatch per stage-count, pure pp (4 of 8 devices)
    (2, 1, 4, 8),   # more microbatches than stages, microbatch size 2
    (4, 2, 4, 8),   # dp composition: each dp shard runs its own pipeline
])
def test_pp_forward_matches_default_scan(pp, dp, n_micro, batch):
    cfg, params, hidden, text, t, cos, sin = _setup(batch)
    ref = _fwd(params, cfg, hidden, text, t, cos, sin)

    mesh = make_pp_mesh(pp, dp, devices=jax.devices()[: pp * dp])
    params_pp = dict(params, blocks=shard_blocks_pp(params["blocks"], mesh))
    block_scan = make_pipeline_block_scan(mesh, n_micro=n_micro)
    out = jax.jit(
        lambda p, x, e, ts: _fwd(p, cfg, x, e, ts, cos, sin,
                                 block_scan=block_scan)
    )(params_pp, hidden, text, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4,
                               err_msg=f"pp={pp} dp={dp} n_micro={n_micro}")


def test_pp_grads_match_default_scan():
    """jax.grad through the pipeline (shard_map + ppermute + tick scan) must
    equal grads through the plain lax.scan — GPipe backward for free."""
    batch, pp, n_micro = 4, 2, 4
    cfg, params, hidden, text, t, cos, sin = _setup(batch, num_layers=2)
    mesh = make_pp_mesh(pp, 1, devices=jax.devices()[:pp])
    block_scan = make_pipeline_block_scan(mesh, n_micro=n_micro)

    def loss(p, bs):
        out = _fwd(p, cfg, hidden, text, t, cos, sin, block_scan=bs)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_ref = jax.grad(loss)(params, None)
    g_pp = jax.jit(jax.grad(lambda p: loss(p, block_scan)))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = jax.tree_util.tree_leaves(g_pp)
    assert len(flat_ref) == len(flat_pp)
    for (path, a), b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-3, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pp_remat_composes():
    """jax.checkpoint around the block body must survive the pp schedule."""
    batch = 4
    cfg, params, hidden, text, t, cos, sin = _setup(batch, num_layers=4)
    mesh = make_pp_mesh(2, 1, devices=jax.devices()[:2])
    block_scan = make_pipeline_block_scan(mesh, n_micro=2)

    def loss(p, bs, remat):
        out = _fwd(p, cfg, hidden, text, t, cos, sin, block_scan=bs,
                   remat=remat)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_ref = jax.grad(lambda p: loss(p, None, False))(params)
    g_pp = jax.jit(jax.grad(lambda p: loss(p, block_scan, True)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-3, rtol=1e-3)


def test_pp_train_step_matches_unsharded():
    """A full adamw train step under the pp schedule (block params + moments
    stage-sharded P('pp')) must reproduce the unsharded step's loss and
    updated params — same key => same t/eps draws on both paths."""
    from aether_tpu.config import SchedulerConfig
    from aether_tpu.train.step import create_train_state, make_train_step

    batch_sz, pp, n_micro = 4, 2, 2
    cfg, params, hidden, text, _, cos, sin = _setup(batch_sz, num_layers=4)
    sched = SchedulerConfig.aetherv1()
    rng = np.random.default_rng(3)
    cond_ch = cfg.in_channels - cfg.out_channels
    batch = {
        "clean_latents": jnp.asarray(
            rng.normal(size=(batch_sz, 3, cfg.out_channels, 8, 12)), jnp.float32
        ),
        "condition_latents": jnp.asarray(
            rng.normal(size=(batch_sz, 3, cond_ch, 8, 12)), jnp.float32
        ),
        "text_embeds": text,
        "rope_cos": cos,
        "rope_sin": sin,
    }
    key = jax.random.PRNGKey(11)

    state_ref, tx = create_train_state(params, learning_rate=1e-4)
    step_ref = make_train_step(cfg, sched, tx)
    new_ref, loss_ref = step_ref(state_ref, batch, key)

    mesh = make_pp_mesh(pp, 1, devices=jax.devices()[:pp])
    params_pp = dict(params, blocks=shard_blocks_pp(params["blocks"], mesh))
    state_pp, tx_pp = create_train_state(params_pp, learning_rate=1e-4)
    block_scan = make_pipeline_block_scan(mesh, n_micro=n_micro)
    step_pp = jax.jit(make_train_step(cfg, sched, tx_pp, block_scan=block_scan))
    new_pp, loss_pp = step_pp(state_pp, batch, key)

    np.testing.assert_allclose(float(loss_pp), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_ref.params),
                    jax.tree_util.tree_leaves(new_pp.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4)


def test_pp_trainer_matches_unsharded_trainer():
    """The Trainer on a ('dp','pp') mesh (CLI: --pp) must replay the plain
    trainer's loss trajectory — same seed => same init, same batches, same
    key stream; only the executor schedule differs."""
    from aether_tpu.train.trainer import TrainConfig, Trainer, synthetic_batches

    cfg = DiTConfig.tiny()
    tc = TrainConfig(learning_rate=1e-4, total_steps=2, warmup_steps=1,
                     log_every=1, remat=False)
    ref = Trainer(cfg, tc, seed=5)
    losses_ref = ref.fit(synthetic_batches(cfg, batch_size=4), steps=2)

    mesh = make_pp_mesh(2, 1, devices=jax.devices()[:2])
    pp = Trainer(cfg, tc, mesh=mesh, seed=5, pp_microbatches=2)
    losses_pp = pp.fit(synthetic_batches(cfg, batch_size=4), steps=2)

    np.testing.assert_allclose(losses_pp, losses_ref, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(ref.state.ema_params),
                    jax.tree_util.tree_leaves(pp.state.ema_params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4)


def test_pp_shape_guards():
    cfg, params, hidden, text, t, cos, sin = _setup(4, num_layers=4)
    mesh = make_pp_mesh(4, 1, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="not divisible by n_micro"):
        _fwd(params, cfg, hidden, text, t, cos, sin,
             block_scan=make_pipeline_block_scan(mesh, n_micro=3))
    mesh3 = make_pp_mesh(3, 1, devices=jax.devices()[:3])
    with pytest.raises(ValueError, match="layers 4 not divisible by pp 3"):
        _fwd(params, cfg, hidden, text, t, cos, sin,
             block_scan=make_pipeline_block_scan(mesh3, n_micro=4))
    from jax.sharding import Mesh

    bad = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
               axis_names=("tp", "pp"))
    with pytest.raises(ValueError, match="composes with 'dp' only"):
        make_pipeline_block_scan(bad, n_micro=2)
    with pytest.raises(ValueError, match="no 'pp' axis"):
        make_pipeline_block_scan(
            Mesh(np.asarray(jax.devices()[:2]), axis_names=("dp",)), n_micro=2
        )
    with pytest.raises(ValueError, match="collect_blocks is unsupported"):
        _fwd(params, cfg, hidden, text, t, cos, sin, collect_blocks=True,
             block_scan=make_pipeline_block_scan(mesh, n_micro=4))
