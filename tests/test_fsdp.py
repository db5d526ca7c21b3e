"""FSDP (ZeRO-3 via GSPMD) training: sharded state, unchanged numerics.

The reference has no training at all (SURVEY.md section 0); this repo's
training must reach the full 42L x 3072d model, whose replicated f32 AdamW
state (~67 GB/chip) cannot fit any TPU — fully-sharded data parallelism is
the capability that makes full-size fine-tuning possible. In the GSPMD idiom
FSDP is purely a placement choice: `dit_param_sharding(..., fsdp=True)`
shards the non-tp matmul dimension of every large weight over the dp axis,
so parameters, both AdamW moments, and the EMA copy live 1/dp per chip while
the compiler all-gathers one layer slice per scan step and reduce-scatters
weight gradients. Numerics must be identical to the replicated run up to
reduction order.
"""

import numpy as np
import pytest

import jax

from aether_tpu.config import DiTConfig


def _make_trainers(fsdp_dp=4, fsdp_tp=2, steps_lr=1e-3):
    from aether_tpu.parallel.mesh import make_mesh
    from aether_tpu.train.trainer import TrainConfig, Trainer

    if len(jax.devices()) < fsdp_dp * fsdp_tp:
        pytest.skip("needs the 8-device CPU mesh")
    cfg = DiTConfig.tiny()
    tcfg = TrainConfig(learning_rate=steps_lr, warmup_steps=1, total_steps=8,
                       grad_clip_norm=1.0, remat=False, log_every=1)
    ref = Trainer(cfg, tcfg, seed=0)
    mesh = make_mesh(dp=fsdp_dp, tp=fsdp_tp,
                     devices=jax.devices()[: fsdp_dp * fsdp_tp])
    sharded = Trainer(cfg, tcfg, mesh=mesh, seed=0, fsdp=True)
    return cfg, ref, sharded


def test_fsdp_state_is_sharded_one_over_dp_tp():
    """Params, both AdamW moments, and the EMA copy of every large weight
    hold 1/(dp*tp) of the elements per device under fsdp=True."""
    _, _, sharded = _make_trainers()
    state = sharded.state

    def shard_fraction(leaf):
        return leaf.addressable_shards[0].data.size / leaf.size

    import optax

    def find_adam(s):
        if isinstance(s, optax.ScaleByAdamState):
            return s
        if isinstance(s, (tuple, list)):
            for sub in s:
                found = find_adam(sub)
                if found is not None:
                    return found
        return None

    adam = find_adam(state.opt_state)
    assert adam is not None
    mu, nu = adam.mu, adam.nu
    for tree_name, tree in (("params", state.params), ("mu", mu), ("nu", nu),
                            ("ema", state.ema_params)):
        for sub in ("norm1", "norm2", "mlp"):
            w = tree["blocks"][sub]["w" if sub != "mlp" else "w1"]
            assert shard_fraction(w) == pytest.approx(1 / 8), (tree_name, sub)
        for name in ("q_w", "k_w", "v_w", "o_w"):
            assert shard_fraction(tree["blocks"]["attn"][name]) == (
                pytest.approx(1 / 8)
            ), (tree_name, name)
    # without fsdp the same leaves are only 1/tp sharded — the dp factor is
    # exactly what fsdp=True adds (pin so a silent spec regression fails here)
    from aether_tpu.parallel.mesh import (
        dit_param_sharding,
        make_mesh,
        shard_params,
    )
    from aether_tpu.models import init_dit_params

    cfg = DiTConfig.tiny()
    mesh = make_mesh(dp=4, tp=2, devices=jax.devices()[:8])
    plain = shard_params(init_dit_params(jax.random.PRNGKey(0), cfg),
                         dit_param_sharding(cfg, mesh), mesh)
    assert shard_fraction(plain["blocks"]["mlp"]["w1"]) == pytest.approx(1 / 2)


def test_fsdp_train_matches_replicated():
    """8 fixed-batch steps under (dp=4, tp=2) fsdp == the single-device run:
    losses step-for-step and final params within float32 reduction noise."""
    from aether_tpu.train.trainer import synthetic_batches

    cfg, ref, sharded = _make_trainers()
    batch = next(synthetic_batches(cfg, batch_size=4, seed=0))

    def fixed():
        while True:
            yield dict(batch)

    ref_losses = ref.fit(fixed(), steps=8)
    fsdp_losses = sharded.fit(fixed(), steps=8)
    np.testing.assert_allclose(fsdp_losses, ref_losses, rtol=2e-4, atol=2e-5)

    ref_w = jax.device_get(ref.state.params["blocks"]["mlp"]["w1"])
    fsdp_w = jax.device_get(sharded.state.params["blocks"]["mlp"]["w1"])
    np.testing.assert_allclose(fsdp_w, ref_w, rtol=5e-4, atol=5e-5)
    ref_ema = jax.device_get(ref.state.ema_params["blocks"]["attn"]["q_w"])
    fsdp_ema = jax.device_get(sharded.state.ema_params["blocks"]["attn"]["q_w"])
    np.testing.assert_allclose(fsdp_ema, ref_ema, rtol=5e-4, atol=5e-5)


def test_fsdp_checkpoint_restores_across_topologies(tmp_path):
    """Save an FSDP run at (dp=4, tp=2), restore into a (dp=2, tp=4) FSDP
    trainer: a pod job must be resumable on a different slice shape. Orbax
    reshards against the live state template; params, EMA, and moments must
    come back bit-equal and the continuation must keep training."""
    from aether_tpu.parallel.mesh import make_mesh
    from aether_tpu.train.trainer import TrainConfig, Trainer, synthetic_batches

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    cfg = DiTConfig.tiny()
    ckpt = str(tmp_path / "ckpt")

    def tcfg():
        return TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=4,
                           grad_clip_norm=1.0, remat=False, log_every=100,
                           checkpoint_dir=ckpt, checkpoint_every=2)

    mesh_a = make_mesh(dp=4, tp=2, devices=jax.devices()[:8])
    t_a = Trainer(cfg, tcfg(), mesh=mesh_a, seed=0, fsdp=True)
    t_a.fit(synthetic_batches(cfg, batch_size=4, seed=3), steps=2)
    saved = jax.device_get(t_a.state.params["blocks"]["mlp"]["w1"])
    saved_ema = jax.device_get(t_a.state.ema_params["blocks"]["mlp"]["w1"])
    del t_a

    mesh_b = make_mesh(dp=2, tp=4, devices=jax.devices()[:8])
    t_b = Trainer(cfg, tcfg(), mesh=mesh_b, seed=99, fsdp=True)
    assert int(jax.device_get(t_b.state.step)) == 2
    # restored values identical despite the different shard layout...
    np.testing.assert_array_equal(
        jax.device_get(t_b.state.params["blocks"]["mlp"]["w1"]), saved)
    np.testing.assert_array_equal(
        jax.device_get(t_b.state.ema_params["blocks"]["mlp"]["w1"]), saved_ema)
    # ...and live on the NEW mesh's fsdp sharding (1/8 per device)
    w1 = t_b.state.params["blocks"]["mlp"]["w1"]
    assert w1.addressable_shards[0].data.size * 8 == w1.size
    gen = synthetic_batches(cfg, batch_size=4, seed=3)
    next(gen)
    next(gen)
    losses = t_b.fit(gen, steps=2)
    assert np.isfinite(losses).all()
    assert int(jax.device_get(t_b.state.step)) == 4
