"""Training driver: schedules, EMA, checkpoint/resume, sharded stepping.

The reference ships no training code at all (SURVEY.md section 0) — AetherV1
was fine-tuned from CogVideoX upstream. This driver restores the capability
TPU-natively on top of :mod:`aether_tpu.train.step`:

- warmup + cosine LR schedule, global-norm gradient clipping, optional
  gradient accumulation (``optax.MultiSteps``);
- EMA of parameters (the weights one actually samples from);
- orbax checkpointing with step-numbered saves and automatic resume;
- (dp, tp) mesh sharding with rematerialized DiT blocks;
- a synthetic latent-batch source for smoke runs (real data pipelines plug in
  any iterator of batch dicts).

CLI smoke run (8 virtual CPU devices):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python -m aether_tpu.train.trainer --synthetic --steps 3 --tiny
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aether_tpu.config import DiTConfig, SchedulerConfig
from aether_tpu.models.dit import dit_forward, init_dit_params
from aether_tpu.models.rope import prepare_rotary_positional_embeddings
from aether_tpu.schedule.dpm import compute_alphas_cumprod
from aether_tpu.train.step import TrainState
from aether_tpu.utils.profiling import stage_timer


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    weight_decay: float = 1e-4
    b1: float = 0.9
    b2: float = 0.95
    warmup_steps: int = 100
    total_steps: int = 10000
    grad_clip_norm: float = 1.0
    grad_accum_steps: int = 1
    ema_decay: float = 0.999
    remat: bool = True
    attn_impl: str = "xla"
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 500
    log_every: int = 10


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=cfg.warmup_steps,
        decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
        end_value=0.1 * cfg.learning_rate,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adamw(schedule, b1=cfg.b1, b2=cfg.b2,
                    weight_decay=cfg.weight_decay),
    )
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, cfg.grad_accum_steps)
    return tx


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EmaTrainState:
    step: jnp.ndarray
    params: Dict[str, Any]
    opt_state: Any
    ema_params: Dict[str, Any]

    def tree_flatten(self):
        return (self.step, self.params, self.opt_state, self.ema_params), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def make_ema_train_step(
    dit_cfg: DiTConfig,
    sched_cfg: SchedulerConfig,
    train_cfg: TrainConfig,
    tx: optax.GradientTransformation,
    block_scan=None,
) -> Callable:
    alphas = compute_alphas_cumprod(sched_cfg)
    sqrt_a = jnp.asarray(np.sqrt(alphas), jnp.float32)
    sqrt_1ma = jnp.asarray(np.sqrt(1.0 - alphas), jnp.float32)
    decay = train_cfg.ema_decay

    def loss_fn(params, batch, key):
        b = batch["clean_latents"].shape[0]
        key_t, key_eps = jax.random.split(key)
        t = jax.random.randint(key_t, (b,), 0, sqrt_a.shape[0])
        eps = jax.random.normal(key_eps, batch["clean_latents"].shape,
                                jnp.float32)
        x0 = batch["clean_latents"].astype(jnp.float32)
        a = sqrt_a[t][:, None, None, None, None]
        s = sqrt_1ma[t][:, None, None, None, None]
        x_t = a * x0 + s * eps
        v_target = a * eps - s * x0
        model_in = jnp.concatenate(
            [x_t.astype(batch["clean_latents"].dtype),
             batch["condition_latents"]], axis=2,
        )
        v_pred = dit_forward(
            params, dit_cfg, model_in, batch["text_embeds"], t,
            batch.get("rope_cos"), batch.get("rope_sin"),
            attn_impl=train_cfg.attn_impl, remat=train_cfg.remat,
            block_scan=block_scan,
        ).astype(jnp.float32)
        return jnp.mean(jnp.square(v_pred - v_target))

    def train_step(state: EmaTrainState, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, key)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p.astype(e.dtype),
            state.ema_params, new_params,
        )
        return EmaTrainState(state.step + 1, new_params, new_opt, new_ema), loss

    return train_step


def synthetic_batches(
    dit_cfg: DiTConfig,
    batch_size: int = 1,
    f_lat: int = 2,
    h_lat: int = 8,
    w_lat: int = 12,
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Random latent batches with the real channel layout (56 + 40 + text)."""
    cos, sin = prepare_rotary_positional_embeddings(
        dit_cfg, h_lat * 8, w_lat * 8, f_lat, fps=12
    )
    cos, sin = np.asarray(cos), np.asarray(sin)
    rng = np.random.default_rng(seed)
    while True:
        yield {
            "clean_latents": rng.normal(
                size=(batch_size, f_lat, 56, h_lat, w_lat)
            ).astype(np.float32),
            "condition_latents": rng.normal(
                size=(batch_size, f_lat, 40, h_lat, w_lat)
            ).astype(np.float32),
            "text_embeds": rng.normal(
                size=(batch_size, dit_cfg.max_text_seq_length,
                      dit_cfg.text_embed_dim)
            ).astype(np.float32),
            "rope_cos": cos,
            "rope_sin": sin,
        }


class Trainer:
    """Owns state, sharding, checkpointing and the step loop."""

    def __init__(
        self,
        dit_cfg: DiTConfig,
        train_cfg: TrainConfig,
        sched_cfg: Optional[SchedulerConfig] = None,
        mesh=None,
        init_params: Optional[Dict[str, Any]] = None,
        seed: int = 0,
        pp_microbatches: int = 2,
        fsdp: bool = False,
    ):
        self.dit_cfg = dit_cfg
        self.train_cfg = train_cfg
        self.sched_cfg = sched_cfg or SchedulerConfig.aetherv1()
        self.mesh = mesh
        self.key = jax.random.PRNGKey(seed)

        params = (init_params if init_params is not None
                  else init_dit_params(jax.random.PRNGKey(seed), dit_cfg))
        block_scan = None
        if mesh is not None and "pp" in mesh.axis_names:
            # GPipe pipeline mesh: blocks (and, via tx.init, their adamw
            # moments) live stage-sharded P('pp'); the block scan executes on
            # the microbatched ppermute schedule (parallel/pipeline.py)
            from aether_tpu.parallel.pipeline import (
                make_pipeline_block_scan,
                shard_blocks_pp,
            )

            params = dict(params,
                          blocks=shard_blocks_pp(params["blocks"], mesh))
            block_scan = make_pipeline_block_scan(
                mesh, n_micro=pp_microbatches
            )
        elif mesh is not None:
            # fsdp=True: params (and, via tx.init / the EMA tree_map below,
            # AdamW moments and the EMA copy) live 1/dp-sharded — see
            # dit_param_sharding
            from aether_tpu.parallel.mesh import dit_param_sharding, shard_params

            params = shard_params(
                params, dit_param_sharding(dit_cfg, mesh, fsdp=fsdp), mesh
            )
        self.tx = make_optimizer(train_cfg)
        self.state = EmaTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
            ema_params=jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32), params
            ),
        )
        self._step_fn = jax.jit(
            make_ema_train_step(dit_cfg, self.sched_cfg, train_cfg, self.tx,
                                block_scan=block_scan)
        )
        if train_cfg.checkpoint_dir:
            self.maybe_restore()

    # -- checkpointing ------------------------------------------------------
    def _ckpt_path(self, step: int) -> str:
        return os.path.join(os.path.abspath(self.train_cfg.checkpoint_dir),
                            f"step_{step:08d}")

    def save(self) -> str:
        from aether_tpu.io.weights import save_checkpoint

        step = int(jax.device_get(self.state.step))
        path = self._ckpt_path(step)
        if os.path.isdir(path):  # already checkpointed at this step
            return path
        save_checkpoint(
            path,
            {"params": self.state.params, "ema_params": self.state.ema_params,
             # opt_state + PRNG key make restore an EXACT continuation:
             # without them a "resumed" run silently resets Adam moments and
             # replays the key stream from step 0
             "opt_state": self.state.opt_state,
             "key": np.asarray(self.key),
             "step": np.asarray(step)},
        )
        return path

    def maybe_restore(self) -> Optional[int]:
        from aether_tpu.io.weights import load_checkpoint

        root = self.train_cfg.checkpoint_dir
        if not root or not os.path.isdir(root):
            return None
        steps = sorted(
            int(d.split("_")[-1]) for d in os.listdir(root)
            if d.startswith("step_")
        )
        if not steps:
            return None
        # restore against the live state as template so arrays come back with
        # the current mesh shardings (saves may come from a different topology)
        template = {
            "params": self.state.params,
            "ema_params": self.state.ema_params,
            "opt_state": self.state.opt_state,
            "key": np.asarray(self.key),
            "step": np.asarray(0),
        }
        try:
            restored = load_checkpoint(self._ckpt_path(steps[-1]), template)
        except Exception:
            # pre-opt_state checkpoints (older layout): restore what exists
            template.pop("opt_state")
            template.pop("key")
            restored = load_checkpoint(self._ckpt_path(steps[-1]), template)
        if self.mesh is not None:
            # orbax restores each leaf with its template sharding; leaves whose
            # template was never explicitly mesh-sharded (adam step counts,
            # anything created eagerly) come back COMMITTED to device 0, which
            # a jit over the mesh rejects next to 8-device leaves. Re-place
            # those as mesh-replicated; keep real NamedShardings as-is.
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(self.mesh, PartitionSpec())

            def replace(live, rest):
                sh = getattr(live, "sharding", None)
                if isinstance(sh, NamedSharding):
                    return rest
                return jax.device_put(rest, rep)

            for name in ("params", "ema_params", "opt_state"):
                if name in restored:
                    restored[name] = jax.tree_util.tree_map(
                        replace, getattr(self.state, name), restored[name]
                    )
        self.state = dataclasses.replace(
            self.state,
            step=jnp.asarray(int(restored["step"]), jnp.int32)
            if self.mesh is None
            else jax.device_put(
                np.asarray(int(restored["step"]), np.int32),
                jax.sharding.NamedSharding(self.mesh,
                                           jax.sharding.PartitionSpec()),
            ),
            params=restored["params"],
            ema_params=restored["ema_params"],
            **({"opt_state": restored["opt_state"]}
               if "opt_state" in restored else {}),
        )
        if "key" in restored:
            # host array: uncommitted, so jax.random.split + jit place it
            # wherever the step's sharded inputs live
            self.key = np.asarray(jax.device_get(restored["key"]),
                                  np.uint32)
        return steps[-1]

    # -- loop ---------------------------------------------------------------
    def fit(self, batches: Iterator[Dict[str, np.ndarray]],
            steps: Optional[int] = None) -> list:
        cfg = self.train_cfg
        total = steps if steps is not None else cfg.total_steps
        losses = []
        t0 = time.time()
        import contextlib

        ctx = self.mesh if self.mesh is not None else contextlib.nullcontext()
        with ctx:
            for i in range(total):
                batch = next(batches)
                self.key, step_key = jax.random.split(self.key)
                with stage_timer("train/step", log=False):
                    self.state, loss = self._step_fn(self.state, batch,
                                                     step_key)
                if (i + 1) % cfg.log_every == 0 or i == total - 1:
                    loss_val = float(jax.device_get(loss))
                    losses.append(loss_val)
                    rate = (i + 1) / (time.time() - t0)
                    print(f"step {int(jax.device_get(self.state.step))}: "
                          f"loss={loss_val:.4f} ({rate:.2f} it/s)", flush=True)
                if (cfg.checkpoint_dir
                        and (i + 1) % cfg.checkpoint_every == 0):
                    print(f"saved {self.save()}", flush=True)
        if cfg.checkpoint_dir:
            self.save()
        return losses


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="AetherV1-TPU trainer")
    p.add_argument("--synthetic", action="store_true",
                   help="Train on random latents (smoke/throughput runs).")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--checkpoint_every", type=int, default=500)
    p.add_argument("--dp", type=int, default=None)
    p.add_argument("--tp", type=int, default=None)
    p.add_argument("--pp", type=int, default=None,
                   help="GPipe pipeline stages (stage-shards the block stack; "
                        "mutually exclusive with --tp).")
    p.add_argument("--pp_microbatches", type=int, default=2)
    p.add_argument("--fsdp", action="store_true",
                   help="Fully-sharded data parallelism: weights, AdamW "
                        "moments, and the EMA copy shard 1/dp per chip "
                        "(ZeRO-3 via GSPMD; requires --dp > 1).")
    p.add_argument("--init_checkpoint", type=str, default=None,
                   help="Converted DiT checkpoint to fine-tune from.")
    p.add_argument("--latent_dir", type=str, default=None,
                   help="Directory of precomputed latent .npz files "
                        "(train.data.precompute_latents); trains on real "
                        "data with the shuffled native-prefetch loader.")
    p.add_argument("--text_embeds", type=str, default=None,
                   help="Optional .npy with a baked (S, D) text embedding "
                        "broadcast to every real-data batch (default: "
                        "zeros, matching the empty-prompt conditioning).")
    p.add_argument("--no_native_prefetch", action="store_true",
                   help="Read latent files synchronously with np.load "
                        "instead of the C++ prefetch thread pool.")
    p.add_argument("--data_seed", type=int, default=0)
    args = p.parse_args(argv)

    dit_cfg = DiTConfig.tiny() if args.tiny else DiTConfig.aetherv1()
    train_cfg = TrainConfig(
        learning_rate=args.lr, total_steps=args.steps,
        warmup_steps=min(100, max(args.steps // 10, 1)),
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        log_every=max(args.steps // 20, 1),
        # flash_train: Pallas flash kernel on the forward, blockwise
        # chunked-attention autodiff as the VJP (ops/chunked_attention.py)
        attn_impl="flash_train" if jax.default_backend() == "tpu" else "xla",
    )

    mesh = None
    if args.pp:
        if args.tp:
            raise SystemExit("--pp and --tp are mutually exclusive (the "
                             "attention shard_map cannot nest inside the "
                             "pipeline shard_map)")
        from aether_tpu.parallel.pipeline import make_pp_mesh

        mesh = make_pp_mesh(args.pp, args.dp or 1)
        print(f"mesh: {mesh}")
    elif len(jax.devices()) > 1:
        from aether_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=args.dp, tp=args.tp)
        print(f"mesh: {mesh}")

    init_params = None
    if args.init_checkpoint:
        from aether_tpu.io.weights import load_checkpoint

        init_params = load_checkpoint(args.init_checkpoint)

    if args.fsdp and (args.pp or mesh is None or mesh.shape.get("dp", 1) < 2):
        raise SystemExit("--fsdp needs a (dp>1, tp) mesh (not --pp)")
    trainer = Trainer(dit_cfg, train_cfg, mesh=mesh, init_params=init_params,
                      pp_microbatches=args.pp_microbatches, fsdp=args.fsdp)
    if args.latent_dir:
        from aether_tpu.train.data import latent_batches

        text = None
        if args.text_embeds:
            text = np.load(args.text_embeds).astype(np.float32)
        # multi-host: each process draws its own shard of the clip list
        # (eval.sharding.shard_sequences inside latent_batches)
        batches = latent_batches(
            args.latent_dir, dit_cfg, batch_size=args.batch_size,
            seed=args.data_seed, text_embeds=text,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            native_prefetch=not args.no_native_prefetch,
        )
    elif args.synthetic:
        batches = synthetic_batches(dit_cfg, batch_size=args.batch_size)
    else:
        raise SystemExit("pass --latent_dir DIR (real precomputed latents) "
                         "or --synthetic (random smoke data)")
    trainer.fit(batches, steps=args.steps)


if __name__ == "__main__":
    main()
