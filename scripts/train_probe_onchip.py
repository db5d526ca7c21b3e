#!/usr/bin/env python
"""On-chip training validation at production sequence length.

The full 42L x 3072 model cannot train on one 16 GB chip (f32 params + Adam
moments + grads alone exceed HBM) — that is what the dp x tp mesh path is
for. This probe validates the ENTIRE training stack on real hardware at a
mid config (8L x 2048 x 32h, ~0.42 B params) on the REAL 41f x 480p window
(15 076 video tokens): the flash_train custom-VJP attention (Pallas forward,
blockwise-chunked autodiff backward), remat, EMA, grad clipping, warmup LR,
and the loss trajectory over a handful of steps.

Run ON the TPU: python scripts/train_probe_onchip.py [--steps 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(f"[train-probe] {time.strftime('%H:%M:%S')} {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    from aether_tpu.config import DiTConfig
    from aether_tpu.train.trainer import TrainConfig, Trainer, synthetic_batches
    from aether_tpu.utils.profiling import warm_transfer_channel

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        log("warming channel")
        log(f"warm {warm_transfer_channel():.1f}s")
        # 6L x 1536 (~0.24 B params): f32 params + Adam moments + EMA ~ 4 GB,
        # leaving room for the 15k-token fwd+bwd workspace under the ~15.5 GB
        # ceiling (8L x 2048 = 0.53 B OOM'd: ~8.4 GB of state + workspace)
        cfg = DiTConfig(
            num_layers=6, num_heads=24, head_dim=64, text_embed_dim=4096,
            max_text_seq_length=226, time_embed_dim=512, sample_height=60,
            sample_width=90,
        )
        f_lat, h_lat, w_lat = 11, 60, 90  # the real 41f x 480p window
        attn = "flash_train"
    else:
        cfg = DiTConfig.tiny()
        f_lat, h_lat, w_lat = 2, 8, 12
        attn = "xla"

    tcfg = TrainConfig(
        learning_rate=1e-4, total_steps=args.steps,
        warmup_steps=2, grad_clip_norm=1.0, remat=True,
        log_every=1, attn_impl=attn,
    )
    log(f"init trainer ({cfg.num_layers}L x {cfg.hidden_size}d, "
        f"{f_lat}x{h_lat}x{w_lat} latents = "
        f"{f_lat * (h_lat // 2) * (w_lat // 2)} video tokens)")
    trainer = Trainer(cfg, tcfg, seed=0)

    batches = synthetic_batches(cfg, batch_size=1, f_lat=f_lat, h_lat=h_lat,
                                w_lat=w_lat, seed=0)
    t0 = time.time()
    losses = trainer.fit(batches, steps=args.steps)
    dt = time.time() - t0
    log(f"{args.steps} steps in {dt:.1f}s "
        f"({args.steps / dt:.3f} it/s incl. compile)")
    assert all(np.isfinite(v) for v in losses), losses
    log(f"losses: {[round(v, 4) for v in losses]}")
    log("TRAIN PROBE PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
