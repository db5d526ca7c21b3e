"""Training data pipeline: latent precompute + shuffled batch loading.

The reference ships no training code or data tooling (SURVEY.md section 0).
This module provides the standard video-diffusion recipe TPU-side:

1. :func:`precompute_latents` — walk a directory of clips, VAE-encode RGB and
   (sqrt-)disparity, encode camera poses to packed raymap latents, and write
   one ``.npz`` per clip. Encoding once amortizes the VAE over every epoch and
   keeps the training step all-MXU.
2. :func:`latent_batches` — an infinite shuffled iterator of training batches
   (clean_latents 56ch / condition_latents 40ch / text_embeds / rope tables)
   matching :func:`aether_tpu.train.trainer.Trainer.fit`'s contract, sharded
   across hosts with :func:`aether_tpu.eval.sharding.shard_sequences`.

Depth supervision inputs follow the reference's encoding: disparity is
sqrt-compressed before VAE encode (``postprocess_utils.py:964-987``), and the
camera raymap folds 4-to-1 into 24 latent channels (``pipeline:666-670``).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from aether_tpu.config import PipelineConfig


def precompute_latents(
    pipeline,
    clips: Sequence[dict],
    out_dir: str,
    fps: int = 12,
    seed: int = 0,
) -> list:
    """Encode training clips to latent ``.npz`` files.

    Each clip dict: {"name": str, "rgb": (F, H, W, 3) [0, 1],
    "disparity": optional (F, H, W) [0, 1], "poses": optional (F, 4, 4),
    "intrinsics": optional (F, 3, 3), "text_embeds": optional}.
    Returns written paths.
    """
    import jax
    import jax.numpy as jnp

    from aether_tpu.geometry.raymap import camera_pose_to_raymap
    from aether_tpu.pipeline.aether import _encode_pixels, pack_raymap
    from aether_tpu.utils.preprocess import preprocess_video

    cfg: PipelineConfig = pipeline.config
    dtype = pipeline.compute_dtype
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for i, clip in enumerate(clips):
        rgb = np.asarray(clip["rgb"])
        f, h, w = rgb.shape[:3]
        key = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        pixels = jnp.asarray(preprocess_video(rgb, h, w))
        rgb_lat = _encode_pixels(cfg, dtype, pipeline.vae_params, pixels,
                                 jax.random.fold_in(key, 0))

        if clip.get("disparity") is not None:
            disp = np.sqrt(np.clip(np.asarray(clip["disparity"]), 0.0, 1.0))
            disp3 = np.repeat(disp[..., None] * 2.0 - 1.0, 3, axis=-1)
            disp_lat = _encode_pixels(cfg, dtype, pipeline.vae_params,
                                      jnp.asarray(disp3, jnp.float32),
                                      jax.random.fold_in(key, 1))
        else:
            disp_lat = jnp.zeros_like(rgb_lat)

        if clip.get("poses") is not None:
            raymap = camera_pose_to_raymap(
                np.asarray(clip["poses"]), np.asarray(clip["intrinsics"]),
                height=h, width=w,
                vae_downsample=cfg.vae_scale_factor_spatial,
            )
            camera = pack_raymap(jnp.asarray(raymap)[None].astype(dtype))
        else:
            camera = jnp.zeros(
                (1, rgb_lat.shape[1], 24, *rgb_lat.shape[-2:]), dtype
            )

        clean = np.concatenate(
            [np.asarray(rgb_lat, np.float32),
             np.asarray(disp_lat, np.float32),
             np.asarray(camera, np.float32)], axis=2,
        )[0]
        path = os.path.join(out_dir, f"{clip.get('name', f'clip_{i:05d}')}.npz")
        np.savez_compressed(
            path,
            clean_latents=clean.astype(np.float16),
            num_frames=np.asarray(f),
            height=np.asarray(h),
            width=np.asarray(w),
            fps=np.asarray(fps),
            text_embeds=np.asarray(
                clip.get("text_embeds", np.zeros((0,))), np.float16
            ),
        )
        written.append(path)
    return written


def _conditioning_from_clean(
    clean: np.ndarray, rng: np.random.Generator, task_probs=(0.5, 0.3, 0.2)
) -> np.ndarray:
    """Build 40-ch condition latents from 56-ch targets with task-mixture
    masking: reconstruction keeps all content frames, prediction keeps frame 0,
    planning keeps first+last (mirrors the three inference conditionings)."""
    f = clean.shape[0]
    content = clean[:, :16].copy()
    camera = clean[:, 32:]
    task = rng.choice(3, p=task_probs)
    if task == 1 and f > 1:  # prediction: only frame 0 observed
        content[1:] = 0.0
    elif task == 2 and f > 2:  # planning: first + last observed
        content[1:-1] = 0.0
    return np.concatenate([content, camera], axis=1)


def latent_batches(
    latent_dir: str,
    dit_cfg,
    batch_size: int = 1,
    seed: int = 0,
    text_embeds: Optional[np.ndarray] = None,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    base_fps: int = 12,
    native_prefetch: bool = True,
    prefetch_batches: int = 3,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite shuffled iterator over precomputed latent files.

    With ``native_prefetch`` (default), file reads + zlib inflation run on the
    C++ thread pool in :mod:`aether_tpu.runtime`, ``prefetch_batches`` batches
    ahead of the consumer — the next batch decodes while the device steps.
    Falls back to synchronous ``np.load`` when the native library cannot be
    built on this machine.
    """
    from collections import deque

    from aether_tpu.eval.sharding import shard_sequences
    from aether_tpu.models.rope import prepare_rotary_positional_embeddings

    files = sorted(glob.glob(os.path.join(latent_dir, "*.npz")))
    if not files:
        raise FileNotFoundError(f"no .npz latents under {latent_dir}")
    files = shard_sequences(files, process_index, process_count)
    if len(files) < batch_size:
        raise ValueError(
            f"batch_size={batch_size} exceeds the {len(files)} latent files "
            f"in this shard of {latent_dir}"
        )
    rng = np.random.default_rng(seed)
    # separate stream for epoch permutations: the prefetcher draws the next
    # epoch's order ahead of the consumer, which must not perturb the
    # conditioning-mask draws from ``rng``
    order_rng = np.random.default_rng(np.random.SeedSequence([seed, 1]))
    rope_cache: Dict[tuple, tuple] = {}

    def batch_paths_stream():
        while True:
            order = order_rng.permutation(len(files))
            for start in range(0, len(order) - batch_size + 1, batch_size):
                yield [files[j] for j in order[start : start + batch_size]]

    paths_iter = batch_paths_stream()
    prefetcher = None
    if native_prefetch:
        from aether_tpu import runtime

        if runtime.available():
            prefetcher = runtime.NpzPrefetcher(n_threads=2)
    pending: deque = deque()

    while True:
        if prefetcher is not None:
            while len(pending) < max(1, prefetch_batches):
                batch_paths = next(paths_iter)
                for p in batch_paths:
                    prefetcher.submit(p)
                pending.append(batch_paths)
            batch_paths = pending.popleft()
            items = [prefetcher.get() for _ in batch_paths]
        else:
            batch_paths = next(paths_iter)
            items = [np.load(p) for p in batch_paths]
        clean = np.stack(
            [it["clean_latents"].astype(np.float32) for it in items]
        )
        cond = np.stack(
            [_conditioning_from_clean(c, rng) for c in clean]
        )
        h = int(items[0]["height"])
        w = int(items[0]["width"])
        fps = int(items[0]["fps"])
        f_lat = clean.shape[1]
        rope_key = (h, w, f_lat, fps)
        if rope_key not in rope_cache:
            cos, sin = prepare_rotary_positional_embeddings(
                dit_cfg, h, w, f_lat, base_fps=base_fps, fps=fps
            )
            rope_cache[rope_key] = (np.asarray(cos), np.asarray(sin))
        cos, sin = rope_cache[rope_key]
        if text_embeds is not None:
            text = np.broadcast_to(
                text_embeds.astype(np.float32),
                (batch_size, *text_embeds.shape[-2:]),
            ).copy()
        else:
            text = np.zeros(
                (batch_size, dit_cfg.max_text_seq_length,
                 dit_cfg.text_embed_dim), np.float32,
            )
        yield {
            "clean_latents": clean,
            "condition_latents": cond,
            "text_embeds": text,
            "rope_cos": cos,
            "rope_sin": sin,
        }
