"""AetherV1 pipeline: one jit-compiled sampler, three tasks.

TPU-native re-design of reference ``aether/pipelines/aetherv1_pipeline_cogvideox.py``
(class ``AetherV1PipelineCogVideoX``, :255-965). The reference drives a Python
denoise loop over torch modules; here the entire sampler — VAE condition encode,
latent packing, CFG batching/masking, the DPM-Solver++ scan, RGB+disparity decode
and raymap unpack — is ONE jitted function per (task, steps, shape) signature:

- per-task condition assembly is resolved statically (Python) before tracing;
- the denoise loop is a ``jax.lax.scan`` whose per-step coefficients (timesteps,
  DPM multipliers, dynamic-CFG scales — including the reference's quirky
  ``cos(pi*((S - t)/S)^5)`` ramp evaluated in float64 on host, ``pipeline:879-893``)
  are precomputed arrays indexed by the scanned step;
- stochastic draws (posterior sampling, init noise, per-step SDE noise) come from a
  threaded JAX PRNG key. Bit parity with the reference's CUDA generator is
  impossible cross-framework; metric parity is the target (SURVEY.md section 6).

Task semantics mirrored from the reference:
- defaults: steps {recon 4, pred 50, plan 50}, guidance {1, 3, 3}, dynamic-CFG
  {off, on, on} (``pipeline:256-272``);
- validation: frames in {17,25,33,41}, fps in {8,10,12,15,24}, h,w % 8 == 0,
  raymap shape (F, 6, H/8, W/8) (``pipeline:350-449``);
- latent layout: (B, (F-1)/4+1, 56, H/8, W/8); conditions add 16 content + 24
  packed camera channels; raymap frames fold 4-to-1 via the *strided* einops
  pattern "(n t) c -> t (n c)" (``pipeline:666-670``), inverse on output keeping
  the last F frames (``pipeline:942-949``);
- CFG uncond masking: planning zeroes the content channels of all condition
  frames; prediction zeroes only frame 0 (``pipeline:839-855``);
- disparity decode: channel mean, *0.5+0.5, then square (``pipeline:936-939``).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from aether_tpu.config import PipelineConfig
from aether_tpu.models.dit import dit_forward
from aether_tpu.models.rope import prepare_rotary_positional_embeddings
from aether_tpu.runtime import memgate
from aether_tpu.schedule.dpm import SamplingPlan, dpm_step, make_sampling_plan
from aether_tpu.utils.preprocess import preprocess_image_u8, preprocess_video_u8


@dataclasses.dataclass
class AetherPipelineOutput:
    rgb: np.ndarray  # (F, H, W, 3) in [0, 1]
    disparity: np.ndarray  # (F, H, W)
    raymap: np.ndarray  # (F, 6, H/8, W/8)


class DeferredOutput:
    """Pipeline output whose device->host transfer has been *started* but not
    yet paid for. ``resolve()`` blocks on the in-flight copies and returns the
    :class:`AetherPipelineOutput` (or list of them, for batched calls). Lets a
    sliding-window loop enqueue window i+1's compute while window i's outputs
    ride the D2H link."""

    def __init__(self, resolve_fn):
        self._resolve_fn = resolve_fn
        self._result = None

    def resolve(self):
        if self._result is None:
            self._result = self._resolve_fn()
            self._resolve_fn = None
        return self._result


def iter_resolved(dispatches):
    """Pipelined resolve over a sequence of deferred dispatches.

    ``dispatches``: iterable of zero-arg callables, each dispatching one
    pipeline call (ideally with ``defer_host=True``) and returning a
    :class:`DeferredOutput` or a plain output (test stubs). Yields resolved
    outputs IN ORDER while always keeping one dispatch in flight ahead of the
    consumer — call i+1's device compute overlaps call i's host transfer and
    whatever host post-processing the consumer does between ``next()`` calls.
    Shared by the eval drivers; the demo CLI keeps explicit loops because it
    wraps each dispatch/resolve in its own named stage timer."""
    pending = None
    for make in dispatches:
        out = make()
        if pending is not None:
            yield pending.resolve() if hasattr(pending, "resolve") else pending
        pending = out
    if pending is not None:
        yield pending.resolve() if hasattr(pending, "resolve") else pending


def _start_pull(arr):
    """Drain pending device work, then start the async D2H copy.

    Draining first matters on tunneled devices: pulling buffers with deep
    pending work exhausts the remote runtime's transfer resources."""
    arr.block_until_ready()
    try:
        arr.copy_to_host_async()
    except AttributeError:
        pass
    return arr


def dynamic_cfg_schedule(
    timesteps: np.ndarray, num_inference_steps: int, guidance_scale: float
) -> np.ndarray:
    """Reference dynamic-CFG ramp, evaluated per *timestep value* in float64.

    1 + g * (1 - cos(pi * ((steps - t)/steps)^5)) / 2  — reference
    ``pipeline:879-893`` uses ``t.item()`` (the 0..999 timestep, not the index),
    making the exponent huge; python float64 math reproduces it exactly.

    Checkpoint-locked QUIRK, measured round 5: with t in [0, 999] and steps=50
    the base spans [-19, 1], so cos(pi * base^5) oscillates pseudo-randomly
    and the per-step scale JUMPS around [1, 1+g] instead of ramping (e.g.
    [1.65, 1.77, 3.99, 3.71, 1.89, ...] at the 50-step prediction default).
    Consequences: (a) the opt-in CFG prefix skip (AETHER_CFG_SKIP_TOL) never
    finds a skippable prefix at real configs; (b) this is faithful to the
    reference — "fixing" the formula would change outputs vs the published
    checkpoint's sampler.
    """
    out = np.zeros(len(timesteps), dtype=np.float64)
    for i, t in enumerate(timesteps):
        frac = (num_inference_steps - float(int(t))) / num_inference_steps
        out[i] = 1.0 + guidance_scale * (1.0 - math.cos(math.pi * frac**5.0)) / 2.0
    return out.astype(np.float32)


def pack_raymap(raymap: jnp.ndarray, temporal_ratio: int = 4) -> jnp.ndarray:
    """(B, F, 6, h, w) -> (B, F/4, 24, h, w) via the strided "(n t) c -> t (n c)"
    fold; front-pads by repeating the first frames when F % 4 != 0."""
    b, f = raymap.shape[:2]
    if f % temporal_ratio != 0:
        pad = temporal_ratio - f % temporal_ratio
        raymap = jnp.concatenate([raymap[:, :pad], raymap], axis=1)
        f = f + pad
    t = f // temporal_ratio
    # flattened index along (n t) is n * t_len + t
    x = raymap.reshape(b, temporal_ratio, t, *raymap.shape[2:])  # (b, n, t, c, h, w)
    x = jnp.moveaxis(x, 1, 2)  # (b, t, n, c, h, w)
    return x.reshape(b, t, temporal_ratio * raymap.shape[2], *raymap.shape[3:])


def unpack_raymap(camera_latents: jnp.ndarray, num_frames: int) -> jnp.ndarray:
    """(B, T, 24, h, w) -> (B, F, 6, h, w): inverse fold, keep the last F frames."""
    b, t, nc, h, w = camera_latents.shape
    n = 4
    x = camera_latents.reshape(b, t, n, nc // n, h, w)
    x = jnp.moveaxis(x, 2, 1)  # (b, n, t, c, h, w)
    x = x.reshape(b, n * t, nc // n, h, w)
    return x[:, -num_frames:]


@functools.partial(jax.jit, static_argnames=("config", "dtype"))
def _encode_chunk(config, dtype, vae_params, frames, cache):
    from aether_tpu.models.vae import encode_moments

    return encode_moments(vae_params, config.vae, frames.astype(dtype), cache)


@functools.partial(jax.jit, static_argnames=("config", "dtype"))
def _decode_chunk(config, dtype, vae_params, latents_cl, cache):
    from aether_tpu.models.vae import decode_frames

    return decode_frames(vae_params, config.vae, latents_cl.astype(dtype), cache)


@functools.partial(jax.jit, static_argnames=("config", "dtype"))
def _encode_full(config, dtype, vae_params, video):
    """Whole-clip moment encode; conv-cache outputs dropped inside the jit so
    XLA dead-code-eliminates the cache slices (they otherwise pin every conv
    input buffer until the end of the graph)."""
    from aether_tpu.models.vae import encode_moments

    mean, logvar, _ = encode_moments(vae_params, config.vae,
                                     video.astype(dtype), None)
    return mean, logvar


@functools.partial(jax.jit, static_argnames=("config", "dtype", "fb"))
def _decode_scanned(config, dtype, vae_params, latents_cl, fb=2):
    """Whole strip in ONE program, chunked inside via ``lax.scan``.

    Bit-identical to the host-loop 2-latent-frame chunking (same chunk
    boundaries -> same per-chunk GroupNorm statistics, conv caches threaded
    as the scan carry), but a single dispatch per strip instead of
    ``ceil(T/2)``: no per-chunk host->device execute roundtrips (15-30 ms
    each through the tunnel), and XLA schedules the chunk pipeline as one
    program. Workspace stays one-chunk-sized — the scan body is compiled
    once — so HBM peak is chunk-scale, though measurably above the host
    loop's (round 5 compile analysis, 32x90 strip: 6.2 GB scanned vs 5.6 GB
    per host chunk at B=1; 11.8 vs 9.4 GB at B=2). Default-on on
    accelerators behind the memgate fit check; AETHER_SCAN_DECODE=0 opts
    out (see :func:`_scan_decode_enabled`).
    """
    from aether_tpu.models.vae import decode_frames

    z = latents_cl.astype(dtype)
    b, t = z.shape[0], z.shape[1]
    n_chunks = max(t // fb, 1)
    first_end = t - (n_chunks - 1) * fb  # first chunk absorbs the remainder
    v0, cache = decode_frames(vae_params, config.vae, z[:, :first_end], None)
    if n_chunks == 1:
        return v0

    rest = z[:, first_end:]
    chunks = jnp.moveaxis(
        rest.reshape(b, n_chunks - 1, fb, *rest.shape[2:]), 1, 0)

    def body(carry, chunk):
        video, carry = decode_frames(vae_params, config.vae, chunk, carry)
        return carry, video

    _, vs = jax.lax.scan(body, cache, chunks)
    # (n-1, B, fb*r, H, W, 3) -> (B, (n-1)*fb*r, H, W, 3)
    vs = jnp.moveaxis(vs, 0, 1).reshape(
        b, -1, *vs.shape[3:])
    return jnp.concatenate([v0, vs], axis=1)


from aether_tpu.utils.env import env_flag as _env_flag


def _scan_decode_enabled() -> bool:
    """Decode each strip as ONE jitted scan over 2-latent-frame chunks
    (bit-exact vs the host loop — same chunk boundaries, same per-chunk
    GroupNorm statistics) instead of ~5 chained dispatches.

    Default ON on accelerators (AETHER_SCAN_DECODE=0 opts out): the round-4
    on-chip A/B measured the stacked RGB+disparity decode at 6.72 s scanned
    vs 7.55 s host-chunked (the per-chunk execute roundtrips cost ~25 ms
    each through the tunnel and XLA pipelines the scanned chunk sequence as
    one program). On wedge-on-OOM runtimes the scan graph only runs after
    the memgate compile-probe proves it fits beside the resident params
    (round 4 shipped it ungated and the driver bench OOM-wedged the chip).
    Default OFF on CPU (tests compile the host-loop form faster)."""
    try:
        on_accel = jax.default_backend() not in ("cpu",)
    except Exception:
        on_accel = False
    return _env_flag("AETHER_SCAN_DECODE", on_accel)


@functools.partial(jax.jit, static_argnames=("config", "dtype"))
def _decode_full(config, dtype, vae_params, latents_cl):
    """Whole-clip decode in one graph: no conv-cache outputs, so XLA frees
    stage activations as it goes (the cache slices otherwise extend every
    conv input's lifetime) — ~20% faster than 2-frame chunking per tile."""
    from aether_tpu.models.vae import vae_decode

    return vae_decode(vae_params, config.vae, latents_cl.astype(dtype))


# Full-range BT.601 coefficients shared by the four yuv420 wire codecs
# (device/host x pack/unpack must stay exact inverses of each other).
_YR, _YG, _YB = 0.299, 0.587, 0.114
_CB_SCALE, _CR_SCALE = 0.564, 0.713


def _u8_to_unit(pixels_u8, dtype) -> jnp.ndarray:
    """uint8 wire pixels -> [-1, 1] on device (4x fewer H2D bytes)."""
    return jnp.asarray(pixels_u8).astype(dtype) / 127.5 - 1.0


@jax.jit
def _rgb_to_yuv420_wire(rgb01: jnp.ndarray):
    """[..., H, W, 3] in [0, 1] -> (Y u8 [..., H, W], Cb/Cr u8 [..., H/2, W/2]).

    Device-side pack for the D2H wire: full-range BT.601 with 2x2-averaged
    chroma — 1.5 bytes/px instead of 3 (and 12 of the f32 path). The demo's
    video container (mp4/x264, like the reference's) is yuv420p anyway, so the
    wire matches the artifact's native representation. H, W must be even
    (pipeline inputs are divisible by 8).
    """
    rf = rgb01[..., 0].astype(jnp.float32)
    gf = rgb01[..., 1].astype(jnp.float32)
    bf = rgb01[..., 2].astype(jnp.float32)
    y = _YR * rf + _YG * gf + _YB * bf
    cb = (bf - y) * _CB_SCALE + 0.5
    cr = (rf - y) * _CR_SCALE + 0.5

    def sub(c):
        h, w = c.shape[-2], c.shape[-1]
        c = c.reshape(*c.shape[:-2], h // 2, 2, w // 2, 2)
        return c.mean(axis=(-3, -1))

    def to_u8(v):
        return jnp.round(jnp.clip(v, 0.0, 1.0) * 255.0).astype(jnp.uint8)

    return to_u8(y), to_u8(sub(cb)), to_u8(sub(cr))


def _yuv420_wire_to_rgb(y_u8, cb_u8, cr_u8) -> np.ndarray:
    """Host-side inverse of ``_rgb_to_yuv420_wire`` -> f32 RGB in [0, 1]."""
    y = np.asarray(y_u8).astype(np.float32) / 255.0
    cb = np.asarray(cb_u8).astype(np.float32) / 255.0 - 0.5
    cr = np.asarray(cr_u8).astype(np.float32) / 255.0 - 0.5
    cb = cb.repeat(2, axis=-2).repeat(2, axis=-1)
    cr = cr.repeat(2, axis=-2).repeat(2, axis=-1)
    r = y + cr / _CR_SCALE
    b = y + cb / _CB_SCALE
    g = (y - _YR * r - _YB * b) / _YG
    return np.clip(np.stack([r, g, b], axis=-1), 0.0, 1.0)


def _rgb_u8_to_yuv420_host(pixels_u8: np.ndarray):
    """Host-side pack for the H2D wire: (..., H, W, 3) u8 -> (Y, Cb, Cr) u8.

    Same full-range BT.601 + 2x2-mean chroma as the D2H wire
    (:func:`_rgb_to_yuv420_wire`), computed in numpy before upload: 1.5 B/px
    instead of 3 on the H2D link. Lossless for content that was decoded from a
    yuv420p video (i.e. every mp4 input) up to a resample roundtrip.
    """
    rgb = np.asarray(pixels_u8).astype(np.float32) / 255.0
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = _YR * r + _YG * g + _YB * b
    cb = (b - y) * _CB_SCALE + 0.5
    cr = (r - y) * _CR_SCALE + 0.5

    def sub(c):
        h, w = c.shape[-2], c.shape[-1]
        c = c.reshape(*c.shape[:-2], h // 2, 2, w // 2, 2)
        return c.mean(axis=(-3, -1))

    def to_u8(v):
        return np.round(np.clip(v, 0.0, 1.0) * 255.0).astype(np.uint8)

    return to_u8(y), to_u8(sub(cb)), to_u8(sub(cr))


@functools.partial(jax.jit, static_argnames=("mode",))
def _finish_rgb(rgb_decoded: jnp.ndarray, mode: str):
    """Fused decode-output -> wire transform: clip to [0, 1] then pack.

    Returns a tuple of wire arrays: (y, cb, cr) for "yuv420", (u8,) for "u8",
    (f32,) otherwise. One fused kernel — the eager chain materializes several
    full-resolution temporaries right after the VAE decode, the peak-memory
    moment on a 16 GB chip.
    """
    rgb01 = jnp.clip(rgb_decoded.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
    if mode == "yuv420":
        return _rgb_to_yuv420_wire(rgb01)
    if mode == "u8":
        return (jnp.round(rgb01 * 255.0).astype(jnp.uint8),)
    return (rgb01,)


@functools.partial(jax.jit, static_argnames=("mode",))
def _finish_disparity(disp_decoded: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Fused disparity decode-output -> wire: channel mean, affine, square
    (or u8 sqrt-domain quantization)."""
    ds = disp_decoded.astype(jnp.float32).mean(axis=-1) * 0.5 + 0.5
    if mode == "u8":
        return jnp.round(jnp.clip(ds, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    d = jnp.square(ds)
    return d.astype(jnp.float16) if mode == "fp16" else d


@functools.partial(jax.jit, static_argnames=("dtype",))
def _yuv420_to_unit(y_u8, cb_u8, cr_u8, dtype) -> jnp.ndarray:
    """Device-side unpack of the H2D yuv420 wire -> [-1, 1] RGB (..., H, W, 3).

    Chroma is upsampled nearest (broadcast+reshape, gather-free on TPU).
    Jitted so the whole chain fuses: the eager form materializes ~2 GB of f32
    intermediates at 41f x 480p, which tips a chip already holding the fp8
    DiT over the 16 GB cliff.
    """
    y = jnp.asarray(y_u8).astype(jnp.float32) / 255.0
    cb = jnp.asarray(cb_u8).astype(jnp.float32) / 255.0 - 0.5
    cr = jnp.asarray(cr_u8).astype(jnp.float32) / 255.0 - 0.5

    def up(c):
        *lead, h2, w2 = c.shape
        c = jnp.broadcast_to(c[..., :, None, :, None],
                             (*lead, h2, 2, w2, 2))
        return c.reshape(*lead, h2 * 2, w2 * 2)

    cb, cr = up(cb), up(cr)
    r = y + cr / _CR_SCALE
    b = y + cb / _CB_SCALE
    g = (y - _YR * r - _YB * b) / _YG
    rgb01 = jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)
    return (rgb01 * 2.0 - 1.0).astype(dtype)


def _encode_moments_chunked(
    config: PipelineConfig,
    dtype,
    vae_params: Dict[str, Any],
    video: jnp.ndarray,  # (1, F, H, W, 3) in [-1, 1]
    frame_batch_size: Optional[int] = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Temporally-chunked moment encode with conv-cache threading.

    Returns channels-last (1, F_lat, h, w, C) mean and logvar; 2 compiled
    chunk shapes. The 8-frame default IS the reference's numerics: diffusers'
    framewise encode (``num_sample_frames_batch_size = 8``) computes GroupNorm
    statistics per 8-frame chunk, so both the chunk pattern (first chunk
    takes the remainder) and the chunk SIZE are checkpoint semantics — pinned
    cross-framework by tests/test_pipeline_torch_parity.py.
    ``frame_batch_size=None`` encodes the whole clip in one graph (faster,
    but clip-wide norm stats deviate from the checkpoint's framewise mode).
    """
    if frame_batch_size is None:
        return _encode_full(config, dtype, vae_params, video)
    t = video.shape[1]
    n_chunks = max(t // frame_batch_size, 1)
    remaining = t % frame_batch_size if t > frame_batch_size else 0
    means, logvars = [], []
    cache = None
    start = 0
    for i in range(n_chunks):
        end = min(frame_batch_size + remaining if i == 0 else
                  start + frame_batch_size, t)
        mean, logvar, cache = _encode_chunk(
            config, dtype, vae_params, video[:, start:end], cache
        )
        means.append(mean)
        logvars.append(logvar)
        start = end
    return jnp.concatenate(means, axis=1), jnp.concatenate(logvars, axis=1)


def _finish_encode(
    config: PipelineConfig, dtype, mean: jnp.ndarray, logvar: jnp.ndarray,
    key: Optional[jax.Array],
) -> jnp.ndarray:
    """Posterior sample + latent scaling -> (1, F_lat, C, h, w)."""
    if key is not None:
        logvar = jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0)
        noise = jax.random.normal(key, mean.shape, jnp.float32)
        lat = mean.astype(jnp.float32) + jnp.exp(0.5 * logvar) * noise
    else:
        lat = mean.astype(jnp.float32)
    lat = jnp.moveaxis(lat, -1, 2)  # (1, F_lat, C, h, w)
    scale = config.vae.scaling_factor
    if config.vae.invert_scale_latents:
        return (lat / scale).astype(dtype)
    return (lat * scale).astype(dtype)


def _encode_pixels(
    config: PipelineConfig,
    dtype,
    vae_params: Dict[str, Any],
    frames: jnp.ndarray,  # (F, H, W, 3) in [-1, 1]
    key: Optional[jax.Array],
    frame_batch_size: Optional[int] = 8,
) -> jnp.ndarray:
    """Chunked VAE encode -> scaled condition latents (1, F_lat, C, h, w);
    8-frame framewise chunking = the reference's canonical numerics."""
    mean, logvar = _encode_moments_chunked(
        config, dtype, vae_params, frames[None], frame_batch_size
    )
    return _finish_encode(config, dtype, mean, logvar, key)


def _tiled_moments(
    config: PipelineConfig,
    dtype,
    vae_params: Dict[str, Any],
    video: jnp.ndarray,  # (B, F, H, W, 3) in [-1, 1]
    frame_batch_size: Optional[int],
    tile_latent: Tuple[int, int],
    min_overlap: Tuple[int, int],
) -> Optional[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Spatially-tiled moment encode with latent-space feathered seams.

    Batch-agnostic (the window batch rides the VAE's batch axis — and the
    mesh's 'dp' axis when sharded). Returns channels-last (mean, logvar) or
    None when a single tile covers the frame (caller falls back untiled)."""
    s = config.vae_scale_factor_spatial
    h, w = video.shape[2:4]
    row_spans = _tile_spans(h // s, tile_latent[0], min_overlap[0])
    col_spans = _tile_spans(w // s, tile_latent[1], min_overlap[1])
    if len(row_spans) == 1 and len(col_spans) == 1:
        return None

    merged = None  # (mean, logvar), channels-last, latent h/w at axes 2/3
    rows_prev_end = 0
    for r0, r1 in row_spans:
        row = None
        prev_end = 0
        for c0, c1 in col_spans:
            tile = video[:, :, r0 * s : r1 * s, c0 * s : c1 * s]
            moments = _encode_moments_chunked(config, dtype, vae_params, tile,
                                              frame_batch_size)
            moments[0].block_until_ready()  # cap in-flight queue (see decode)
            if row is None:
                row = moments
            else:
                row = tuple(
                    _feather(a, b, prev_end, (c0, c1), axis=3)
                    for a, b in zip(row, moments)
                )
            prev_end = c1
        if merged is None:
            merged = row
        else:
            merged = tuple(
                _feather(a, b, rows_prev_end, (r0, r1), axis=2)
                for a, b in zip(merged, row)
            )
        rows_prev_end = r1
    return merged


def _encode_pixels_tiled(
    config: PipelineConfig,
    dtype,
    vae_params: Dict[str, Any],
    frames: jnp.ndarray,  # (F, H, W, 3) in [-1, 1]
    key: Optional[jax.Array],
    frame_batch_size: Optional[int] = 8,
    tile_latent: Tuple[int, int] = (32, 90),
    min_overlap: Tuple[int, int] = (4, 6),
) -> jnp.ndarray:
    """Spatially-tiled encode: per-tile moment encode, latent-space feathered
    seams, ONE posterior draw over the blended moments (so the noise stream
    matches the untiled path). Cuts encoder workspace ~4x — needed when the
    10.4 GB DiT shares HBM (the reference's ``vae.enable_tiling()``)."""
    merged = _tiled_moments(config, dtype, vae_params, frames[None],
                            frame_batch_size, tile_latent, min_overlap)
    if merged is None:
        return _encode_pixels(config, dtype, vae_params, frames, key,
                              frame_batch_size)
    return _finish_encode(config, dtype, merged[0], merged[1], key)


def _encode_pixels_tiled_batch(
    config: PipelineConfig,
    dtype,
    vae_params: Dict[str, Any],
    video: jnp.ndarray,  # (B, F, H, W, 3) in [-1, 1]
    keys: Optional[list],  # per-window PRNG keys (len B) or None
    frame_batch_size: Optional[int] = 8,
    tile_latent: Tuple[int, int] = (32, 90),
    min_overlap: Tuple[int, int] = (4, 6),
) -> jnp.ndarray:
    """Batched-window tiled encode: B windows ride the VAE batch axis through
    ONE graph per tile instead of a per-window Python loop (the whole batch
    shards over 'dp' under a mesh). The posterior draw uses one key per window
    so the noise stream matches the serial per-window path exactly."""
    merged = _tiled_moments(config, dtype, vae_params, video,
                            frame_batch_size, tile_latent, min_overlap)
    if merged is None:
        merged = _encode_moments_chunked(config, dtype, vae_params, video,
                                         frame_batch_size)
    return _finish_encode_keys(config, dtype, merged[0], merged[1], keys)


def _finish_encode_keys(
    config: PipelineConfig, dtype, mean: jnp.ndarray, logvar: jnp.ndarray,
    keys: Optional[list],
) -> jnp.ndarray:
    """Posterior sample with ONE PRNG key per batch element (window), so a
    batched encode reproduces the serial per-window noise stream exactly."""
    if keys is None:
        return _finish_encode(config, dtype, mean, logvar, None)
    per_window = (1,) + tuple(mean.shape[1:])
    if all(k is keys[0] for k in keys):
        # batch_reconstruct passes the SAME key for every window (serial-loop
        # parity): one draw broadcast is bit-identical and B-1 graphs cheaper
        noise = jnp.broadcast_to(
            jax.random.normal(keys[0], per_window, jnp.float32),
            (len(keys),) + per_window[1:],
        )
    else:
        noise = jnp.concatenate(
            [jax.random.normal(k, per_window, jnp.float32) for k in keys],
            axis=0,
        )
    logvar = jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0)
    lat = mean.astype(jnp.float32) + jnp.exp(0.5 * logvar) * noise
    lat = jnp.moveaxis(lat, -1, 2)  # (B, F_lat, C, h, w)
    scale = config.vae.scaling_factor
    if config.vae.invert_scale_latents:
        return (lat / scale).astype(dtype)
    return (lat * scale).astype(dtype)


def _tile_spans(n: int, tile: int, min_overlap: int) -> list:
    """Uniform-size tile spans covering [0, n) with >= min_overlap overlap.

    Every span has EXACTLY ``tile`` extent (edge tiles slide back), so the
    decoder compiles ONE tile shape — unlike diffusers' ragged edge tiles
    which would force a recompile per remainder shape.
    """
    if n <= tile:
        return [(0, n)]
    count = math.ceil((n - tile) / (tile - min_overlap)) + 1
    stride = (n - tile) / (count - 1)
    return [
        (min(int(round(i * stride)), n - tile),
         min(int(round(i * stride)), n - tile) + tile)
        for i in range(count)
    ]


def _feather(prev: jnp.ndarray, curr: jnp.ndarray, prev_end: int,
             span: Tuple[int, int], axis: int) -> jnp.ndarray:
    """Stitch ``curr`` (covering span) onto ``prev`` (covering [0, prev_end))
    along ``axis`` with a linear cross-fade over the overlap."""
    start, end = span
    overlap = prev_end - start

    def sl(arr, a, b):
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(a, b)
        return arr[tuple(idx)]

    w_shape = [1] * prev.ndim
    w_shape[axis] = overlap
    weight = jnp.linspace(1.0, 0.0, overlap).reshape(w_shape).astype(prev.dtype)
    blended = sl(prev, start, prev_end) * weight + sl(curr, 0, overlap) * (
        1.0 - weight
    )
    return jnp.concatenate(
        [sl(prev, 0, start), blended, sl(curr, overlap, end - start)], axis=axis
    )


# Adaptive full-strip decode state: None = untried, True = works on this
# runtime, False = allocation failed once -> permanently chunked this process.
_FULL_STRIP_STATE: Dict[str, Optional[bool]] = {"ok": None}
# scan-decode health: None = untried, True = compiled+ran, False = fell back
# (remote compile failed / compile-OOM) — host-loop chunks for the process
_SCAN_DECODE_STATE: Dict[str, Optional[bool]] = {"ok": None}


def _oom_is_survivable() -> bool:
    """Does this runtime survive an allocation failure with a catchable error?

    Full PJRT runtimes (real TPU/GPU hosts) raise a catchable
    RESOURCE_EXHAUSTED and expose ``Device.memory_stats()``; the tunneled
    remote runtime wedges PERMANENTLY on any allocation failure (BASELINE.md)
    and returns no memory stats (probed 2026-08, ``scripts/
    probe_decode_memory.py``: ``memory_stats() -> None`` on the axon
    platform). Stats availability is therefore the discriminator for whether
    an adaptive try-the-fast-path-catch-OOM strategy is safe at all.
    """
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return False
    return bool(stats) and "bytes_limit" in stats


def _full_strip_enabled() -> bool:
    """Whole-clip strip decode: opt-in via AETHER_FULL_STRIP_DECODE=1.

    Whole-clip strips measured ~20% faster than 2-frame chunks (3.06 vs
    3.97 s at 41f x 480p) but (a) their multi-GB workspace can exhaust HBM
    beside the fp8 DiT, and (b) they CHANGE NUMERICS: GroupNorm statistics
    span the whole clip instead of each 2-latent-frame chunk, while the
    published checkpoint's canonical numerics are the framewise mode
    (diffusers ``num_latent_frames_batch_size=2``, per-chunk stats — pinned
    by the e2e torch goldens). Default is therefore OFF everywhere; "1"
    trades reference-exact numerics for ~20% decode speed on runtimes where
    an allocation failure is survivable (see :func:`_oom_is_survivable`).
    """
    return _env_flag("AETHER_FULL_STRIP_DECODE", False)


def _decode_strip_adaptive(
    config: PipelineConfig,
    dtype,
    vae_params: Dict[str, Any],
    latents_16: jnp.ndarray,
    frame_batch_size: Optional[int] = 2,
) -> jnp.ndarray:
    """Try the whole-clip strip decode once; fall back to chunked on
    allocation failure and remember the verdict for the process lifetime.
    On wedge-on-OOM runtimes the verdict comes from the memgate compile
    probe instead — there an allocation failure is fatal, not catchable."""
    if (_full_strip_enabled() and _FULL_STRIP_STATE["ok"] is None
            and memgate.gate_active()):
        b, t, _, h, w = latents_16.shape
        z_aval = jax.ShapeDtypeStruct(
            (b, t, h, w, latents_16.shape[2]), jnp.float32)
        _FULL_STRIP_STATE["ok"] = memgate.fits(
            "decode_full", _decode_full, config, dtype, vae_params, z_aval)
    if _full_strip_enabled() and _FULL_STRIP_STATE["ok"] is not False:
        try:
            out = _decode_pixels(config, dtype, vae_params, latents_16, None)
            out.block_until_ready()
            _FULL_STRIP_STATE["ok"] = True
            return out
        except Exception as e:  # jaxlib.xla_extension.XlaRuntimeError
            msg = str(e)
            if "RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower():
                _FULL_STRIP_STATE["ok"] = False
            else:
                raise
    return _decode_pixels(config, dtype, vae_params, latents_16,
                          frame_batch_size)


def _decode_pixels_tiled(
    config: PipelineConfig,
    dtype,
    vae_params: Dict[str, Any],
    latents_16: jnp.ndarray,  # (1, F_lat, C, h, w) scaled
    frame_batch_size: Optional[int] = 2,
    tile_latent: Tuple[int, int] = (32, 90),
    min_overlap: Tuple[int, int] = (4, 6),
) -> jnp.ndarray:
    """Spatially-tiled decode for memory-constrained chips.

    The reference enables diffusers VAE tiling for the same reason
    (``scripts/demo.py:229-230``). Tiles are uniform-shape (single compiled
    decode graph), seams feather-blended in pixel space with linear ramps.
    Defaults: full-width strips (1.07x redundancy vs 1.14x for 2x2 tiles),
    temporally chunked at 2 latent frames. Whole-clip strips
    (frame_batch_size=None) measured ~20% faster (3.97 -> 3.06 s at 41f x
    480p) but their multi-GB workspace OOMs when the remote runtime's
    staging reservations grow, and LARGER chunks balloon the program's
    buffer assignment (the conv-cache outputs pin every stage activation:
    6-frame chunks assign 26.5 GB). 2-latent-frame chunking is also the
    CHECKPOINT's numerics (diffusers framewise mode: per-chunk GroupNorm
    stats; conv caches alone are exact, norms are not) — pass None only to
    trade reference-exact outputs for ~20% decode speed.
    """
    s = config.vae_scale_factor_spatial
    h_lat, w_lat = latents_16.shape[-2:]
    row_spans = _tile_spans(h_lat, tile_latent[0], min_overlap[0])
    col_spans = _tile_spans(w_lat, tile_latent[1], min_overlap[1])
    if len(row_spans) == 1 and len(col_spans) == 1:
        return _decode_pixels(config, dtype, vae_params, latents_16,
                              frame_batch_size)

    merged_rows = None
    rows_prev_end = 0
    for r0, r1 in row_spans:
        merged = None
        prev_end = 0
        for c0, c1 in col_spans:
            tile = _decode_strip_adaptive(
                config, dtype, vae_params, latents_16[:, :, :, r0:r1, c0:c1],
                frame_batch_size,
            )
            # cap the in-flight dispatch queue: tunneled remote runtimes
            # exhaust transfer/queue resources when hundreds of chunk ops pile
            # up unsynchronized (costs ~one roundtrip per tile)
            tile.block_until_ready()
            if merged is None:
                merged = tile
            else:
                merged = _feather(merged, tile, prev_end * s,
                                  (c0 * s, c1 * s), axis=3)
            prev_end = c1
        if merged_rows is None:
            merged_rows = merged
        else:
            merged_rows = _feather(merged_rows, merged, rows_prev_end * s,
                                   (r0 * s, r1 * s), axis=2)
        rows_prev_end = r1
    return merged_rows


def _decode_pixels(
    config: PipelineConfig,
    dtype,
    vae_params: Dict[str, Any],
    latents_16: jnp.ndarray,  # (1, F_lat, C, h, w) scaled
    frame_batch_size: Optional[int] = 2,
) -> jnp.ndarray:
    """Chunked VAE decode -> (1, F, H, W, 3) in the compute dtype.

    ``frame_batch_size=None`` decodes the whole clip in one graph (fastest
    when the workspace fits). Output stays in ``dtype`` (bf16 on TPU) so
    downstream tile feathering churns half the bytes; callers convert at the
    very end.
    """
    z = latents_16.astype(jnp.float32) / config.vae.scaling_factor
    z = jnp.moveaxis(z, 2, -1)  # channels-last
    if frame_batch_size is None:
        return _decode_full(config, dtype, vae_params, z)

    # Wedge-on-OOM runtimes (the tunneled chip): nothing may execute before
    # its footprint is known to fit beside the resident params. Compile-probe
    # the candidate graphs (memgate; compile allocates nothing on device) and
    # pick from the ANALYSIS — the try/except below is then only a guard for
    # transient compile/transport errors, never a first-OOM "fallback" (on
    # this runtime the first OOM is fatal; round-4 driver bench post-mortem).
    if memgate.gate_active():
        scan_ok = (_scan_decode_enabled()
                   and _SCAN_DECODE_STATE["ok"] is not False
                   and memgate.fits("decode_scanned", _decode_scanned,
                                    config, dtype, vae_params, z,
                                    frame_batch_size))
        if not scan_ok:
            # would the host-loop's biggest chunk fit? (first chunk absorbs
            # the remainder: it is the largest single program in the loop)
            t = z.shape[1]
            first = (t - (max(t // frame_batch_size, 1) - 1)
                     * frame_batch_size)
            chunk_ok = memgate.fits(
                "decode_chunk_first", _decode_chunk, config, dtype,
                vae_params, jax.ShapeDtypeStruct(
                    (z.shape[0], first, *z.shape[2:]), z.dtype), None)
            if not chunk_ok and z.shape[0] > 1:
                # halve the batch: decode each half serially (bit-identical —
                # the streams are independent) and concatenate
                h = z.shape[0] // 2
                return jnp.concatenate([
                    _decode_pixels(config, dtype, vae_params,
                                   latents_16[:h], frame_batch_size),
                    _decode_pixels(config, dtype, vae_params,
                                   latents_16[h:], frame_batch_size),
                ], axis=0)
        if scan_ok:
            out = _decode_scanned(config, dtype, vae_params, z,
                                  fb=frame_batch_size)
            if _SCAN_DECODE_STATE["ok"] is None:
                out.block_until_ready()
                _SCAN_DECODE_STATE["ok"] = True
            return out
    elif _scan_decode_enabled() and _SCAN_DECODE_STATE["ok"] is not False:
        try:
            out = _decode_scanned(config, dtype, vae_params, z,
                                  fb=frame_batch_size)
            if _SCAN_DECODE_STATE["ok"] is None:
                out.block_until_ready()
                _SCAN_DECODE_STATE["ok"] = True
            return out
        except jax.errors.JaxRuntimeError as exc:
            # The whole-strip scan graph is the biggest single compile this
            # pipeline ships; on the tunneled runtime its remote compile can
            # fail with compile-memory RESOURCE_EXHAUSTED or an INTERNAL
            # remote_compile transport error (observed round 4). The
            # host-loop chunk decode is bit-identical — same chunk
            # boundaries, same per-chunk GroupNorm stats — so fall back to
            # it for the process lifetime rather than dying. Anything else
            # (bad graph, kernel fault) re-raises.
            msg = str(exc)
            if not (_is_oom_error(exc) or "remote_compile" in msg):
                raise
            import sys

            print(f"scan decode unavailable ({msg.splitlines()[0][:120]}); "
                  "falling back to host-loop chunk decode",
                  file=sys.stderr, flush=True)
            _SCAN_DECODE_STATE["ok"] = False
    t = z.shape[1]
    n_chunks = max(t // frame_batch_size, 1)
    remaining = t % frame_batch_size if t > frame_batch_size else 0
    outs = []
    cache = None
    start = 0
    for i in range(n_chunks):
        end = min(frame_batch_size + remaining if i == 0 else
                  start + frame_batch_size, t)
        video, cache = _decode_chunk(config, dtype, vae_params, z[:, start:end], cache)
        outs.append(video)
        start = end
    return jnp.concatenate(outs, axis=1)


def _batched_decode_enabled() -> bool:
    """One stacked RGB+disparity decode pass: on by default,
    AETHER_BATCHED_DECODE=0 restores the two serial passes. On wedge-on-OOM
    runtimes the stacked batch is additionally subject to the memgate batch
    split inside :func:`_decode_pixels` (a 2B-batch chunk graph that does
    not fit beside the resident DiT decomposes into serial B-batch chunks
    before anything executes)."""
    return _env_flag("AETHER_BATCHED_DECODE", True)


def _is_oom_error(exc: BaseException) -> bool:
    """True when a JaxRuntimeError is HBM-exhaustion shaped (compile-time
    RESOURCE_EXHAUSTED or an allocator out-of-memory), the only failures the
    stacked-decode serial fallback can actually cure."""
    msg = str(exc).lower()
    return ("resource_exhausted" in msg or "out of memory" in msg
            or "hbm" in msg or "oom" in msg)


def _decode_rgb_and_disparity(
    config: PipelineConfig,
    dtype,
    vae_params: Dict[str, Any],
    latents: jnp.ndarray,  # (B, F_lat, 56, h, w) scaled
    tiling: bool,
    mesh=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode the RGB and disparity 16-ch latent streams in ONE VAE pass.

    The two streams are independent decodes of identical shape, so they ride
    the VAE's batch axis together: half the per-tile/per-chunk graph
    dispatches (each costs a tunnel roundtrip via ``block_until_ready``) and
    one batch-2B conv per stage instead of two batch-B convs on the MXU. The
    reference decodes them serially (``aetherv1_pipeline_cogvideox.py:
    931-940``). Under a dp mesh whose axis divides 2B the stacked batch is
    dp-sharded, so e.g. dp=2 decodes RGB and disparity on different chips.
    Returns ``(rgb, disparity_raw)``, each (B, F, H, W, 3) in ``dtype``.
    """
    lat_c = config.vae.latent_channels
    decode = _decode_pixels_tiled if tiling else _decode_strip_adaptive
    rgb_lat = latents[:, :, :lat_c]
    disp_lat = latents[:, :, lat_c : 2 * lat_c]
    if not _batched_decode_enabled():
        return (decode(config, dtype, vae_params, rgb_lat),
                decode(config, dtype, vae_params, disp_lat))
    b = latents.shape[0]
    both = jnp.concatenate([rgb_lat, disp_lat], axis=0)
    if mesh is not None:
        dp = int(mesh.shape.get("dp", 1))
        if dp > 1 and (2 * b) % dp == 0:
            both = jax.device_put(
                both,
                jax.sharding.NamedSharding(mesh,
                                           jax.sharding.PartitionSpec("dp")),
            )
    try:
        out = decode(config, dtype, vae_params, both)
    except jax.errors.JaxRuntimeError as exc:
        # the stacked batch doubles the decode chunk workspace; whether it
        # fits depends on what else is resident (int8 DiT tree, remote
        # staging reservations) — on a compile-time HBM OOM fall back to the
        # reference's serial per-stream decodes (half the workspace, same
        # numerics) instead of failing the whole pipeline run. Compile
        # failures allocate nothing on-device, so the client stays healthy.
        # Only OOM-shaped failures qualify: anything else (kernel bug,
        # wedged runtime) would re-raise identically from the serial decodes
        # and the fallback would just bury the root cause.
        if not _is_oom_error(exc):
            raise
        import sys

        print(f"[pipeline] stacked rgb+disparity decode failed "
              f"({type(exc).__name__}); falling back to serial decodes",
              file=sys.stderr, flush=True)
        return (decode(config, dtype, vae_params, rgb_lat),
                decode(config, dtype, vae_params, disp_lat))
    return out[:b], out[b:]


@functools.partial(
    jax.jit,
    static_argnames=("config", "attn_impl", "compute_dtype", "task", "do_cfg",
                     "seg_len", "act_quant", "mesh", "broadcast_noise",
                     "fixed_max", "qk_int8", "block_unroll"),
)
def _denoise_segment(
    config: PipelineConfig,
    attn_impl: str,
    compute_dtype,
    task: str,
    do_cfg: bool,
    dit_params: Dict[str, Any],
    empty_prompt_embeds: jnp.ndarray,
    condition_latents: jnp.ndarray,  # (1, F_lat, 40, h, w): 16 content + 24 camera
    plan: SamplingPlan,
    guidance: jnp.ndarray,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    key_sde: jax.Array,
    latents: jnp.ndarray,
    old_x0: jnp.ndarray,
    step_start: jnp.ndarray,  # traced scalar: absolute index of the first step
    seg_len: int,
    act_quant: bool = False,
    mesh=None,
    broadcast_noise: bool = False,
    fixed_max: bool = False,
    qk_int8: bool = False,
    block_unroll: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One jitted segment of the denoise scan: steps [step_start,
    step_start + seg_len). All plan/guidance/SDE-key indexing uses ABSOLUTE
    step indices, so chaining segments is bit-identical to one long scan."""
    cfg = config
    dtype = compute_dtype
    lat_c = cfg.vae.latent_channels
    b = condition_latents.shape[0]
    noise_b = 1 if broadcast_noise else b

    def _pin_lat(x):
        """Explicitly pin a 5-D latent tensor's sharding under an 'sp' mesh.

        Under sequence parallelism the DiT's token-axis constraints
        (``_sp_token_constraint``) back-propagate through unpatchify onto the
        scan carry, and GSPMD cannot reconcile that token-derived sharding
        with the latent-packing concatenates below — it falls back to
        "Involuntary full rematerialization ... SPMD will replicate"
        (spmd_partitioner.cc:652), an unchosen all-gather buried per step.
        The latents are small (tens of MB at full size) relative to the
        activations sp actually shards, so the CORRECT placement is an
        explicit one: batch over 'dp' when divisible, replicated over 'sp'.
        Token stripes then start cleanly at the patchify constraint inside
        ``dit_forward``. No-op without an sp axis."""
        if mesh is None or mesh.shape.get("sp", 1) <= 1:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = mesh.shape.get("dp", 1)
        batch_axis = "dp" if dp > 1 and x.shape[0] % dp == 0 else None
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(batch_axis, None, None, None, None))
        )

    # CFG uncond masking (pipeline:839-855)
    if do_cfg:
        uncond = condition_latents
        if task == "planning":
            uncond = uncond.at[:, :, :lat_c].set(0.0)
        elif task == "prediction":
            uncond = uncond.at[:, :1, :lat_c].set(0.0)
        latent_condition = _pin_lat(
            jnp.concatenate([uncond, condition_latents], axis=0))
        text = jnp.broadcast_to(
            empty_prompt_embeds, (2 * b, *empty_prompt_embeds.shape[-2:])
        )
    else:
        latent_condition = condition_latents
        text = jnp.broadcast_to(
            empty_prompt_embeds, (b, *empty_prompt_embeds.shape[-2:])
        )

    def body(carry, i):
        lat, old_x0 = carry
        model_in = jnp.concatenate([lat] * 2, axis=0) if do_cfg else lat
        model_in = _pin_lat(jnp.concatenate([model_in, latent_condition], axis=2))
        t = plan.timesteps[i]
        t_batch = jnp.broadcast_to(t, (model_in.shape[0],))
        noise_pred = _pin_lat(dit_forward(
            dit_params, cfg.dit, model_in, text, t_batch,
            rope_cos, rope_sin, attn_impl=attn_impl, act_quant=act_quant,
            mesh=mesh, fixed_max=fixed_max, qk_int8=qk_int8,
            block_unroll=block_unroll,
        ).astype(jnp.float32))
        if do_cfg:
            uncond_pred, cond_pred = jnp.split(noise_pred, 2, axis=0)
            noise_pred = uncond_pred + guidance[i] * (cond_pred - uncond_pred)
        sde_noise = jnp.broadcast_to(
            jax.random.normal(jax.random.fold_in(key_sde, i),
                              (noise_b,) + lat.shape[1:], jnp.float32),
            lat.shape,
        )
        new_lat, x0 = dpm_step(plan, i, lat.astype(jnp.float32), noise_pred,
                               old_x0, sde_noise)
        return (new_lat.astype(dtype), x0), None

    (latents, old_x0), _ = jax.lax.scan(
        body, (latents, old_x0), step_start + jnp.arange(seg_len)
    )
    return latents, old_x0


def _denoise_seg_len(num_steps: int) -> int:
    """Steps per device program. The tunneled v5e worker CRASHES ("TPU worker
    process crashed or restarted") on single programs running more than a few
    minutes: the 50-step CFG-pair denoise (~250 s on-device) reproducibly
    died while 12 steps (~80 s) ran fine — so long scans are split into
    bounded segments. AETHER_DENOISE_SEG overrides (0 = never split); CPU
    never splits (no watchdog, and one scan compiles faster)."""
    import os

    env = os.environ.get("AETHER_DENOISE_SEG")
    if env is not None:
        seg = int(env)
    else:
        seg = 12 if jax.default_backend() not in ("cpu",) else 0
    if seg <= 0:
        return num_steps
    return min(seg, num_steps)


def _denoise(
    config: PipelineConfig,
    attn_impl: str,
    compute_dtype,
    task: str,
    do_cfg: bool,
    dit_params: Dict[str, Any],
    empty_prompt_embeds: jnp.ndarray,
    condition_latents: jnp.ndarray,
    plan: SamplingPlan,
    guidance: jnp.ndarray,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    key: jax.Array,
    act_quant: bool = False,
    mesh=None,
    broadcast_noise: bool = False,
    fixed_max: bool = False,
    qk_int8: bool = False,
    block_unroll: int = 1,
) -> jnp.ndarray:
    """Denoise driver: init noise + the scan in bounded jitted segments.

    Returns the final (B, F_lat, 56, h, w) latents. Segment chaining is
    bit-identical to one long scan (absolute step indexing everywhere); see
    :func:`_denoise_seg_len` for why segmentation exists.

    ``broadcast_noise``: draw the init/SDE noise once and broadcast it over
    the batch. A serial loop seeded identically gives every window the SAME
    noise stream (the reference re-seeds its generator per call,
    ``demo.py:42-49``), so the batched multi-window path uses this to be
    bit-identical to — and composition-invariant with — the serial path.
    """
    dtype = compute_dtype
    b, f_lat, _, h_lat, w_lat = condition_latents.shape

    key_noise, key_sde = jax.random.split(key)
    noise_b = 1 if broadcast_noise else b
    latents = jnp.broadcast_to(
        jax.random.normal(key_noise, (noise_b, f_lat, 56, h_lat, w_lat),
                          jnp.float32) * plan.init_noise_sigma,
        (b, f_lat, 56, h_lat, w_lat),
    ).astype(dtype)
    old_x0 = jnp.zeros(latents.shape, jnp.float32)

    total = int(plan.num_steps)
    seg = _denoise_seg_len(total)
    # Opt-in CFG prefix skip (AETHER_CFG_SKIP_TOL, default off): under the
    # dynamic-CFG cosine ramp (reference pipeline:879-893) the per-step scale
    # s_i sits at ~1.0 for the early high-noise steps — there
    # uncond + s*(cond - uncond) ~= cond, so the uncond stream buys nothing.
    # Steps in the maximal prefix with |s_i - 1| <= tol run single-stream
    # (do_cfg=False segments; the scan carry shapes are identical, so
    # chaining stays exact). LOSSY even at s_i == 1.0 exactly — a + (b - a)
    # rounds differently than b in f32 — hence opt-in, mirroring the lossy
    # wire formats. At the prediction default (g=3, 50 steps) tol=1e-3 skips
    # the first ~40% of steps ~= 20% of denoise FLOPs.
    n_skip = 0
    if do_cfg:
        tol = float(os.environ.get("AETHER_CFG_SKIP_TOL", "0") or 0.0)
        if tol > 0.0:
            near_one = np.abs(np.asarray(guidance) - 1.0) <= tol
            n_skip = int(np.argmin(near_one)) if not near_one.all() else total
    start = 0
    while start < total:
        seg_cfg = do_cfg and start >= n_skip
        limit = n_skip if (do_cfg and start < n_skip) else total
        n = min(seg, limit - start)
        latents, old_x0 = _denoise_segment(
            config, attn_impl, compute_dtype, task, seg_cfg, dit_params,
            empty_prompt_embeds, condition_latents, plan, guidance, rope_cos,
            rope_sin, key_sde, latents, old_x0, jnp.asarray(start, jnp.int32),
            seg_len=n, act_quant=act_quant, mesh=mesh,
            broadcast_noise=broadcast_noise, fixed_max=fixed_max,
            qk_int8=qk_int8, block_unroll=block_unroll,
        )
        start += n
        # live sub-stage progress for front-ends: only when someone is
        # listening (the block_until_ready serializes dispatch with compute,
        # which costs nothing per ~80 s segment but is pointless headless),
        # and only when the scan actually split
        if total > n or start < total:
            from aether_tpu.utils.profiling import (
                has_stage_listeners,
                notify_stage_progress,
            )

            if has_stage_listeners():
                jax.block_until_ready(latents)
                notify_stage_progress("denoise", start / total)
    return latents


class AetherPipeline:
    """Task-dispatching sampler over (dit_params, vae_params).

    Parameters are plain pytrees; ``empty_prompt_embeds`` is the cached (1, 226,
    4096) empty-prompt T5 embedding the reference computes once at init
    (``pipeline:290-297``) — baked into the checkpoint here, so no T5 at runtime.
    """

    def __init__(
        self,
        config: PipelineConfig,
        dit_params: Dict[str, Any],
        vae_params: Dict[str, Any],
        empty_prompt_embeds: Union[np.ndarray, jnp.ndarray],
        attn_impl: str = "auto",
        compute_dtype=jnp.bfloat16,
        vae_tiling: Optional[bool] = None,
        compact_transfer: Optional[bool] = None,
        wire_rgb: Optional[str] = None,
        wire_input: str = "u8",
        wire_disparity: str = "fp16",
        act_quant: bool = False,
        mesh=None,
    ):
        """``mesh``: an optional ('dp', 'tp') ``jax.sharding.Mesh``. DiT params
        are sharded Megatron-style across 'tp' (XLA GSPMD inserts the ICI
        all-reduces); the CFG pair and VAE frame chunks ride 'dp'. The
        reference has no model parallelism at all (SURVEY.md section 2.3) —
        this is the TPU-native scaling path past one chip."""
        self.mesh = mesh
        if mesh is not None:
            from aether_tpu.parallel.mesh import dit_param_sharding, shard_params

            dit_params = shard_params(
                dit_params, dit_param_sharding(config.dit, mesh), mesh
            )
            rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
            vae_params = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), vae_params
            )
        self.config = config
        self.dit_params = dit_params
        self.vae_params = vae_params
        # None = auto: tile the VAE decode when frames exceed one tile
        # (the reference always enables diffusers tiling, demo.py:229-230)
        self.vae_tiling = vae_tiling
        # compact the device->host wire format (rgb uint8/yuv420, disparity
        # fp16): remote/tunneled TPUs are D2H-bandwidth-bound, and rgb is
        # quantized at export anyway. None = auto-on for non-CPU backends.
        self.compact_transfer = compact_transfer
        # rgb wire when compact: "u8" (3 B/px, exact uint8 — the default)
        # or opt-in "yuv420" (1.5 B/px, matches the mp4/x264 artifact's
        # native pixel format but 4:2:0-subsamples chroma).
        if wire_rgb not in (None, "u8", "yuv420"):
            raise ValueError(f"wire_rgb must be 'u8' or 'yuv420', got {wire_rgb}")
        self.wire_rgb = wire_rgb
        # H2D wire for pixel inputs: "u8" (exact, default) or "yuv420"
        # (1.5 B/px; lossless up to a resample roundtrip for video that was
        # decoded from yuv420p — i.e. every mp4 — and falls back to u8 for
        # odd frame sizes). Unlike wire_rgb this perturbs the model INPUT, so
        # it is opt-in.
        if wire_input not in ("u8", "yuv420"):
            raise ValueError(f"wire_input must be 'u8' or 'yuv420', got {wire_input}")
        self.wire_input = wire_input
        # disparity D2H wire when compact: "fp16" (default) or "u8", which
        # quantizes the PRE-square (sqrt-disparity) value to 8 bits and
        # squares on host — halves the pull; clips sqrt-disparity at 1.0,
        # which is harmless downstream (depth conversion clips disparity to
        # [1e-3, 1], reference postprocess_utils.py:301).
        if wire_disparity not in ("fp16", "u8"):
            raise ValueError(
                f"wire_disparity must be 'fp16' or 'u8', got {wire_disparity}")
        self.wire_disparity = wire_disparity
        # opt-in int8 activation quantization for the DiT linears (requires
        # int8-quantized weights; v5e int8 MXU is 2x the bf16 peak)
        self.act_quant = act_quant

        self.empty_prompt_embeds = jnp.asarray(empty_prompt_embeds, compute_dtype)
        if self.empty_prompt_embeds.ndim == 2:
            self.empty_prompt_embeds = self.empty_prompt_embeds[None]
        if attn_impl == "auto":
            attn_impl = "flash" if jax.default_backend() == "tpu" else "xla"
        self.attn_impl = attn_impl
        self.compute_dtype = compute_dtype

        # register the long-lived device allocations with the memory gate:
        # on wedge-on-OOM runtimes decode-graph selection must account for
        # what is resident beside the decode workspace (the round-4 bench
        # wedge was exactly scan-decode workspace + resident int8 DiT)
        from aether_tpu.runtime import memgate

        memgate.register_resident("dit_params", self.dit_params)
        memgate.register_resident("vae_params", self.vae_params)
        memgate.register_resident("empty_prompt", self.empty_prompt_embeds)

    def _wire_modes(self, compact: bool, height: int, width: int):
        """(rgb_mode, disp_mode) for the D2H wire. Compact defaults are
        quantization-exact (u8 rgb / fp16 disparity); the lossier yuv420 /
        u8-disparity wires are explicit opt-ins (wire_rgb / wire_disparity)."""
        if not compact:
            return "f32", "f32"
        rgb_mode = "u8"
        if self.wire_rgb == "yuv420" and height % 2 == 0 and width % 2 == 0:
            rgb_mode = "yuv420"
        return rgb_mode, ("u8" if self.wire_disparity == "u8" else "fp16")

    # ------------------------------------------------------------------
    # validation (reference pipeline:350-449)
    # ------------------------------------------------------------------
    def check_inputs(self, task, image, video, goal, raymap, height, width,
                     num_frames, fps) -> None:
        cfg = self.config
        if task not in ("reconstruction", "prediction", "planning"):
            raise ValueError(
                f"`task` has to be one of reconstruction/prediction/planning, got {task}."
            )
        if image is None and video is None:
            raise ValueError("`image` or `video` has to be provided.")
        if image is not None and video is not None:
            raise ValueError("`image` and `video` cannot both be provided.")
        if image is not None and task == "reconstruction":
            raise ValueError("`image` is not supported for `reconstruction` task.")
        if goal is not None and task != "planning":
            raise ValueError("`goal` is only supported for `planning` task.")
        if video is not None and task != "reconstruction":
            raise ValueError("`video` is only supported for `reconstruction` task.")
        if height % 8 != 0 or width % 8 != 0:
            raise ValueError(
                f"`height` and `width` have to be divisible by 8 but are {height} and {width}."
            )
        if num_frames is None:
            raise ValueError("`num_frames` is required.")
        if num_frames not in cfg.allowed_num_frames:
            raise ValueError(
                f"`num_frames` has to be one of {list(cfg.allowed_num_frames)}."
            )
        if fps not in cfg.allowed_fps:
            raise ValueError(f"`fps` has to be one of {list(cfg.allowed_fps)}.")
        if raymap is not None:
            expected = (num_frames, 6, height // cfg.vae_scale_factor_spatial,
                        width // cfg.vae_scale_factor_spatial)
            if tuple(raymap.shape[-4:]) != expected:
                raise ValueError(
                    f"`raymap` shape is not correct. Expected {expected}, "
                    f"got {tuple(raymap.shape)}."
                )

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def __call__(
        self,
        task: Optional[str] = None,
        image=None,
        video=None,
        goal=None,
        raymap: Optional[np.ndarray] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_frames: Optional[int] = None,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        use_dynamic_cfg: Optional[bool] = None,
        fps: Optional[int] = None,
        seed: Optional[int] = None,
        key: Optional[jax.Array] = None,
        defer_host: bool = False,
    ) -> "AetherPipelineOutput | DeferredOutput":
        cfg = self.config
        if task is None:
            task = ("reconstruction" if video is not None
                    else "planning" if goal is not None else "prediction")
        height = height or cfg.dit.sample_height * cfg.vae_scale_factor_spatial
        width = width or cfg.dit.sample_width * cfg.vae_scale_factor_spatial
        if num_frames is None:
            # the checkpoint's sample_frames (49) predates the Aether frame
            # whitelist; default to the longest supported window
            num_frames = max(cfg.allowed_num_frames)
        fps = fps or cfg.base_fps

        self.check_inputs(task, image, video, goal, raymap, height, width,
                          num_frames, fps)

        # None means "task default"; explicit falsy values (0 steps is
        # invalid anyway, guidance 0.0, dynamic_cfg False) are honored
        if num_inference_steps is None:
            num_inference_steps = dict(cfg.default_num_inference_steps)[task]
        if guidance_scale is None:
            guidance_scale = dict(cfg.default_guidance_scale)[task]
        if use_dynamic_cfg is None:
            use_dynamic_cfg = dict(cfg.default_use_dynamic_cfg)[task]
        do_cfg = guidance_scale > 1.0

        # host-side precomputation: pixels, sampling plan, rope tables, guidance
        # (uint8 wire format; normalized to [-1, 1] on device)
        if video is not None:
            pixels = preprocess_video_u8(video, height, width)
        else:
            pixels = preprocess_image_u8(image, height, width)[None]
        goal_pixels = (
            preprocess_image_u8(goal, height, width)[None]
            if goal is not None else None
        )
        raymap_arr = None if raymap is None else jnp.asarray(np.asarray(raymap))

        f_lat = (num_frames - 1) // cfg.vae_scale_factor_temporal + 1
        plan = make_sampling_plan(cfg.scheduler, num_inference_steps)
        if use_dynamic_cfg:
            guidance = dynamic_cfg_schedule(
                np.asarray(plan.timesteps), num_inference_steps, guidance_scale
            )
        else:
            guidance = np.full(num_inference_steps, guidance_scale, np.float32)
        rope_cos, rope_sin = prepare_rotary_positional_embeddings(
            cfg.dit, height, width, f_lat,
            vae_scale_factor_spatial=cfg.vae_scale_factor_spatial,
            base_fps=cfg.base_fps, fps=fps,
        )

        if key is None:
            key = jax.random.PRNGKey(seed if seed is not None else 0)
        key_vae, key_goal, key_denoise = jax.random.split(key, 3)

        cfgd = cfg
        dtype = self.compute_dtype
        lat_c = cfgd.vae.latent_channels
        h_lat = height // cfgd.vae_scale_factor_spatial
        w_lat = width // cfgd.vae_scale_factor_spatial

        # ---- stage 1: chunked VAE encode of the pixel conditions ----
        tiling = self.vae_tiling
        if tiling is None:  # auto: tile when the frame exceeds one 32x48 tile
            tiling = h_lat > 32 or w_lat > 48
        encode = _encode_pixels_tiled if tiling else _encode_pixels

        wire_in = self.wire_input if height % 2 == 0 and width % 2 == 0 else "u8"

        def upload(px_u8):
            if wire_in == "yuv420":
                return _yuv420_to_unit(*_rgb_u8_to_yuv420_host(px_u8), dtype)
            return _u8_to_unit(px_u8, dtype)

        from aether_tpu.utils.profiling import stage_timer

        with stage_timer("vae_encode", log=False):
            if task == "reconstruction":
                condition = encode(cfgd, dtype, self.vae_params,
                                   upload(pixels), key_vae)
            elif task == "prediction":
                img_lat = encode(cfgd, dtype, self.vae_params,
                                 upload(pixels), key_vae)
                padding = jnp.zeros((1, f_lat - 1, lat_c, h_lat, w_lat), dtype)
                condition = jnp.concatenate([img_lat, padding], axis=1)
            else:  # planning
                img_lat = encode(cfgd, dtype, self.vae_params,
                                 upload(pixels), key_vae)
                goal_lat = encode(cfgd, dtype, self.vae_params,
                                  upload(goal_pixels), key_goal)
                padding = jnp.zeros((1, f_lat - 2, lat_c, h_lat, w_lat), dtype)
                condition = jnp.concatenate([img_lat, padding, goal_lat],
                                            axis=1)

        if raymap_arr is not None:
            camera = pack_raymap(raymap_arr[None].astype(dtype))
        else:
            camera = jnp.zeros((1, f_lat, 24, h_lat, w_lat), dtype)
        condition_latents = jnp.concatenate([condition, camera], axis=2)

        # ---- stage 2: jitted denoise scan ----
        import contextlib

        mesh_ctx = self.mesh if self.mesh is not None else contextlib.nullcontext()
        # NOTE: _denoise dispatches asynchronously — the timer records enqueue
        # + any compile, not device latency; listeners use it as a stage marker
        from aether_tpu.models.dit import (
            block_scan_unroll_default,
            use_fixed_max_default,
            use_qk_int8_default,
        )

        with mesh_ctx, stage_timer("denoise", log=False):
            latents = _denoise(
                cfgd, self.attn_impl, dtype, task, do_cfg,
                self.dit_params, self.empty_prompt_embeds, condition_latents,
                plan, jnp.asarray(guidance), jnp.asarray(rope_cos),
                jnp.asarray(rope_sin), key_denoise,
                act_quant=self.act_quant, mesh=self.mesh,
                fixed_max=use_fixed_max_default(),
                qk_int8=use_qk_int8_default() and use_fixed_max_default(),
                block_unroll=block_scan_unroll_default(),
            )

        # ---- stage 3: chunked VAE decode + output transforms ----
        compact = self.compact_transfer
        if compact is None:
            compact = jax.default_backend() != "cpu"

        rgb_mode, disp_mode = self._wire_modes(compact, height, width)

        decode_stage = stage_timer("vae_decode", log=False)
        decode_stage.__enter__()
        try:
            # one stacked batch-2 pass for both 16-ch streams (VERDICT r2 #2)
            rgb, disparity = _decode_rgb_and_disparity(
                cfgd, dtype, self.vae_params, latents, tiling, mesh=self.mesh
            )
            packed = _finish_rgb(rgb, rgb_mode)
            rgb_wire = None
            if rgb_mode == "yuv420":
                # 1.5 B/px on the wire; reassembled on host below. Drop the
                # decoded full-res buffer so the resolve closure does not pin
                # ~85 MB of HBM across the next window under defer_host.
                rgb_wire = tuple(_start_pull(p[0]) for p in packed)
                rgb = None
            else:
                # start the big rgb pull NOW so it rides the link while the
                # disparity wire-pack computes
                rgb = _start_pull(packed[0][0])

            disp_u8 = disp_mode == "u8"
            disparity = _start_pull(_finish_disparity(disparity, disp_mode)[0])

            raymap_out = _start_pull(
                unpack_raymap(
                    latents[:, :, 2 * lat_c :].astype(jnp.float32), num_frames
                )[0]
            )
        finally:
            decode_stage.__exit__(None, None, None)

        def _resolve() -> AetherPipelineOutput:
            if rgb_wire is not None:
                rgb_np = _yuv420_wire_to_rgb(*rgb_wire)
            else:
                rgb_np = np.asarray(rgb)
                if compact:
                    rgb_np = rgb_np.astype(np.float32) / 255.0
            disp_np = np.asarray(disparity).astype(np.float32)
            if disp_u8:
                disp_np = np.square(disp_np / 255.0)
            return AetherPipelineOutput(
                rgb=rgb_np.astype(np.float32, copy=False),
                disparity=disp_np,
                raymap=np.asarray(raymap_out, dtype=np.float32),
            )

        if defer_host:
            # all device work is enqueued and the D2H copies are in flight:
            # the caller can dispatch the NEXT window's compute before paying
            # for this window's host transfer (see apps/demo.py window loop)
            return DeferredOutput(_resolve)
        return _resolve()

    # ------------------------------------------------------------------
    # batched reconstruction: independent windows data-parallel on the mesh
    # ------------------------------------------------------------------
    def batch_reconstruct(
        self,
        videos: np.ndarray,  # (B, F, H, W, 3) uint8/float windows
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_frames: Optional[int] = None,
        num_inference_steps: int = 4,
        fps: int = 12,
        seed: int = 0,
        defer_host: bool = False,
    ):
        """Reconstruct B windows in ONE batched denoise (BASELINE config #5).

        The reference loops windows serially (``demo.py:613-631``); here the
        batch axis rides the mesh's 'dp' axis when a mesh is set, so 8 chips
        reconstruct 8 windows in the wall-clock of one. Returns a list of
        :class:`AetherPipelineOutput`, one per window, ready for
        :func:`~aether_tpu.pipeline.windowing.blend_and_merge_window_results`
        (a :class:`DeferredOutput` resolving to that list when
        ``defer_host=True`` — lets the caller enqueue the next batch's compute
        before paying for this batch's host transfer).
        """
        import contextlib

        cfg = self.config
        videos = np.asarray(videos)
        bsz = orig_bsz = videos.shape[0]
        if self.mesh is not None:
            # the batch axis shards P('dp'): pad a short (tail) chunk up to
            # the next dp multiple by repeating the last window — every window
            # shares keys + broadcast noise, so duplicates are exact copies
            # whose outputs are dropped again in _resolve
            dp = int(self.mesh.shape.get("dp", 1))
            if dp > 1 and bsz % dp:
                pad = dp - bsz % dp
                videos = np.concatenate(
                    [videos, np.repeat(videos[-1:], pad, axis=0)]
                )
                bsz = videos.shape[0]
        nf = videos.shape[1]
        height = height or videos.shape[2]
        width = width or videos.shape[3]
        num_frames = num_frames or nf
        self.check_inputs("reconstruction", None, videos[0], None, None,
                          height, width, num_frames, fps)

        dtype = self.compute_dtype
        pixels = np.stack(
            [preprocess_video_u8(v, height, width) for v in videos]
        )
        f_lat = (num_frames - 1) // cfg.vae_scale_factor_temporal + 1
        h_lat = height // cfg.vae_scale_factor_spatial
        w_lat = width // cfg.vae_scale_factor_spatial
        plan = make_sampling_plan(cfg.scheduler, num_inference_steps)
        guidance = np.ones(num_inference_steps, np.float32)
        rope_cos, rope_sin = prepare_rotary_positional_embeddings(
            cfg.dit, height, width, f_lat,
            vae_scale_factor_spatial=cfg.vae_scale_factor_spatial,
            base_fps=cfg.base_fps, fps=fps,
        )
        # same key derivation as __call__ so the batched path reproduces a
        # serial per-window loop (which passes the same seed to every window,
        # reference demo.py:42-49) bit-for-bit: every window gets the SAME
        # key_vae / key_denoise, and broadcast_noise shares the noise draws
        key = jax.random.PRNGKey(seed)
        key_vae, _key_goal, key_denoise = jax.random.split(key, 3)

        tiling = self.vae_tiling
        if tiling is None:
            tiling = h_lat > 32 or w_lat > 48

        if self.wire_input == "yuv420" and height % 2 == 0 and width % 2 == 0:
            batch = _yuv420_to_unit(*_rgb_u8_to_yuv420_host(pixels), dtype)
        else:
            batch = _u8_to_unit(pixels, dtype)
        if self.mesh is not None:
            batch = jax.device_put(
                batch,
                jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec("dp")
                ),
            )
        window_keys = [key_vae] * bsz
        if tiling:
            # batched tiled encode: all windows ride the VAE batch axis
            # through one graph per tile (dp-sharded under a mesh) — replaces
            # the old per-window Python loop (VERDICT round 1, item 5b)
            condition = _encode_pixels_tiled_batch(
                cfg, dtype, self.vae_params, batch, window_keys
            )
        else:
            mean, logvar = _encode_moments_chunked(cfg, dtype, self.vae_params,
                                                   batch)
            condition = _finish_encode_keys(cfg, dtype, mean, logvar,
                                            window_keys)
        camera = jnp.zeros((bsz, f_lat, 24, h_lat, w_lat), dtype)
        condition_latents = jnp.concatenate([condition, camera], axis=2)

        mesh_ctx = self.mesh if self.mesh is not None else contextlib.nullcontext()
        with mesh_ctx:
            from aether_tpu.models.dit import (
                block_scan_unroll_default,
                use_fixed_max_default,
                use_qk_int8_default,
            )

            latents = _denoise(
                cfg, self.attn_impl, dtype, "reconstruction", False,
                self.dit_params, self.empty_prompt_embeds, condition_latents,
                plan, jnp.asarray(guidance), jnp.asarray(rope_cos),
                jnp.asarray(rope_sin), key_denoise,
                act_quant=self.act_quant, mesh=self.mesh,
                broadcast_noise=True, fixed_max=use_fixed_max_default(),
                qk_int8=use_qk_int8_default() and use_fixed_max_default(),
                block_unroll=block_scan_unroll_default(),
            )

        lat_c = cfg.vae.latent_channels
        compact = self.compact_transfer
        if compact is None:
            compact = jax.default_backend() != "cpu"
        rgb_mode, disp_mode = self._wire_modes(compact, height, width)

        # same compact-wire + async-pull overlap as the single-window path;
        # rgb+disparity ride ONE stacked decode (2B on the batch/dp axis)
        rgb, disparity = _decode_rgb_and_disparity(
            cfg, dtype, self.vae_params, latents, tiling, mesh=self.mesh
        )
        packed = _finish_rgb(rgb, rgb_mode)
        rgb_wire = None
        if rgb_mode == "yuv420":
            rgb_wire = tuple(_start_pull(p) for p in packed)
            rgb = None
        else:
            rgb = _start_pull(packed[0])

        disp_u8 = disp_mode == "u8"
        disparity = _start_pull(_finish_disparity(disparity, disp_mode))
        raymap = _start_pull(
            unpack_raymap(latents[:, :, 2 * lat_c :].astype(jnp.float32),
                          num_frames)
        )

        def _resolve() -> list:
            if rgb_wire is not None:
                rgb_np = _yuv420_wire_to_rgb(*rgb_wire)
            else:
                rgb_np = np.asarray(rgb)
                if rgb_mode == "u8":
                    rgb_np = rgb_np.astype(np.float32) / 255.0
            disp_np = np.asarray(disparity).astype(np.float32)
            if disp_u8:
                disp_np = np.square(disp_np / 255.0)
            raymap_np = np.asarray(raymap, dtype=np.float32)
            return [
                AetherPipelineOutput(
                    rgb=rgb_np[i].astype(np.float32, copy=False),
                    disparity=disp_np[i], raymap=raymap_np[i],
                )
                for i in range(orig_bsz)
            ]

        if defer_host:
            return DeferredOutput(_resolve)
        return _resolve()
