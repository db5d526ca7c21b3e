"""Causal 3D video VAE (AutoencoderKLCogVideoX equivalent) in functional JAX.

Mirrors the upstream VAE the reference loads (``scripts/demo.py:215-219``; knobs
read at ``aetherv1_pipeline_cogvideox.py:535-541,571,843,925``): 8x spatial / 4x
temporal compression, 16 latent channels, temporally-causal convolutions (front
padding replicates the first frame), first-frame-preserving temporal pooling /
upsampling, and a MoVQ-style spatially-modulated GroupNorm (zq conditioning) in the
decoder.

TPU-native design:
- the encode/decode trunks run **T-major 4-D**: activations live as
  ``(T*B, H, W, C)`` (frame-major rows) end-to-end, so every spatial conv is a
  plain NHWC conv2d with NO reshape and every temporal op (causal front pad,
  conv-cache slice, temporal tap, first-frame-preserving repeat / pair-average)
  is a contiguous axis-0 block op. The earlier 5-D ``[B, T, H, W, C]`` trunk
  round-tripped 5-D (concat/GN) <-> 4-D (conv2d) around every conv and XLA
  assigned incompatible layouts to the two views — the round-4 decode profile
  measured ~50% of decode device time in the resulting relayout copies
  (45-93 ms per [16,256,720,128] transpose);
- GroupNorm statistics in f32 over (T, H, W, C/g), matching torch GroupNorm on
  a 5D clip, reduced per frame-block so no full-size f32 temp materializes;
- 1x1x1 convolutions (shortcuts, zq modulators) are expressed as matmuls;
- pure functions throughout — encode/decode jit and shard with the pipeline;
- the public API keeps the channels-last 5-D ``[B, T, H, W, C]`` contract
  (conversion at the trunk boundary is one cheap transpose per chunk).

Parameter tree mirrors the checkpoint topology so a safetensors converter is a
transpose-only mapping.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from aether_tpu.config import VAEConfig

Params = Dict[str, Any]


def _fold_keys(key):
    """Device-side key stream: fold_in per draw.

    ``iter(jax.random.split(key, n))`` forces one device->host sync PER KEY
    (array iteration calls __index__); on a tunneled TPU that is ~36 ms and a
    flaky-transfer exposure each. fold_in stays on device entirely.
    """
    i = 0
    while True:
        yield jax.random.fold_in(key, i)
        i += 1


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _conv2d_lower_enabled() -> bool:
    """Lower 5-D conv3ds as per-temporal-tap NHWC conv2ds (T folded into
    batch) instead of one NDHWC conv3d; AETHER_CONV2D_LOWER=0 restores the
    conv3d form. Affects only the LEGACY 5-D helpers (``causal_conv3d`` /
    ``ConvCache.conv``) — the production trunks are T-major 4-D native and
    always conv2d. History: XLA's TPU conv3d lowering blocks W into 8x91
    tiles with 720->728 pads and transposed {4,1,3,0,2} relayout copies
    around every conv (round-4 decode profile: ~50% of device time in
    copies); the 2D form measured 7.91 -> 7.55 s on the stacked decode.
    Exact to conv3d within bf16 accumulation-order noise."""
    from aether_tpu.utils.env import env_flag

    return env_flag("AETHER_CONV2D_LOWER", True)


def _conv3d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    stride: Tuple[int, int, int] = (1, 1, 1),
    padding=((0, 0), (0, 0), (0, 0)),
) -> jnp.ndarray:
    # output stays in the compute dtype (bf16 on TPU, like the reference's torch
    # bf16 VAE); the MXU still accumulates partial sums in f32 internally, and
    # keeping activations narrow is what lets 480p chunks fit beside 11 GB of
    # resident DiT weights
    kt = w.shape[0]
    if (_conv2d_lower_enabled() and padding[0] == (0, 0) and stride[0] == 1):
        bsz, tp, h, ww, c = x.shape
        t_out = tp - (kt - 1)
        ph, pw = padding[1], padding[2]
        sh, sw = stride[1], stride[2]
        out = None
        for k in range(kt):
            xt = jax.lax.slice_in_dim(x, k, k + t_out, axis=1)
            o = jax.lax.conv_general_dilated(
                xt.reshape(bsz * t_out, h, ww, c),
                w[k].astype(x.dtype),
                window_strides=(sh, sw),
                padding=(ph, pw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = o if out is None else out + o
        out = out.reshape(bsz, t_out, *out.shape[1:])
    else:
        out = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=stride,
            padding=padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def causal_conv3d(
    x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray],
    stride: Tuple[int, int, int] = (1, 1, 1),
) -> jnp.ndarray:
    """Conv3d with replicate-first-frame temporal padding + zero spatial padding."""
    kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    if kt > 1:
        front = jnp.repeat(x[:, :1], kt - 1, axis=1)
        x = jnp.concatenate([front, x], axis=1)
    pad_h, pad_w = kh // 2, kw // 2
    return _conv3d(
        x, w, b, stride, padding=((0, 0), (pad_h, pad_h), (pad_w, pad_w))
    )


def _pointwise(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray]) -> jnp.ndarray:
    """1x1x1 conv as a matmul; w: (1,1,1,in,out) or (in,out)."""
    w2 = w.reshape(w.shape[-2], w.shape[-1])
    out = jnp.dot(x, w2.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def _gn_pallas_enabled(shape) -> bool:
    """Opt-in (AETHER_GN_PALLAS=1) Pallas moments kernel: TPU backend and a
    supported shape. Default OFF — the round-4 on-chip A/B measured the
    kernel 2.5x slower per decode chunk than the frame-split XLA reduce
    (pallas_call blocks producer fusion and relayouts every norm input);
    the compile-OOM it was built to fix is solved by the frame split."""
    from aether_tpu.utils.env import env_flag

    if not env_flag("AETHER_GN_PALLAS", False):
        return False
    from aether_tpu.ops.groupnorm import moments_kernel_supported

    if not moments_kernel_supported(shape):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def group_norm(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, groups: int, eps: float
) -> jnp.ndarray:
    """GroupNorm over (T, H, W, C/g) per (batch, group) — torch 5D semantics.

    Layout-native formulation: moments are reduced PER CHANNEL over (T, H, W)
    in the tensor's own [B, T, H, W, C] layout (C stays in lanes; the bf16
    cast and the c0 subtract fuse into the reduction), then combined per
    group on tiny [B, C] arrays. The earlier 6-D grouped-reshape form forced
    a transposed layout on every f32 intermediate, which blocked fusion and
    materialized three full-size f32 temps per norm — 3 x 3.16 GB at the
    480p decode chunk, the direct cause of a compile-time HBM OOM (round-4
    dump: ``broadcast...remat`` temps at vae.py:119-123). Here the apply is
    a single fused elementwise pass, subtract-first ((x - shift) * gain +
    bias) so large-mean groups keep full precision.

    Single-pass moments (E[y^2] - E[y]^2 with y = x - c0): both reductions
    stream straight from the bf16 input, and the shift c0 (the group's first
    sample, no reduction dependency) bounds the cancellation for large-mean
    small-variance groups: E[y] is O(spread) rather than O(mean), so the
    m2 - m1^2 subtraction stays well-conditioned.
    """
    btype = x.dtype
    b, t, h, w, c = x.shape
    cg = c // groups

    def per_group(v):  # [B, C] -> group-uniform [B, 1, 1, 1, C]
        g = jnp.mean(v.reshape(b, groups, cg), axis=-1)
        return jnp.repeat(g, cg, axis=-1)[:, None, None, None, :]

    # c0: the group's first channel at voxel (0, 0, 0), broadcast per channel
    first = x[:, 0, 0, 0, :].astype(jnp.float32)  # [B, C]
    c0 = jnp.repeat(first.reshape(b, groups, cg)[:, :, 0], cg, axis=-1)
    c0 = c0[:, None, None, None, :]

    # Moments: XLA refuses to input-fuse the cast/sub/square producers into
    # whole-tensor per-channel reduces at the 480p decode stages (the conv
    # output's tiled layout differs from the reduce's preferred one) and
    # materializes full-size f32 temps — 3 x 1.6 GB per norm in the round-4
    # compile-OOM dump. Splitting the reduce PER FRAME caps each materialized
    # f32 temp at [B, H, W, C] (~190 MB at the worst decode stage) while the
    # partial sums accumulate on tiny [B, C] arrays; the unrolled T-loop adds
    # no measurable time (the temps were already being written in the fused
    # whole-tensor form — this only shortens their lifetime). The Pallas
    # moments kernel (ops/groupnorm.py) is retained as an opt-in
    # (AETHER_GN_PALLAS=1) but measured 2.5x SLOWER end-to-end than the XLA
    # reduce on the strip decode path (0.989 s vs 0.399 s per warm chunk,
    # round-4 on-chip A/B) — its pallas_call blocks producer fusion and
    # forces relayout copies of every norm input.
    if _gn_pallas_enabled(x.shape):
        from aether_tpu.ops.groupnorm import groupnorm_moments

        m1c, m2c = groupnorm_moments(x, c0[:, 0, 0, 0, :])
    else:
        c0f = c0[:, 0]  # [B, 1, 1, C]
        s1 = jnp.zeros((b, c), jnp.float32)
        s2 = jnp.zeros((b, c), jnp.float32)
        for ti in range(t):
            yt = x[:, ti].astype(jnp.float32) - c0f
            s1 = s1 + jnp.sum(yt, axis=(1, 2))
            s2 = s2 + jnp.sum(jnp.square(yt), axis=(1, 2))
        n = float(t * h * w)
        m1c = s1 / n
        m2c = s2 / n
    m1 = per_group(m1c)
    m2 = per_group(m2c)
    var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    gain = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    y = (x.astype(jnp.float32) - (c0 + m1)) * gain + bias.astype(jnp.float32)
    return y.astype(btype)


def _nearest_resize(z: jnp.ndarray, shape: Tuple[int, int, int]) -> jnp.ndarray:
    """torch-style nearest resize of [B, T, H, W, C] to (t, h, w): idx = floor(i*in/out).

    Integer upscale factors (every case in this VAE: 2x spatial upsampling and
    the zq broadcasts at 1/2/4/8x) take the gather-free ``jnp.repeat`` path —
    TPU gathers are an order of magnitude slower than the broadcast+reshape
    that a uniform repeat lowers to.
    """
    for axis, out_n in zip((1, 2, 3), shape):
        in_n = z.shape[axis]
        if in_n == out_n:
            continue
        if out_n % in_n == 0:  # exact upscale: floor(i*in/out) == i // k
            z = jnp.repeat(z, out_n // in_n, axis=axis)
        else:
            idx = (jnp.arange(out_n) * in_n // out_n).astype(jnp.int32)
            z = jnp.take(z, idx, axis=axis)
    return z


def _nearest_resize_temporal_aware(zq: jnp.ndarray, t: int, h: int, w: int) -> jnp.ndarray:
    """Nearest-resize zq to (t, h, w) with the first-frame split used upstream."""
    if zq.shape[1] > 1 and t % 2 == 1 and t > 1:
        z_first = _nearest_resize(zq[:, :1], (1, h, w))
        z_rest = _nearest_resize(zq[:, 1:], (t - 1, h, w))
        return jnp.concatenate([z_first, z_rest], axis=1)
    return _nearest_resize(zq, (t, h, w))


def spatial_norm3d(
    f: jnp.ndarray, zq: jnp.ndarray, p: Params, groups: int, eps: float
) -> jnp.ndarray:
    """MoVQ spatial norm: GroupNorm(f) * conv_y(zq) + conv_b(zq).

    The 1x1x1 modulator convs run at LATENT resolution and their outputs are
    nearest-resized, not the other way around: pointwise channel matmuls
    commute bit-exactly with nearest resize (each output voxel contracts the
    same zq voxel with the same kernel), and at the decoder's last stage the
    swap replaces two [B,T,480,720,16]x[16,C] MXU matmuls (plus their ~GB
    activation writes) with two tiny latent-grid matmuls and a broadcast that
    fuses into the modulate multiply."""
    _, t, h, w, _ = f.shape
    y = _pointwise(zq, p["conv_y_w"], p["conv_y_b"])
    b = _pointwise(zq, p["conv_b_w"], p["conv_b_b"])
    y = _nearest_resize_temporal_aware(y, t, h, w)
    b = _nearest_resize_temporal_aware(b, t, h, w)
    norm_f = group_norm(f, p["norm_scale"], p["norm_bias"], groups, eps)
    return norm_f * y + b


# ---------------------------------------------------------------------------
# T-major 4-D trunk primitives
#
# Representation: activations are ``(T*B, H, W, C)`` with frame-major rows
# (row t*B + b holds frame t of batch element b) plus a static frame count
# ``t`` threaded alongside. Frame k..k+n of every batch element is then the
# contiguous row block [k*B : (k+n)*B] — temporal taps, causal front pads,
# conv-cache slices, nearest-repeat upsampling and pair-average downsampling
# are all axis-0 block ops in the SAME layout the conv2ds use, so XLA never
# inserts a relayout copy between a temporal op and a convolution.
# ---------------------------------------------------------------------------


def _to_tmajor(x5: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    """[B, T, H, W, C] -> ((T*B, H, W, C), t). Free when B == 1."""
    b, t = x5.shape[0], x5.shape[1]
    x4 = jnp.transpose(x5, (1, 0, 2, 3, 4)).reshape(t * b, *x5.shape[2:])
    return x4, t


def _from_tmajor(x4: jnp.ndarray, t: int) -> jnp.ndarray:
    """((T*B, H, W, C), t) -> [B, T, H, W, C]. Free when B == 1."""
    b = x4.shape[0] // t
    return jnp.transpose(x4.reshape(t, b, *x4.shape[1:]), (1, 0, 2, 3, 4))


def _conv_tm(
    x4: jnp.ndarray,
    t: int,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    stride_hw: Tuple[int, int] = (1, 1),
    pad_hw=((0, 0), (0, 0)),
) -> jnp.ndarray:
    """Conv over a temporally-padded T-major stack. ``x4`` carries ``t``
    frames; output carries ``t - (kt - 1)``.

    The kt temporal taps are folded into CHANNELS: the tap views (contiguous
    axis-0 row blocks) are concatenated channel-minor — the slices fuse into
    the concat, one materialized write — and contracted by ONE NHWC conv2d
    with the ``(kh, kw, kt*Ci, Co)`` tap-stacked kernel. A per-tap conv2d
    loop would materialize each tap slice separately (XLA cannot fuse a
    slice producer into a convolution operand): 3 near-full-activation
    copies + 2 bf16 add passes per conv. The folded form also contracts
    kt*Ci lanes per MXU pass and accumulates ALL taps in the conv's f32
    accumulator — closer to conv3d numerics than bf16 tap sums."""
    kt = w.shape[0]
    bsz = x4.shape[0] // t
    t_out = t - (kt - 1)
    if kt == 1:
        xcat, wcat = x4, w[0]
    else:
        xcat = jnp.concatenate(
            [jax.lax.slice_in_dim(x4, k * bsz, (k + t_out) * bsz, axis=0)
             for k in range(kt)],
            axis=-1,
        )
        wcat = jnp.concatenate([w[k] for k in range(kt)], axis=2)
    out = jax.lax.conv_general_dilated(
        xcat,
        wcat.astype(x4.dtype),
        window_strides=stride_hw,
        padding=pad_hw,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b.astype(x4.dtype)
    return out


def _tile_t(v: jnp.ndarray, t: int) -> jnp.ndarray:
    """Per-batch [B, C] -> T-major broadcastable [T*B, 1, 1, C] (lowers to a
    broadcast+reshape that fuses into the consuming elementwise op)."""
    return jnp.tile(v, (t, 1))[:, None, None, :]


def group_norm_tm(
    x4: jnp.ndarray, t: int, scale: jnp.ndarray, bias: jnp.ndarray,
    groups: int, eps: float,
) -> jnp.ndarray:
    """T-major GroupNorm: torch 5-D semantics (moments over (T, H, W, C/g)
    per batch element), computed per frame-block so no full-size f32 temp
    materializes (see :func:`group_norm` for the numerics rationale — same
    shifted single-pass moments, same subtract-first apply)."""
    btype = x4.dtype
    tb, h, w, c = x4.shape
    bsz = tb // t
    cg = c // groups

    first = x4[:bsz, 0, 0, :].astype(jnp.float32)  # [B, C] (frame 0 block)
    c0 = jnp.repeat(first.reshape(bsz, groups, cg)[:, :, 0], cg, axis=-1)
    c0r = c0[:, None, None, :]  # [B, 1, 1, C]

    s1 = jnp.zeros((bsz, c), jnp.float32)
    s2 = jnp.zeros((bsz, c), jnp.float32)
    for ti in range(t):
        yt = x4[ti * bsz:(ti + 1) * bsz].astype(jnp.float32) - c0r
        s1 = s1 + jnp.sum(yt, axis=(1, 2))
        s2 = s2 + jnp.sum(jnp.square(yt), axis=(1, 2))
    n = float(t * h * w)

    def per_group(v):  # [B, C] -> group-uniform [B, C]
        g = jnp.mean(v.reshape(bsz, groups, cg), axis=-1)
        return jnp.repeat(g, cg, axis=-1)

    m1 = per_group(s1 / n)
    m2 = per_group(s2 / n)
    var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    gain = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)[None, :]
    shift = c0 + m1
    y = (x4.astype(jnp.float32) - _tile_t(shift, t)) * _tile_t(gain, t)
    y = y + bias.astype(jnp.float32)
    return y.astype(btype)


def _nearest_resize_tm(
    z4: jnp.ndarray, t_in: int, shape: Tuple[int, int, int]
) -> Tuple[jnp.ndarray, int]:
    """T-major nearest resize to (t, h, w): idx = floor(i*in/out); exact
    upscales take the gather-free repeat path (see :func:`_nearest_resize`)."""
    t_out, h_out, w_out = shape
    bsz = z4.shape[0] // t_in
    if t_in != t_out:
        v = z4.reshape(t_in, bsz, *z4.shape[1:])
        if t_out % t_in == 0:
            v = jnp.repeat(v, t_out // t_in, axis=0)
        else:
            idx = (jnp.arange(t_out) * t_in // t_out).astype(jnp.int32)
            v = jnp.take(v, idx, axis=0)
        z4 = v.reshape(t_out * bsz, *z4.shape[1:])
    for axis, out_n in ((1, h_out), (2, w_out)):
        in_n = z4.shape[axis]
        if in_n == out_n:
            continue
        if out_n % in_n == 0:
            z4 = jnp.repeat(z4, out_n // in_n, axis=axis)
        else:
            idx = (jnp.arange(out_n) * in_n // out_n).astype(jnp.int32)
            z4 = jnp.take(z4, idx, axis=axis)
    return z4, t_out


def _resize_zq_tm(
    zq4: jnp.ndarray, t_zq: int, t: int, h: int, w: int
) -> jnp.ndarray:
    """zq nearest-resize with the upstream first-frame temporal split."""
    if t_zq > 1 and t % 2 == 1 and t > 1:
        bsz = zq4.shape[0] // t_zq
        z_first, _ = _nearest_resize_tm(zq4[:bsz], 1, (1, h, w))
        z_rest, _ = _nearest_resize_tm(zq4[bsz:], t_zq - 1, (t - 1, h, w))
        return jnp.concatenate([z_first, z_rest], axis=0)
    out, _ = _nearest_resize_tm(zq4, t_zq, (t, h, w))
    return out


def spatial_norm_tm(
    f4: jnp.ndarray, t: int, zq4: jnp.ndarray, t_zq: int, p: Params,
    groups: int, eps: float,
) -> jnp.ndarray:
    """T-major MoVQ spatial norm (see :func:`spatial_norm3d`): modulator
    matmuls at latent resolution, nearest-resized after (bit-exact commute)."""
    h, w = f4.shape[1], f4.shape[2]
    y = _pointwise(zq4, p["conv_y_w"], p["conv_y_b"])
    b = _pointwise(zq4, p["conv_b_w"], p["conv_b_b"])
    y = _resize_zq_tm(y, t_zq, t, h, w)
    b = _resize_zq_tm(b, t_zq, t, h, w)
    norm_f = group_norm_tm(f4, t, p["norm_scale"], p["norm_bias"], groups, eps)
    return norm_f * y + b


def _downsample_tm(
    x4: jnp.ndarray, t: int, p: Params, compress_time: bool
) -> Tuple[jnp.ndarray, int]:
    """T-major temporal pair-average (first frame kept when odd) + spatial
    stride-2 conv with the asymmetric (0, 1) pad (see :func:`_downsample3d`)."""
    bsz = x4.shape[0] // t
    if compress_time and t > 1:
        v = x4.reshape(t, bsz, *x4.shape[1:])
        if t % 2 == 1:
            rest = (v[1::2] + v[2::2]) * 0.5
            v = jnp.concatenate([v[:1], rest], axis=0)
        else:
            v = (v[0::2] + v[1::2]) * 0.5
        t = v.shape[0]
        x4 = v.reshape(t * bsz, *x4.shape[1:])
    w = p["conv_w"]  # (1, 3, 3, in, out), leading time dim of 1
    out = _conv_tm(x4, t, w, p["conv_b"], stride_hw=(2, 2),
                   pad_hw=((0, 1), (0, 1)))
    return out, t


def _upsample_tm(
    x4: jnp.ndarray, t: int, p: Params, compress_time: bool
) -> Tuple[jnp.ndarray, int]:
    """T-major nearest 2x upsample (first-frame-preserving temporally) + k3
    conv, computed as the folded parity conv2d + depth-to-space
    (see :func:`_upsample3d` / :func:`_fold_upsample_kernel`)."""
    tb, h, w, c = x4.shape
    bsz = tb // t

    if compress_time and t > 1:
        v = x4.reshape(t, bsz, h, w, c)
        if t % 2 == 1:
            v = jnp.concatenate([v[:1], jnp.repeat(v[1:], 2, axis=0)], axis=0)
        else:
            v = jnp.repeat(v, 2, axis=0)
        t = v.shape[0]
        x4 = v.reshape(t * bsz, h, w, c)

    kw = p["conv_w"]
    if kw.shape[:3] != (1, 3, 3):  # generic fallback (not hit by this VAE)
        x4, t = _nearest_resize_tm(x4, t, (t, 2 * h, 2 * w))
        return _conv_tm(x4, t, kw, p["conv_b"], pad_hw=((1, 1), (1, 1))), t

    cout = kw.shape[-1]
    w4 = _fold_upsample_kernel(kw)  # (3, 3, Cin, 4*Cout)
    o4 = jax.lax.conv_general_dilated(
        x4,
        w4.astype(x4.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (T*B, h, w, 4*Cout), parity blocks (a, b) on channels
    tb2 = o4.shape[0]
    o4 = o4.reshape(tb2, h, w, 2, 2, cout)
    out = jnp.transpose(o4, (0, 1, 3, 2, 4, 5)).reshape(
        tb2, 2 * h, 2 * w, cout)
    if p["conv_b"] is not None:
        out = out + p["conv_b"].astype(x4.dtype)
    return out, t


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


class ConvCache:
    """Threads per-conv temporal context across frame chunks.

    Mirrors diffusers' ``conv_cache`` mechanism: each causal conv keeps its last
    (kt - 1) input frames so chunked encode/decode is *exactly* equivalent to
    full-clip processing for every convolution (normalization statistics remain
    per-chunk, as in the reference's framewise mode).
    """

    def __init__(self, cache_in: Optional[Dict[str, jnp.ndarray]] = None):
        self.cache_in = cache_in or {}
        self.cache_out: Dict[str, jnp.ndarray] = {}

    def conv(self, x, w, b, name: str, stride=(1, 1, 1)):
        kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
        cache_slice = None
        if kt > 1:
            prev = self.cache_in.get(name)
            if prev is None:
                front = jnp.repeat(x[:, :1], kt - 1, axis=1)
            else:
                front = prev.astype(x.dtype)
            x = jnp.concatenate([front, x], axis=1)
            cache_slice = x[:, -(kt - 1):]
        pad_h, pad_w = kh // 2, kw // 2
        out = _conv3d(x, w, b, stride, ((0, 0), (pad_h, pad_h), (pad_w, pad_w)))
        if cache_slice is not None:
            # Tie the tiny cache slice's schedule to the conv output: the
            # slices are otherwise only needed as function OUTPUTS, so XLA's
            # scheduler defers them to the end of the chunk program — which
            # keeps every conv's padded input alive simultaneously (~20
            # concurrent multi-hundred-MB activations in the round-4 batch-2
            # OOM dump). The barrier forces each slice to materialize before
            # anything consumes its conv's output, letting the big parent
            # buffer free as the decoder walks forward.
            out, cache_slice = jax.lax.optimization_barrier((out, cache_slice))
            self.cache_out[name] = cache_slice
        return out

    def conv_tm(self, x4, t: int, w, b, name: str):
        """T-major cached causal conv: the causal front pad (replicate frame 0
        or the previous chunk's cache) and the cache slice are contiguous
        axis-0 block ops; cache entries are stored T-major
        ``((kt-1)*B, H, W, C)``. Same schedule barrier as :meth:`conv`."""
        kt, kh, kw_ = w.shape[0], w.shape[1], w.shape[2]
        bsz = x4.shape[0] // t
        cache_slice = None
        t_in = t
        if kt > 1:
            prev = self.cache_in.get(name)
            if prev is None:
                front = jnp.tile(x4[:bsz], (kt - 1, 1, 1, 1))
            else:
                front = prev.astype(x4.dtype)
            x4 = jnp.concatenate([front, x4], axis=0)
            t_in = t + kt - 1
            cache_slice = x4[-(kt - 1) * bsz:]
        out = _conv_tm(x4, t_in, w, b,
                       pad_hw=((kh // 2, kh // 2), (kw_ // 2, kw_ // 2)))
        if cache_slice is not None:
            out, cache_slice = jax.lax.optimization_barrier((out, cache_slice))
            self.cache_out[name] = cache_slice
        return out


def _resnet_tm(
    x4: jnp.ndarray,
    t: int,
    p: Params,
    cfg: VAEConfig,
    zq4: Optional[jnp.ndarray] = None,
    t_zq: int = 1,
    cache: Optional[ConvCache] = None,
    path: str = "",
) -> jnp.ndarray:
    """T-major CogVideoX 3D resnet block (see :func:`_resnet3d`)."""
    groups, eps = cfg.norm_num_groups, cfg.norm_eps
    cache = cache if cache is not None else ConvCache()

    def norm(h, np_):
        if zq4 is None:
            return group_norm_tm(h, t, np_["norm_scale"], np_["norm_bias"],
                                 groups, eps)
        return spatial_norm_tm(h, t, zq4, t_zq, np_, groups, eps)

    h = norm(x4, p["norm1"])
    h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
    h = cache.conv_tm(h, t, p["conv1_w"], p["conv1_b"], path + "/conv1")
    h = norm(h, p["norm2"])
    h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
    h = cache.conv_tm(h, t, p["conv2_w"], p["conv2_b"], path + "/conv2")

    if "shortcut_w" in p:
        x4 = _pointwise(x4, p["shortcut_w"], p["shortcut_b"])
    return x4 + h


def _resnet3d(
    x: jnp.ndarray,
    p: Params,
    cfg: VAEConfig,
    zq: Optional[jnp.ndarray] = None,
    cache: Optional[ConvCache] = None,
    path: str = "",
) -> jnp.ndarray:
    """CogVideoX 3D resnet block; decoder blocks modulate norms with zq."""
    groups, eps = cfg.norm_num_groups, cfg.norm_eps
    cache = cache if cache is not None else ConvCache()

    def norm(h, np_):
        if zq is None:
            return group_norm(h, np_["norm_scale"], np_["norm_bias"], groups, eps)
        return spatial_norm3d(h, zq, np_, groups, eps)

    h = norm(x, p["norm1"])
    h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
    h = cache.conv(h, p["conv1_w"], p["conv1_b"], path + "/conv1")
    h = norm(h, p["norm2"])
    h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
    h = cache.conv(h, p["conv2_w"], p["conv2_b"], path + "/conv2")

    if "shortcut_w" in p:
        x = _pointwise(x, p["shortcut_w"], p["shortcut_b"])
    return x + h


def _downsample3d(x: jnp.ndarray, p: Params, compress_time: bool) -> jnp.ndarray:
    """Temporal pair-average (first frame kept when odd) + spatial s2 conv."""
    if compress_time:
        t = x.shape[1]
        if t % 2 == 1 and t > 1:
            x_first, x_rest = x[:, :1], x[:, 1:]
            x_rest = (x_rest[:, 0::2] + x_rest[:, 1::2]) * 0.5
            x = jnp.concatenate([x_first, x_rest], axis=1)
        elif t > 1:
            x = (x[:, 0::2] + x[:, 1::2]) * 0.5
    # spatial: asymmetric (0,1) pad then k3 s2 conv, applied per frame
    w = p["conv_w"]  # (1, 3, 3, in, out) stored with a leading time dim of 1
    return _conv3d(
        x, w, p["conv_b"], stride=(1, 2, 2), padding=((0, 0), (0, 1), (0, 1))
    )


def _fold_upsample_kernel(k3: jnp.ndarray) -> jnp.ndarray:
    """Fold a 3x3 kernel into four parity kernels embedded in one 3x3 conv.

    nearest-2x-upsample + conv3x3(pad 1) computes, for output parity (a, b):
      out[2i+a, 2j+b] = sum_{u,v} K[u,v] * x[i + rmap_a(u), j + rmap_b(v)]
    with rmap_0 = (-1, 0, 0) and rmap_1 = (0, 0, 1) (floor((a+u-1)/2)). Each
    parity therefore sees a 2x2 effective kernel over LOW-RES pixels. The
    four 2x2 parity kernels are embedded at their parity's offset inside one
    (3, 3, Cin, 4*Cout) kernel, so the whole upsample is ONE plain NHWC
    conv2d at low resolution + a depth-to-space interleave:

      rows, a=0: [K0, K1+K2, 0]   (taps low-res rows i-1, i)
      rows, a=1: [0, K0+K1, K2]   (taps low-res rows i,   i+1)

    and the same fold on columns with b. Earlier rounds expressed this as an
    input-dilated conv with a folded 4x4 kernel so XLA's conv rewriter would
    split it into parity convs; the round-4 decode profile showed that
    lowering is a pad/relayout storm (W 720->728 pads, 6-D transposed copies,
    per-parity slice fusions — the largest single contributor to the 55% of
    decode device time spent in copies). A plain conv2d keeps the layout the
    other decoder convs use; the embedded zeros cost 9/4x the parity-conv
    FLOPs but upsample convs are ~4% of stage FLOPs and the MXU was idle.

    k3: (1, 3, 3, Cin, Cout) -> (3, 3, Cin, 4*Cout), parity blocks ordered
    (a, b) = (0,0), (0,1), (1,0), (1,1) for the depth-to-space reshape.
    """
    k = k3[0]  # (3, 3, Cin, Cout)
    z = jnp.zeros_like(k[0])
    rows = {
        0: jnp.stack([k[0], k[1] + k[2], z]),          # (3, 3, Ci, Co)
        1: jnp.stack([z, k[0] + k[1], k[2]]),
    }
    def cols(r, b_):
        zc = jnp.zeros_like(r[:, 0])
        if b_ == 0:
            return jnp.stack([r[:, 0], r[:, 1] + r[:, 2], zc], axis=1)
        return jnp.stack([zc, r[:, 0] + r[:, 1], r[:, 2]], axis=1)
    parts = [cols(rows[a], b_) for a in (0, 1) for b_ in (0, 1)]
    return jnp.concatenate(parts, axis=-1)  # (3, 3, Cin, 4*Cout)


def _upsample3d(x: jnp.ndarray, p: Params, compress_time: bool) -> jnp.ndarray:
    """Nearest 2x upsample (first-frame-preserving temporally) + k3 conv.

    The spatial 2x + per-frame 3x3 conv is computed as a low-res 2x2 conv to
    4 parity channel groups + depth-to-space (exactly equivalent, see
    ``_fold_upsample_kernel``); the temporal repeat happens first, at low
    resolution. Mirrors diffusers CogVideoXUpsample3D semantics
    (nearest-exact 2x + Conv2d(k3, p1), first frame un-repeated temporally).
    """
    b, t, h, w, c = x.shape

    if compress_time and t > 1:
        if t % 2 == 1:
            x = jnp.concatenate([x[:, :1], jnp.repeat(x[:, 1:], 2, axis=1)],
                                axis=1)
        else:
            x = jnp.repeat(x, 2, axis=1)
        t = x.shape[1]

    kw = p["conv_w"]
    if kw.shape[:3] != (1, 3, 3):  # generic fallback (not hit by this VAE)
        x = _nearest_resize(x, (t, 2 * h, 2 * w))
        return _conv3d(x, kw, p["conv_b"], stride=(1, 1, 1),
                       padding=((0, 0), (1, 1), (1, 1)))

    cout = kw.shape[-1]
    w4 = _fold_upsample_kernel(kw)  # (3, 3, Cin, 4*Cout)
    o4 = jax.lax.conv_general_dilated(
        x.reshape(b * t, h, w, c),
        w4.astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B*T, h, w, 4*Cout), parity blocks (a, b) on channels
    # depth-to-space: out[2i+a, 2j+b, c] = o4[i, j, (2a+b)*Cout + c]
    o4 = o4.reshape(b * t, h, w, 2, 2, cout)
    out = jnp.transpose(o4, (0, 1, 3, 2, 4, 5)).reshape(
        b, t, 2 * h, 2 * w, cout)
    if p["conv_b"] is not None:
        out = out + p["conv_b"].astype(x.dtype)
    return out


# ---------------------------------------------------------------------------
# parameter init
# ---------------------------------------------------------------------------


def _conv_init(key, kt, kh, kw, cin, cout, dtype):
    fan_in = kt * kh * kw * cin
    scale = 1.0 / math.sqrt(fan_in)
    kw_, kb_ = jax.random.split(key)
    return (
        jax.random.uniform(kw_, (kt, kh, kw, cin, cout), dtype, -scale, scale),
        jax.random.uniform(kb_, (cout,), dtype, -scale, scale),
    )


def _resnet_init(key, cin, cout, cfg: VAEConfig, zq_ch: Optional[int], dtype):
    keys = _fold_keys(key)
    p: Params = {}

    def norm_init(k, ch):
        if zq_ch is None:
            return {"norm_scale": jnp.ones((ch,), dtype), "norm_bias": jnp.zeros((ch,), dtype)}
        y_w, y_b = _conv_init(k, 1, 1, 1, zq_ch, ch, dtype)
        k2 = jax.random.fold_in(k, 1)
        b_w, b_b = _conv_init(k2, 1, 1, 1, zq_ch, ch, dtype)
        return {
            "norm_scale": jnp.ones((ch,), dtype), "norm_bias": jnp.zeros((ch,), dtype),
            "conv_y_w": y_w, "conv_y_b": y_b, "conv_b_w": b_w, "conv_b_b": b_b,
        }

    p["norm1"] = norm_init(next(keys), cin)
    p["conv1_w"], p["conv1_b"] = _conv_init(next(keys), 3, 3, 3, cin, cout, dtype)
    p["norm2"] = norm_init(next(keys), cout)
    p["conv2_w"], p["conv2_b"] = _conv_init(next(keys), 3, 3, 3, cout, cout, dtype)
    if cin != cout:
        sw, sb = _conv_init(next(keys), 1, 1, 1, cin, cout, dtype)
        p["shortcut_w"], p["shortcut_b"] = sw, sb
    return p


def init_vae_params(key: jax.Array, cfg: VAEConfig, dtype=jnp.float32) -> Params:
    keys = _fold_keys(key)
    chs = cfg.block_out_channels
    lat = cfg.latent_channels
    tcl = cfg.temporal_compress_level

    # ---------------- encoder ----------------
    enc: Params = {}
    enc["conv_in_w"], enc["conv_in_b"] = _conv_init(
        next(keys), 3, 3, 3, cfg.in_channels, chs[0], dtype
    )
    down = []
    ch_in = chs[0]
    for i, ch_out in enumerate(chs):
        block: Params = {"resnets": []}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(
                _resnet_init(next(keys), ch_in if j == 0 else ch_out, ch_out, cfg, None, dtype)
            )
        if i < len(chs) - 1:
            cw, cb = _conv_init(next(keys), 1, 3, 3, ch_out, ch_out, dtype)
            block["downsampler"] = {"conv_w": cw, "conv_b": cb}
        down.append(block)
        ch_in = ch_out
    enc["down_blocks"] = down
    enc["mid"] = [
        _resnet_init(next(keys), chs[-1], chs[-1], cfg, None, dtype) for _ in range(2)
    ]
    enc["norm_out_scale"] = jnp.ones((chs[-1],), dtype)
    enc["norm_out_bias"] = jnp.zeros((chs[-1],), dtype)
    enc["conv_out_w"], enc["conv_out_b"] = _conv_init(
        next(keys), 3, 3, 3, chs[-1], 2 * lat, dtype
    )

    # ---------------- decoder ----------------
    dec: Params = {}
    rev = list(reversed(chs))
    dec["conv_in_w"], dec["conv_in_b"] = _conv_init(next(keys), 3, 3, 3, lat, rev[0], dtype)
    dec["mid"] = [
        _resnet_init(next(keys), rev[0], rev[0], cfg, lat, dtype) for _ in range(2)
    ]
    up = []
    ch_in = rev[0]
    for i, ch_out in enumerate(rev):
        block = {"resnets": []}
        for j in range(cfg.layers_per_block + 1):
            block["resnets"].append(
                _resnet_init(next(keys), ch_in if j == 0 else ch_out, ch_out, cfg, lat, dtype)
            )
        if i < len(rev) - 1:
            cw, cb = _conv_init(next(keys), 1, 3, 3, ch_out, ch_out, dtype)
            block["upsampler"] = {"conv_w": cw, "conv_b": cb}
        up.append(block)
        ch_in = ch_out
    dec["up_blocks"] = up
    ns_w, ns_b = _conv_init(next(keys), 1, 1, 1, lat, rev[-1], dtype)
    nb_w, nb_b = _conv_init(next(keys), 1, 1, 1, lat, rev[-1], dtype)
    dec["norm_out"] = {
        "norm_scale": jnp.ones((rev[-1],), dtype),
        "norm_bias": jnp.zeros((rev[-1],), dtype),
        "conv_y_w": ns_w, "conv_y_b": ns_b, "conv_b_w": nb_w, "conv_b_b": nb_b,
    }
    dec["conv_out_w"], dec["conv_out_b"] = _conv_init(
        next(keys), 3, 3, 3, rev[-1], cfg.out_channels, dtype
    )

    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# encode / decode
# ---------------------------------------------------------------------------


def encode_moments(
    params: Params,
    cfg: VAEConfig,
    video: jnp.ndarray,
    cache_in: Optional[Dict[str, jnp.ndarray]] = None,
    collect: Optional[list] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Encoder trunk: [B, T, H, W, 3] -> (mean, logvar, conv_cache_out).

    ``collect``: optional list; appends the activation after every down block
    and the mid stack — per-stage parity diffing against torch goldens."""
    enc = params["encoder"]
    tcl = cfg.temporal_compress_level
    cache = ConvCache(cache_in)
    x, t = _to_tmajor(video)
    x = cache.conv_tm(x, t, enc["conv_in_w"], enc["conv_in_b"], "enc/conv_in")

    for i, block in enumerate(enc["down_blocks"]):
        for j, rp in enumerate(block["resnets"]):
            x = _resnet_tm(x, t, rp, cfg, cache=cache,
                           path=f"enc/down{i}/res{j}")
        if "downsampler" in block:
            x, t = _downsample_tm(x, t, block["downsampler"],
                                  compress_time=i < tcl)
        if collect is not None:
            collect.append(_from_tmajor(x, t))

    for j, rp in enumerate(enc["mid"]):
        x = _resnet_tm(x, t, rp, cfg, cache=cache, path=f"enc/mid{j}")
    if collect is not None:
        collect.append(_from_tmajor(x, t))

    x = group_norm_tm(x, t, enc["norm_out_scale"], enc["norm_out_bias"],
                      cfg.norm_num_groups, cfg.norm_eps)
    x = jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)
    x = cache.conv_tm(x, t, enc["conv_out_w"], enc["conv_out_b"],
                      "enc/conv_out")

    mean, logvar = jnp.split(_from_tmajor(x, t), 2, axis=-1)
    return mean, logvar, cache.cache_out


def _sample_posterior(mean, logvar, key, sample_mode):
    if sample_mode == "argmax" or key is None:
        return mean
    logvar = jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    noise = jax.random.normal(key, mean.shape, dtype=jnp.float32)
    return (mean.astype(jnp.float32) + std * noise).astype(mean.dtype)


def vae_encode(
    params: Params,
    cfg: VAEConfig,
    video: jnp.ndarray,
    key: Optional[jax.Array] = None,
    sample_mode: str = "sample",
) -> jnp.ndarray:
    """Encode [B, T, H, W, 3] in [-1, 1] -> latents [B, T_lat, H/8, W/8, C_lat].

    ``sample_mode='sample'`` draws from the diagonal posterior (requires ``key``),
    ``'argmax'`` returns the mean — mirroring the reference's ``retrieve_latents``
    (``aetherv1_pipeline_cogvideox.py:233-245``).
    """
    mean, logvar, _ = encode_moments(params, cfg, video)
    return _sample_posterior(mean, logvar, key, sample_mode)


def vae_encode_chunked(
    params: Params,
    cfg: VAEConfig,
    video: jnp.ndarray,
    key: Optional[jax.Array] = None,
    sample_mode: str = "sample",
    frame_batch_size: int = 8,
) -> jnp.ndarray:
    """Memory-bounded encode: frame chunks threaded through conv caches.

    Exactly equivalent to full-clip processing for all convolutions; group-norm
    statistics are per-chunk, matching the reference's framewise/sliced mode
    (the reference enables VAE slicing+tiling at ``scripts/demo.py:229-230``).
    Chunk layout mirrors diffusers: first chunk absorbs the remainder.
    """
    t = video.shape[1]
    n_chunks = max(t // frame_batch_size, 1)
    remaining = t % frame_batch_size if t > frame_batch_size else 0
    means, logvars = [], []
    cache: Optional[Dict[str, jnp.ndarray]] = None
    start = 0
    for i in range(n_chunks):
        end = min(frame_batch_size + remaining if i == 0 else
                  start + frame_batch_size, t)
        mean, logvar, cache = encode_moments(params, cfg, video[:, start:end], cache)
        means.append(mean)
        logvars.append(logvar)
        start = end
    mean = jnp.concatenate(means, axis=1)
    logvar = jnp.concatenate(logvars, axis=1)
    return _sample_posterior(mean, logvar, key, sample_mode)


def decode_frames(
    params: Params,
    cfg: VAEConfig,
    latents: jnp.ndarray,
    cache_in: Optional[Dict[str, jnp.ndarray]] = None,
    collect: Optional[list] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Decoder trunk: [B, T_lat, h, w, C_lat] -> (video, conv_cache_out).

    ``collect``: optional list; appends the activation after the mid stack and
    every up block — per-stage parity diffing against torch goldens."""
    dec = params["decoder"]
    tcl = cfg.temporal_compress_level
    cache = ConvCache(cache_in)
    zq4, t_zq = _to_tmajor(latents)
    x, t = zq4, t_zq
    x = cache.conv_tm(x, t, dec["conv_in_w"], dec["conv_in_b"], "dec/conv_in")

    for j, rp in enumerate(dec["mid"]):
        x = _resnet_tm(x, t, rp, cfg, zq4=zq4, t_zq=t_zq, cache=cache,
                       path=f"dec/mid{j}")
    if collect is not None:
        collect.append(_from_tmajor(x, t))

    for i, block in enumerate(dec["up_blocks"]):
        for j, rp in enumerate(block["resnets"]):
            x = _resnet_tm(x, t, rp, cfg, zq4=zq4, t_zq=t_zq, cache=cache,
                           path=f"dec/up{i}/res{j}")
        if "upsampler" in block:
            x, t = _upsample_tm(x, t, block["upsampler"],
                                compress_time=i < tcl)
        if collect is not None:
            collect.append(_from_tmajor(x, t))

    x = spatial_norm_tm(x, t, zq4, t_zq, dec["norm_out"],
                        cfg.norm_num_groups, cfg.norm_eps)
    x = jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)
    x = cache.conv_tm(x, t, dec["conv_out_w"], dec["conv_out_b"],
                      "dec/conv_out")
    return _from_tmajor(x, t), cache.cache_out


def vae_decode(params: Params, cfg: VAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """Decode latents [B, T_lat, h, w, C_lat] -> video [B, T, H, W, 3] in [-1, 1]."""
    video, _ = decode_frames(params, cfg, latents)
    return video


def vae_decode_chunked(
    params: Params,
    cfg: VAEConfig,
    latents: jnp.ndarray,
    frame_batch_size: int = 2,
) -> jnp.ndarray:
    """Memory-bounded decode: latent-frame chunks threaded through conv caches.

    Mirrors diffusers' framewise decode (chunks of 2 latent frames, first chunk
    absorbs the remainder; zq modulation uses the chunk's own latents).
    """
    t = latents.shape[1]
    n_chunks = max(t // frame_batch_size, 1)
    remaining = t % frame_batch_size if t > frame_batch_size else 0
    outs = []
    cache: Optional[Dict[str, jnp.ndarray]] = None
    start = 0
    for i in range(n_chunks):
        end = min(frame_batch_size + remaining if i == 0 else
                  start + frame_batch_size, t)
        video, cache = decode_frames(params, cfg, latents[:, start:end], cache)
        outs.append(video)
        start = end
    return jnp.concatenate(outs, axis=1)
