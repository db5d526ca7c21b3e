"""Pallas GroupNorm moment kernel: per-channel (sum, sum-of-squares) of a
shifted 5-D activation, with f32 accumulators in VMEM.

Why a kernel at all: the decode-chunk GroupNorms reduce a [B, T, H, W, C]
bf16 activation to per-channel f32 moments. XLA refuses to input-fuse the
cast/subtract/square producers into those reduces at the 480p stage — the
conv output's tiled layout differs from the reduce's preferred layout, so it
materializes full-size f32 intermediates (observed: 3 x 1.6 GB HLO temps per
norm in the round-4 compile-OOM dump, with a relayout copy on top; a variadic
two-operand reduce materializes the same buffers). This kernel reads each
input tile ONCE in its native layout and keeps the f32 partial sums in a
[1, C] VMEM block revisited across the sequential grid — no HBM temps beyond
the [B, C] outputs.

The c0 shift (the group's first sample, bounding cancellation for large-mean
groups — see ``models/vae.py::group_norm``) is passed in as a tiny
per-channel [B, C] array computed by the caller.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _moments_kernel(x_ref, c0_ref, s1_ref, s2_ref):
    # x rides as [B*T, H, W, C] (4-D block, trailing (W, C) equal to the
    # array dims); c0/s1/s2 as [B, 1, C] so their (1, C) trailing block dims
    # satisfy Mosaic's block-shape rule (second-minor equal to the array dim).
    first = pl.program_id(1) == 0
    xf = x_ref[0].astype(jnp.float32)  # (bh, W, C)
    y = xf - c0_ref[0, 0][None, None, :]
    s1 = jnp.sum(y, axis=(0, 1))
    s2 = jnp.sum(y * y, axis=(0, 1))

    @pl.when(first)
    def _init():
        s1_ref[0, 0] = s1
        s2_ref[0, 0] = s2

    @pl.when(jnp.logical_not(first))
    def _accum():
        s1_ref[0, 0] += s1
        s2_ref[0, 0] += s2


def _pick_bh(h: int, w: int, c: int, cap_bytes: int = 4 << 20) -> int:
    """Largest power-of-two-ish divisor of h whose (bh, W, C) bf16 tile fits
    the VMEM cap; 0 when no divisor fits (caller falls back to XLA)."""
    bh = h
    while bh > 1 and bh * w * c * 2 > cap_bytes:
        if bh % 2:
            return 0
        bh //= 2
    return bh if bh * w * c * 2 <= cap_bytes else 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def groupnorm_moments(
    x: jnp.ndarray, c0: jnp.ndarray, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel moments of (x - c0) over (T, H, W).

    x: [B, T, H, W, C] (any float dtype); c0: [B, C] f32.
    Returns (m1, m2): two [B, C] f32 arrays, the per-channel mean of
    (x - c0) and of (x - c0)^2. Requires ``_pick_bh`` to find a dividing
    tile height — callers gate on :func:`moments_kernel_supported`.
    """
    b, t, h, w, c = x.shape
    bh = _pick_bh(h, w, c)
    if bh == 0:
        raise ValueError(f"no dividing tile height for {x.shape}")
    hb = h // bh
    grid = (b, t * hb)  # per-b iterations are SEQUENTIAL: accumulation-safe
    vec_spec = pl.BlockSpec((1, 1, c), lambda bb, i: (bb, 0, 0))
    s1, s2 = pl.pallas_call(
        _moments_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bh, w, c),
                         lambda bb, i: (bb * t + i // hb, i % hb, 0, 0)),
            vec_spec,
        ],
        out_specs=[vec_spec, vec_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        interpret=interpret,
    )(x.reshape(b * t, h, w, c), c0.astype(jnp.float32)[:, None, :])
    n = float(t * h * w)
    return s1[:, 0] / n, s2[:, 0] / n


def moments_kernel_supported(shape: Tuple[int, ...]) -> bool:
    """True when the Pallas moments kernel handles this activation shape
    efficiently: 5-D, lane-aligned channels, and a dividing tile height."""
    if len(shape) != 5:
        return False
    _, _, h, w, c = shape
    return c % 128 == 0 and _pick_bh(h, w, c) > 0
