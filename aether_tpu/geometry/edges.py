"""Depth discontinuity (flying-pixel) detection via local min/max pooling.

Matches reference ``depth_edge`` (``postprocess_utils.py:406-461``, duplicated at
``evaluation/video_depth/tools.py:123-176``): a pixel is an edge when the local
(max - min) depth difference within a k x k window exceeds atol and/or
rtol * depth. Implemented with ``lax.reduce_window`` so it runs jitted on TPU.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.lax as lax
import jax.numpy as jnp
import numpy as np

Array = Union[jnp.ndarray, np.ndarray]


def _maxpool2d_same(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Max pool over the last two axes, stride 1, SAME-style symmetric padding."""
    pad = kernel_size // 2
    ndim = x.ndim
    window = (1,) * (ndim - 2) + (kernel_size, kernel_size)
    strides = (1,) * ndim
    padding = ((0, 0),) * (ndim - 2) + (((pad, pad),) * 2)
    return lax.reduce_window(x, -jnp.inf, lax.max, window, strides, padding)


def depth_edge(
    depth: Array,
    atol: Optional[float] = None,
    rtol: Optional[float] = None,
    kernel_size: int = 3,
    mask: Optional[Array] = None,
) -> jnp.ndarray:
    """Boolean edge mask of a (..., h, w) linear depth map."""
    was_numpy = isinstance(depth, np.ndarray)
    depth = jnp.asarray(depth, dtype=jnp.float32)
    shape = depth.shape
    d = depth.reshape((-1,) + shape[-2:])

    if mask is not None:
        m = jnp.asarray(mask).reshape((-1,) + shape[-2:])
        diff = _maxpool2d_same(jnp.where(m, d, -jnp.inf), kernel_size) + _maxpool2d_same(
            jnp.where(m, -d, -jnp.inf), kernel_size
        )
    else:
        diff = _maxpool2d_same(d, kernel_size) + _maxpool2d_same(-d, kernel_size)

    edge = jnp.zeros_like(d, dtype=bool)
    if atol is not None:
        edge = edge | (diff > atol)
    if rtol is not None:
        rel = diff / d
        rel = jnp.nan_to_num(rel, nan=0.0, posinf=jnp.inf, neginf=-jnp.inf)
        edge = edge | (rel > rtol)
    edge = edge.reshape(shape)
    return np.asarray(edge) if was_numpy else edge
