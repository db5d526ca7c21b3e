"""Scalar field transforms shared by the raymap / disparity codecs.

Semantics match reference ``aether/utils/postprocess_utils.py:13-46`` (signed log1p),
``:964-987`` (depth->disparity with sqrt companding) and ``:847-864`` (masked
least-squares scale). Implemented in jax.numpy so they run inside jitted pipelines on
TPU as well as on host numpy inputs.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
import numpy as np

Array = Union[jnp.ndarray, np.ndarray]


def signed_log1p(x: Array) -> jnp.ndarray:
    """sign(x) * log(1 + |x|): compresses large ray-origin translations."""
    x = jnp.asarray(x)
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def signed_log1p_inverse(x: Array) -> jnp.ndarray:
    """Inverse of :func:`signed_log1p`: sign(x) * (exp(|x|) - 1)."""
    x = jnp.asarray(x)
    return jnp.sign(x) * jnp.expm1(jnp.abs(x))


def depth_to_disparity(
    depth: Array, sqrt_disparity: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convert depth to the model's normalized (sqrt-)disparity.

    disparity = clip((1/depth) / dmax, 0, 1) with dmax the max disparity over valid
    (depth > 1e-6) pixels, then optionally sqrt. Returns (disparity, dmax).
    The matching decode applies ``square`` (see pipeline output path).
    """
    depth = jnp.asarray(depth, dtype=jnp.float32)
    disparity = 1.0 / depth
    valid = depth > 1e-6
    dmax = jnp.max(jnp.where(valid, disparity, -jnp.inf))
    disparity = jnp.clip(disparity / dmax, 0.0, 1.0)
    if sqrt_disparity:
        disparity = jnp.sqrt(disparity)
    return disparity, dmax


def disparity_to_depth(
    disparity: Array, min_disparity: float = 1e-3, max_depth: float = 1e8
) -> jnp.ndarray:
    """depth = clip(1 / clip(disparity, 1e-3, 1), 0, 1e8).

    Mirrors reference ``postprocess_utils.py:301``.
    """
    disparity = jnp.asarray(disparity, dtype=jnp.float32)
    return jnp.clip(1.0 / jnp.clip(disparity, min_disparity, 1.0), 0.0, max_depth)


def compute_scale(prediction: Array, target: Array, mask: Array) -> float:
    """Masked least-squares scalar s minimizing ||m * (s*p - t)||^2.

    s = sum(m*p*t) / sum(m*p*p), summed over the last two axes and then over the
    leading batch axis exactly like the reference (``postprocess_utils.py:847-864``
    reduces dims (1,2) and calls ``.item()`` on the result).
    """
    p = jnp.asarray(prediction, dtype=jnp.float32)
    t = jnp.asarray(target, dtype=jnp.float32)
    m = jnp.asarray(mask).astype(jnp.float32)
    numerator = jnp.sum(m * p * t, axis=(1, 2))
    denominator = jnp.sum(m * p * p, axis=(1, 2))
    scale = jnp.where(denominator != 0, numerator / jnp.maximum(denominator, 1e-30), 0.0)
    return float(scale.reshape(-1)[0]) if scale.size == 1 else scale
