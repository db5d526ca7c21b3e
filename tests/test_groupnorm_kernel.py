"""Pallas GroupNorm moment kernel vs the XLA reduce (interpret mode on CPU).

The kernel (``ops/groupnorm.py``) exists for memory behavior, not math: it
must produce the same per-channel moments as the plain reduction it replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aether_tpu.ops.groupnorm import (
    _pick_bh,
    groupnorm_moments,
    moments_kernel_supported,
)


@pytest.mark.parametrize("shape", [
    (2, 3, 8, 24, 128),    # multi-tile grid (bh may be < h)
    (1, 2, 4, 90, 256),    # W=90 (non-8-multiple sublane dim), real channel
    (2, 1, 16, 12, 128),   # single frame
])
def test_moments_kernel_matches_xla(shape):
    rng = np.random.default_rng(hash(shape) % 2**31)
    x = jnp.asarray(rng.normal(3.0, 2.0, size=shape), jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(shape[0], shape[-1])), jnp.float32)

    m1k, m2k = groupnorm_moments(x, c0, interpret=True)

    y0 = x.astype(jnp.float32) - c0[:, None, None, None, :]
    m1x = jnp.mean(y0, axis=(1, 2, 3))
    m2x = jnp.mean(jnp.square(y0), axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(m1k), np.asarray(m1x),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m2k), np.asarray(m2x),
                               rtol=1e-6, atol=1e-4)


def test_moments_kernel_bf16_input():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0.0, 1.0, size=(1, 2, 8, 16, 128)),
                    jnp.bfloat16)
    c0 = jnp.zeros((1, 128), jnp.float32)
    m1k, m2k = groupnorm_moments(x, c0, interpret=True)
    xf = x.astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(m1k), np.asarray(jnp.mean(xf, axis=(1, 2, 3))),
        rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m2k), np.asarray(jnp.mean(jnp.square(xf), axis=(1, 2, 3))),
        rtol=1e-6, atol=1e-6)


def test_supported_gate():
    assert moments_kernel_supported((2, 9, 256, 720, 128))  # 480p stage 3
    assert moments_kernel_supported((2, 5, 32, 90, 512))    # latent stage 0
    assert not moments_kernel_supported((1, 2, 4, 6, 16))   # tiny config C
    assert not moments_kernel_supported((4, 6, 16))         # wrong rank
    # tile heights divide and fit the VMEM cap
    assert _pick_bh(256, 720, 128) in (16, 8)
    assert 256 % _pick_bh(256, 720, 128) == 0
