"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analogue of a fake distributed backend (SURVEY.md section 4):
multi-chip sharding is exercised with ``--xla_force_host_platform_device_count=8``
so tests never need real TPU hardware.

Platform pinning is tricky on this machine image: sitecustomize force-sets
JAX_PLATFORMS=axon, and typeguard's auto-loaded pytest plugin imports jax before
conftest runs, so env vars alone arrive too late. ``jax.config.update`` still works
as long as the backend itself has not been initialized.
"""

import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
# Exactness tests (sharded == unsharded, flash == xla at 1e-4-level atol)
# must not pick up the deployment default of approximate int8 attention
# (AETHER_ATTN_QK8 defaults ON since the full-config quality gate); the
# quantized paths have dedicated tests that pass qk_int8/pv_int8 explicitly,
# and test_models.py::test_attn_env_defaults pins the shipped default values.
os.environ.setdefault("AETHER_ATTN_QK8", "0")
os.environ.setdefault("AETHER_ATTN_PV8", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}"
    )
    assert len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(42)
