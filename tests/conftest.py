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


# ---------------------------------------------------------------------------
# slow-test split (VERDICT r4 #8): the integration-heavy tests below each run
# >10 s on the 1-core CI host and together account for ~60% of suite wall
# time. `pytest -m "not slow"` is the fast default iteration profile (~6 min
# here); the full suite (including these) is the CI/pre-merge profile. The
# set lives HERE, not as per-file decorators, so the split stays auditable in
# one place; durations source: /tmp/suite_durations.log, 2026-08-20.
# ---------------------------------------------------------------------------
_SLOW_TESTS = {
    "test_fsdp.py::test_fsdp_checkpoint_restores_across_topologies",
    "test_fsdp.py::test_fsdp_train_matches_replicated",
    "test_decode_fallback.py::test_scanned_decode_bitmatches_chunked",
    "test_decode_fallback.py::test_stacked_decode_reraises_non_oom",
    "test_decode_fallback.py::test_scan_compile_failure_falls_back_to_host_loop",
    "test_decode_fallback.py::test_stacked_decode_falls_back_to_serial",
    "test_models.py::test_vae_chunked_shapes_match_full",
    "test_sharded_inference.py::test_batch_reconstruct_pads_short_chunk_to_dp",
    "test_models.py::test_stacked_batch_decode_equals_serial_decodes",
    "test_models.py::test_vae_encode_decode_shapes",
    "test_train.py::test_train_cli_on_real_latents",
    "test_sharded_inference.py::test_batch_reconstruct_matches_shapes_and_runs_on_mesh",
    "test_pipeline_parallel.py::test_pp_train_step_matches_unsharded",
    "test_fullwidth_parity.py::test_fullwidth_block_golden",
    "test_sharded_inference.py::test_sp_pipeline_runs",
    "test_sharded_inference.py::test_sharded_reconstruction_runs",
    "test_models.py::test_vae_posterior_sampling",
    "test_pipeline_parallel.py::test_pp_grads_match_default_scan",
    "test_cfg_skip.py::test_cfg_skip_prefix_matches_full_cfg",
    "test_sharded_inference.py::test_sharded_matches_unsharded",
    "test_pipeline_parallel.py::test_pp_trainer_matches_unsharded_trainer",
    "test_sharded_inference.py::test_tp_flash_attention_matches_unsharded",
    "test_attn_prologue.py::test_dit_forward_fused_matches_unfused",
    "test_train.py::test_trainer_resume_is_exact_continuation",
    "test_models.py::test_vae_single_frame",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        # nodeid like "tests/test_x.py::test_y[param]" -> "test_x.py::test_y"
        base = item.nodeid.split("/")[-1].split("[")[0]
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
