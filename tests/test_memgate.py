"""Memory-gate (aether_tpu.runtime.memgate) unit + wiring tests.

The gate exists for runtimes where an allocation failure wedges the chip
permanently (BASELINE.md round 1): graph selection must happen from compile
analysis BEFORE execution. These tests pin the decision logic and the
pipeline wiring on CPU, where the analysis itself is trivial."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aether_tpu.runtime import memgate


@pytest.fixture(autouse=True)
def _clean_registry():
    saved_memo = dict(memgate._MEMO)
    saved_res = dict(memgate._RESIDENT)
    memgate._MEMO.clear()
    memgate._RESIDENT.clear()
    yield
    memgate._MEMO.clear()
    memgate._MEMO.update(saved_memo)
    memgate._RESIDENT.clear()
    memgate._RESIDENT.update(saved_res)


def test_gate_inactive_on_cpu():
    assert memgate.gate_active() is False


def test_gate_env_override(monkeypatch):
    monkeypatch.setenv("AETHER_MEMGATE", "1")
    assert memgate.gate_active() is True
    monkeypatch.setenv("AETHER_MEMGATE", "0")
    assert memgate.gate_active() is False


def test_resident_registry_tracks_tree_bytes():
    tree = {"a": jnp.zeros((4, 4), jnp.float32), "b": jnp.zeros((8,), jnp.int8)}
    memgate.register_resident("tree", tree)
    assert memgate.resident_bytes() == 4 * 4 * 4 + 8
    # re-registering replaces, not accumulates
    memgate.register_resident("tree", {"a": jnp.zeros((2,), jnp.float32)})
    assert memgate.resident_bytes() == 8
    memgate.register_resident("other", 100)
    assert memgate.resident_bytes() == 108


def test_budget_env_override(monkeypatch):
    monkeypatch.setenv("AETHER_HBM_BUDGET_GB", "2.5")
    assert memgate.budget_bytes() == int(2.5 * 2**30)


def test_fits_compares_footprint_plus_resident_to_budget(monkeypatch):
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.zeros((16,), jnp.float32)
    fp = memgate.analyzed_footprint("t_fits", f, x)
    assert fp is not None and fp >= 0
    monkeypatch.setenv("AETHER_HBM_BUDGET_GB", "1.0")
    memgate.register_resident("big", 2 * 2**30)
    assert memgate.fits("t_fits", f, x) is False
    memgate.register_resident("big", 0)
    assert memgate.fits("t_fits", f, x) is True


def test_failed_compile_counts_as_not_fitting(monkeypatch):
    class Boom:
        def lower(self, *a, **k):
            raise RuntimeError("remote compile helper crash")

    assert memgate.analyzed_footprint("t_boom", Boom()) is None
    assert memgate.fits("t_boom", Boom()) is False
    # verdict memoized: second call must not re-raise through a fresh probe
    assert memgate.fits("t_boom", Boom()) is False


def test_transient_infra_fault_raises_and_is_not_persisted(monkeypatch,
                                                           tmp_path):
    """A worker crash during the probe means the device client is dead:
    the gate must fail fast with guidance (not demote the graph) and must
    NOT write a verdict — one infra flake may not poison later runs
    (observed live 2026-08-20: a crashed probe stored null and every later
    process skipped a perfectly good graph)."""
    monkeypatch.setattr(memgate, "_verdict_path",
                        lambda: str(tmp_path / "verdicts.json"))

    class WorkerDead:
        def lower(self, *a, **k):
            raise RuntimeError(
                "UNAVAILABLE: TPU worker process crashed or restarted")

    with pytest.raises(RuntimeError, match="restart the process"):
        memgate.analyzed_footprint("t_dead", WorkerDead())
    assert "t_dead" not in {k.split("-")[0] for k in memgate._MEMO}
    verdicts = memgate._load_verdicts()
    assert not any(k.startswith("t_dead") for k in verdicts)


def test_compile_failures_are_never_persisted(monkeypatch, tmp_path):
    """Probe failures stay in-process only: a transient fault must not
    demote a good graph forever, and a deterministic failure just re-probes
    next process. Only positive byte counts reach the verdict file."""
    monkeypatch.setattr(memgate, "_verdict_path",
                        lambda: str(tmp_path / "verdicts.json"))

    class Boom:
        def lower(self, *a, **k):
            raise RuntimeError("remote compile helper crash")

    assert memgate.analyzed_footprint("t_detfail", Boom()) is None
    assert not any(k.startswith("t_detfail")
                   for k in memgate._load_verdicts())
    # but successes ARE persisted
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    assert memgate.analyzed_footprint("t_ok", f, x) is not None
    good = memgate._load_verdicts()
    assert any(k.startswith("t_ok") and isinstance(v, int)
               for k, v in good.items())


def test_compile_helper_crash_with_remote_compile_is_not_dead_client():
    """An UNAVAILABLE that mentions remote_compile is the compile helper
    dying on an oversized buffer assignment — a property of the GRAPH; the
    process continues by choosing a smaller one (round-4 observation)."""
    exc = RuntimeError("UNAVAILABLE: remote_compile returned HTTP 500")
    assert memgate._is_dead_client_error(exc) is False
    # marker buried in the cause chain still counts as dead-client
    outer = RuntimeError("compile probe failed")
    outer.__cause__ = RuntimeError(
        "UNAVAILABLE: TPU worker process crashed or restarted")
    assert memgate._is_dead_client_error(outer) is True


def test_legacy_failure_verdicts_trigger_reprobe(monkeypatch, tmp_path):
    """Old-schema failure verdicts (null / 'compile_failed') must be treated
    as absent: the graph gets re-probed."""
    import json
    import os

    monkeypatch.setattr(memgate, "_verdict_path",
                        lambda: str(tmp_path / "verdicts.json"))
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    key = memgate._fingerprint("t_legacy", (x,), {})
    os.makedirs(tmp_path, exist_ok=True)
    with open(memgate._verdict_path(), "w") as fh:
        json.dump({key: None, key + "x": "compile_failed"}, fh)
    fp = memgate.analyzed_footprint("t_legacy", f, x)
    assert fp is not None and fp >= 0  # re-probed, not trusted as failed


def test_fingerprint_distinguishes_shapes_and_knobs(monkeypatch):
    x16 = jnp.zeros((16,), jnp.float32)
    x32 = jnp.zeros((32,), jnp.float32)
    k1 = memgate._fingerprint("t", (x16,), {})
    k2 = memgate._fingerprint("t", (x32,), {})
    assert k1 != k2
    monkeypatch.setenv("AETHER_CONV2D_LOWER", "0")
    k3 = memgate._fingerprint("t", (x16,), {})
    assert k3 != k1


def test_decode_pixels_batch_split_matches_unsplit(monkeypatch):
    """When the gate rejects both the scan graph and the full-batch chunk
    graph, _decode_pixels must split the batch and produce bit-identical
    output (the streams are independent)."""
    from aether_tpu.config import PipelineConfig
    from aether_tpu.models import init_vae_params
    from aether_tpu.pipeline import aether as A

    cfg = PipelineConfig.tiny()
    vae_params = init_vae_params(jax.random.PRNGKey(0), cfg.vae,
                                 dtype=jnp.float32)
    lat = jax.random.normal(
        jax.random.PRNGKey(1),
        (2, 3, cfg.vae.latent_channels, 8, 12), jnp.float32)

    ref = A._decode_pixels(cfg, jnp.float32, vae_params, lat, 2)

    monkeypatch.setattr(A.memgate, "gate_active", lambda: True)
    monkeypatch.setenv("AETHER_SCAN_DECODE", "1")
    monkeypatch.setitem(A._SCAN_DECODE_STATE, "ok", None)
    calls = []

    def fake_fits(tag, fn, *args, **kwargs):
        calls.append((tag, args))
        if tag == "decode_scanned":
            return False
        # reject the chunk graph only at batch 2 — forcing the split
        aval = args[3]
        return aval.shape[0] == 1

    monkeypatch.setattr(A.memgate, "fits", fake_fits)
    out = A._decode_pixels(cfg, jnp.float32, vae_params, lat, 2)
    assert any(t == "decode_scanned" for t, _ in calls)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_decode_pixels_gated_scan_runs_when_it_fits(monkeypatch):
    from aether_tpu.config import PipelineConfig
    from aether_tpu.models import init_vae_params
    from aether_tpu.pipeline import aether as A

    cfg = PipelineConfig.tiny()
    vae_params = init_vae_params(jax.random.PRNGKey(0), cfg.vae,
                                 dtype=jnp.float32)
    lat = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, 3, cfg.vae.latent_channels, 8, 12), jnp.float32)
    ref = A._decode_pixels(cfg, jnp.float32, vae_params, lat, 2)

    monkeypatch.setattr(A.memgate, "gate_active", lambda: True)
    monkeypatch.setattr(A.memgate, "fits", lambda *a, **k: True)
    monkeypatch.setenv("AETHER_SCAN_DECODE", "1")
    monkeypatch.setitem(A._SCAN_DECODE_STATE, "ok", None)
    out = A._decode_pixels(cfg, jnp.float32, vae_params, lat, 2)
    assert A._SCAN_DECODE_STATE["ok"] is True
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_pipeline_registers_resident_params():
    from aether_tpu.config import PipelineConfig
    from aether_tpu.models import init_dit_params, init_vae_params
    from aether_tpu.pipeline import AetherPipeline

    cfg = PipelineConfig.tiny()
    key = jax.random.PRNGKey(0)
    dit = init_dit_params(key, cfg.dit, dtype=jnp.float32)
    vae = init_vae_params(key, cfg.vae, dtype=jnp.float32)
    text = np.zeros((1, cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim),
                    np.float32)
    AetherPipeline(cfg, dit, vae, text, compute_dtype=jnp.float32)
    assert memgate.resident_bytes() >= (
        memgate.tree_device_bytes(dit) + memgate.tree_device_bytes(vae))


def test_decode_rgb_and_disparity_gated_split_matches_stacked(monkeypatch):
    """The stacked rgb+disparity decode must produce identical streams when
    the gate rejects the 2B graphs and splits (the shipping configuration on
    the 16 GB chip: serial B=1 beside the resident DiT)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aether_tpu.config import PipelineConfig
    from aether_tpu.models import init_vae_params
    from aether_tpu.pipeline import aether as A

    cfg = PipelineConfig.tiny()
    vae_params = init_vae_params(jax.random.PRNGKey(0), cfg.vae,
                                 dtype=jnp.float32)
    lat_c = cfg.vae.latent_channels
    lats = jax.random.normal(jax.random.PRNGKey(2),
                             (1, 3, 2 * lat_c + 24, 8, 12), jnp.float32)

    rgb_ref, disp_ref = A._decode_rgb_and_disparity(
        cfg, jnp.float32, vae_params, lats, tiling=False)

    monkeypatch.setattr(A.memgate, "gate_active", lambda: True)

    def fits_b1_only(tag, fn, *args, **kwargs):
        if tag == "decode_scanned":
            aval = args[3]
        elif tag == "decode_chunk_first":
            aval = args[3]
        else:
            return True
        return aval.shape[0] == 1

    monkeypatch.setattr(A.memgate, "fits", fits_b1_only)
    monkeypatch.setenv("AETHER_SCAN_DECODE", "1")
    monkeypatch.setitem(A._SCAN_DECODE_STATE, "ok", None)
    rgb, disp = A._decode_rgb_and_disparity(
        cfg, jnp.float32, vae_params, lats, tiling=False)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(disp_ref),
                               atol=1e-5)
