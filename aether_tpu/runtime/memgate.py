"""Pre-execution HBM gate for wedge-on-OOM runtimes.

The tunneled TPU runtime this repo benches on wedges PERMANENTLY on any
runtime allocation failure: after one RESOURCE_EXHAUSTED, every subsequent
device op fails for the lifetime of the chip lease, across fresh processes
(BASELINE.md round 1; reproduced by the round-4 driver bench,
``bench_stderr_full.log``). Try-the-fast-path-and-catch-OOM is therefore not
a safety mechanism there — the first OOM is fatal — so graph selection must
happen BEFORE anything executes.

This module provides that gate: AOT-lower + compile a jitted function (no HBM
is touched — XLA memory assignment runs in the compile service) and read the
compiler's ``memory_analysis()`` for the program's temp+output footprint. A
graph is executed only when ``footprint + resident parameter bytes`` fits
under the device budget. Verdicts (and compile failures — the remote compile
helper crashes on very large buffer assignments, observed 2026-08-20) are
persisted to disk so later processes skip the probe cost.

Calibration on the tunneled v5e (16 GB HBM), measured round 5:
  - encoder strip graph: 8.46 GB temp + 5.7 GB resident params ran fine;
  - scan-decode stacked batch-2 strip: 11.8 GB temp + 5.7 GB resident wedged
    the chip (the round-4 bench failure).
The default budget of 15.2 GB (16 minus a 0.8 GB staging/fragmentation
margin) separates the two with headroom on both sides.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Any, Dict, Optional

import jax

_LOCK = threading.Lock()
# in-process memo: key -> bytes (int) or None (compile failed)
_MEMO: Dict[str, Optional[int]] = {}
# resident registry: name -> bytes of long-lived device allocations (params)
_RESIDENT: Dict[str, int] = {}
# fingerprints already warned about (log once per graph, not per call)
_WARNED: set = set()

_HBM_BYTES_BY_KIND = {
    # device_kind -> HBM bytes. v5 lite (v5e) = 16 GB.
    "TPU v5 lite": 16 * 2**30,
    "TPU v5e": 16 * 2**30,
    "TPU v4": 32 * 2**30,
    "TPU v5p": 95 * 2**30,
    "TPU v6 lite": 32 * 2**30,
}


def tree_device_bytes(tree: Any) -> int:
    """Sum of array bytes in a pytree (params resident on device)."""
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "dtype")
    )


def register_resident(name: str, tree_or_bytes: Any) -> None:
    """Record a long-lived device allocation (weights, baked constants) so
    gate decisions account for it. Re-registering a name replaces it."""
    n = (tree_or_bytes if isinstance(tree_or_bytes, int)
         else tree_device_bytes(tree_or_bytes))
    with _LOCK:
        _RESIDENT[name] = int(n)


def resident_bytes() -> int:
    with _LOCK:
        return sum(_RESIDENT.values())


def budget_bytes() -> int:
    """Usable HBM budget: device capacity minus a staging/fragmentation
    margin (AETHER_HBM_MARGIN_GB, default 0.8 — see module calibration
    note). AETHER_HBM_BUDGET_GB overrides the whole computation."""
    override = os.environ.get("AETHER_HBM_BUDGET_GB")
    if override:
        return int(float(override) * 2**30)
    try:
        kind = jax.local_devices()[0].device_kind
    except Exception:
        kind = ""
    cap = _HBM_BYTES_BY_KIND.get(kind, 16 * 2**30)
    margin = float(os.environ.get("AETHER_HBM_MARGIN_GB", "0.8"))
    return cap - int(margin * 2**30)


def gate_active() -> bool:
    """The AOT pre-gate is mandatory exactly where an allocation failure is
    unrecoverable: accelerator backends that expose no memory stats (the
    tunneled remote runtime). Full PJRT runtimes raise catchable OOMs and
    report ``memory_stats()``, so the cheaper try/except adaptive paths stay
    in charge there; CPU never needs gating. AETHER_MEMGATE=0/1 overrides."""
    mode = os.environ.get("AETHER_MEMGATE")
    if mode is not None:
        return mode.lower() in ("1", "true", "on")
    try:
        if jax.default_backend() == "cpu":
            return False
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return False
    return not (bool(stats) and "bytes_limit" in stats)


def _verdict_path() -> str:
    cache_dir = jax.config.jax_compilation_cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "aether_tpu", "jax_cache")
    return os.path.join(cache_dir, "memgate_verdicts.json")


def _load_verdicts() -> Dict[str, Optional[int]]:
    try:
        with open(_verdict_path()) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _store_verdict(key: str, value: Optional[int]) -> None:
    path = _verdict_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with _LOCK:
            verdicts = _load_verdicts()
            verdicts[key] = value
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(verdicts, f, indent=0)
            os.replace(tmp, path)
    except OSError:
        pass


def _fingerprint(tag: str, args, kwargs) -> str:
    def fmt(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return f"{tuple(x.shape)}:{x.dtype}"
        if isinstance(x, (int, float, str, bool, type(None))):
            return repr(x)
        if isinstance(x, (list, tuple)):
            return "[" + ",".join(fmt(v) for v in x) + "]"
        if isinstance(x, dict):
            return "{" + ",".join(f"{k}={fmt(v)}" for k, v in sorted(x.items())) + "}"
        return type(x).__name__

    leaves = ",".join(fmt(a) for a in jax.tree_util.tree_leaves((args, kwargs)))
    knobs = ":".join(os.environ.get(k, "") for k in (
        "AETHER_CONV2D_LOWER", "AETHER_GN_PALLAS"))
    import hashlib

    h = hashlib.sha256(f"{tag}|{leaves}|{knobs}".encode()).hexdigest()[:16]
    return f"{tag}-{h}"


def _is_dead_client_error(exc: BaseException) -> bool:
    """True when the fault means the DEVICE CLIENT is broken (remote worker
    crash / lost tunnel), not that the probed graph can't compile.

    Observed live 2026-08-20: a worker crash during a compile probe was
    persisted as a permanent failure verdict, demoting a perfectly good graph
    in every later process — and the process then limped on with a dead
    client until an unrelated op produced a cryptic failure. The whole
    exception chain is inspected (JAX wraps transport errors), and bare
    UNAVAILABLE counts only when it is NOT the remote compile helper dying on
    an oversized buffer assignment (those carry 'remote_compile' and are a
    property of the graph, not the client — the process can and does continue
    by choosing a smaller graph)."""
    seen = set()
    e: Optional[BaseException] = exc
    while e is not None and id(e) not in seen:
        seen.add(id(e))
        msg = str(e).lower()
        if "worker process crashed" in msg:
            return True
        if "unavailable" in msg and "remote_compile" not in msg:
            return True
        e = e.__cause__ or e.__context__
    return False


def analyzed_footprint(tag: str, jit_fn, *args, **kwargs) -> Optional[int]:
    """temp+output bytes of the compiled program, or None if the compile
    probe failed (remote compile-helper crash on huge buffer assignments /
    compile-OOM — treat as unusable THIS process).

    Compile-only: nothing is allocated on device. The compiled binary lands
    in JAX's persistent compilation cache, so the later real call pays only
    deserialization; a verdict file additionally persists successful byte
    counts across processes. Failures are deliberately NOT persisted — a
    transient fault must not demote a good graph forever; a deterministic
    compile failure just re-probes next process (seconds, and rare). Faults
    that mean the device client itself is dead (worker crash, lost tunnel)
    RAISE instead: the caller must restart the process, and limping on only
    defers the failure to a more cryptic place.
    """
    key = _fingerprint(tag, args, kwargs)
    with _LOCK:
        if key in _MEMO:
            return _MEMO[key]
    verdicts = _load_verdicts()
    # Only positive (int) verdicts are trusted from disk; legacy schemas
    # stored failures as null/"compile_failed" — treat those as absent so
    # one bad run cannot poison the cache forever.
    if isinstance(verdicts.get(key), int):
        val = verdicts[key]
        with _LOCK:
            _MEMO[key] = val
        return val
    try:
        compiled = jit_fn.lower(*args, **kwargs).compile()
        ma = compiled.memory_analysis()
        val: Optional[int] = int(ma.temp_size_in_bytes + ma.output_size_in_bytes)
    except Exception as exc:  # remote compile helper crash, compile-OOM, ...
        if _is_dead_client_error(exc):
            raise RuntimeError(
                f"memgate compile probe for '{tag}' died on a runtime fault "
                "(TPU worker crash / lost connection) — the device client is "
                "no longer usable; restart the process. The verdict is NOT "
                "persisted, so the next run re-probes this graph."
            ) from exc
        import sys

        print(f"[memgate] compile probe failed for {tag}: "
              f"{type(exc).__name__}: {str(exc)[:160]}",
              file=sys.stderr, flush=True)
        val = None
    with _LOCK:
        _MEMO[key] = val
    if val is not None:
        _store_verdict(key, val)
    return val


def fits(tag: str, jit_fn, *args, **kwargs) -> bool:
    """True iff the program's analyzed footprint + registered resident bytes
    fits the budget. A failed compile probe counts as NOT fitting."""
    fp = analyzed_footprint(tag, jit_fn, *args, **kwargs)
    if fp is None:
        return False
    ok = fp + resident_bytes() <= budget_bytes()
    if not ok:
        key = _fingerprint(tag, args, kwargs)
        with _LOCK:
            seen = key in _WARNED
            _WARNED.add(key)
        if not seen:
            import sys

            print(f"[memgate] {tag}: footprint {fp / 2**30:.2f} GB + resident "
                  f"{resident_bytes() / 2**30:.2f} GB exceeds budget "
                  f"{budget_bytes() / 2**30:.2f} GB — choosing a smaller graph",
                  file=sys.stderr, flush=True)
    return ok
