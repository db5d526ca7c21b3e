"""First-class tracing & per-stage timing (SURVEY.md section 5).

The reference has no profiling beyond tqdm bars; the TPU build makes
observability first-class: ``stage_timer`` wraps host-side stages with
wall-clock accounting (accumulated in a global registry, queryable via
``stage_report``), and ``device_trace`` wraps a block in a ``jax.profiler``
trace + named TraceAnnotation so device timelines line up with host stages.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

logger = logging.getLogger("aether_tpu")

_STAGE_TOTALS: Dict[str, float] = defaultdict(float)
_STAGE_COUNTS: Dict[str, int] = defaultdict(int)
_STAGE_LISTENERS: list = []


def add_stage_listener(fn) -> None:
    """Register ``fn(name, event, seconds)`` to observe stage boundaries.

    ``event`` is "begin" (seconds=0.0) or "end" (seconds=elapsed). Lets live
    front-ends (apps/serve.py) surface per-stage progress without the pipeline
    knowing about them. Listener exceptions are swallowed — observability must
    never break the computation."""
    _STAGE_LISTENERS.append(fn)


def remove_stage_listener(fn) -> None:
    try:
        _STAGE_LISTENERS.remove(fn)
    except ValueError:
        pass


def has_stage_listeners() -> bool:
    """True when a live front-end is observing stages. Long-running loops use
    this to decide whether paying a host sync for sub-stage progress is worth
    it (no listeners -> never block, zero overhead)."""
    return bool(_STAGE_LISTENERS)


def notify_stage_progress(name: str, frac: float) -> None:
    """Emit a fractional progress event inside a running stage.

    Listeners receive ``(name, "progress", frac)`` with frac in (0, 1]. The
    denoise driver fires one per jitted segment so a 50-step prediction shows
    live step progress in the web UI (the reference's per-step diffusers
    progress bar, ``pipeline:824``)."""
    _notify(name, "progress", frac)


def _notify(name: str, event: str, seconds: float) -> None:
    for fn in list(_STAGE_LISTENERS):
        try:
            fn(name, event, seconds)
        except Exception:  # noqa: BLE001 — see add_stage_listener
            pass


@contextlib.contextmanager
def stage_timer(name: str, log: bool = True) -> Iterator[None]:
    """Time a host-side stage; accumulates into the global stage report."""
    t0 = time.perf_counter()
    _notify(name, "begin", 0.0)
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _STAGE_TOTALS[name] += dt
        _STAGE_COUNTS[name] += 1
        _notify(name, "end", dt)
        if log:
            logger.info("stage %s: %.3fs", name, dt)


def stage_report(reset: bool = False) -> Dict[str, Dict[str, float]]:
    """Accumulated {stage: {total_s, count, mean_s}} since the last reset."""
    report = {
        name: {
            "total_s": total,
            "count": _STAGE_COUNTS[name],
            "mean_s": total / max(_STAGE_COUNTS[name], 1),
        }
        for name, total in _STAGE_TOTALS.items()
    }
    if reset:
        _STAGE_TOTALS.clear()
        _STAGE_COUNTS.clear()
    return report


def warm_transfer_channel() -> float:
    """Establish the device->host transfer path BEFORE big allocations.

    On tunneled/remote TPU runtimes the first D2H pull sets up a device-side
    staging resource; if the first pull happens after multi-GB params are
    resident, that setup fails with RESOURCE_EXHAUSTED and permanently wedges
    the process. One tiny pull at process start (~4 bytes; observed one-time
    cost up to ~5 min on this tunnel) makes all subsequent pulls reliable.
    Returns the seconds spent; no-op cost on healthy local backends.
    """
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as _np

    t0 = _time.perf_counter()
    _np.asarray(jnp.zeros((1,), jnp.float32))
    dt = _time.perf_counter() - t0
    logger.info("transfer channel warm (%.1fs, backend=%s)", dt,
                jax.default_backend())
    return dt


@contextlib.contextmanager
def device_trace(
    name: str, trace_dir: Optional[str] = None
) -> Iterator[None]:
    """Annotate a block on the device timeline; optionally write a full
    ``jax.profiler`` trace (viewable in TensorBoard / Perfetto) to trace_dir."""
    import jax

    ctx = contextlib.ExitStack()
    if trace_dir is not None:
        ctx.enter_context(jax.profiler.trace(trace_dir))
    ctx.enter_context(jax.profiler.TraceAnnotation(name))
    with ctx:
        with stage_timer(name, log=False):
            yield
