"""Multi-host bootstrap: process-group init, barrier, and main-process gating.

The reference scales its evaluation with HF Accelerate, whose launcher brings
up a torch.distributed process group used for exactly three things: process
spawn/device placement, sequence sharding, and a final barrier before
main-process aggregation (`evaluation/rel_pose/launch_aether.py:272-355`,
`evaluation/video_depth/launch_aether.py:320-323` — SURVEY.md section 2.3).

The TPU-native equivalents here:

- :func:`initialize` wraps ``jax.distributed.initialize``. On a TPU pod slice
  every argument is auto-detected from the TPU metadata, so a bare
  ``initialize()`` is enough; on CPU/GPU fleets (or multi-process CPU tests)
  the coordinator/process topology comes from arguments or the standard
  ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``
  environment (also readable from the ``AETHER_*`` aliases).
- :func:`barrier` is the ``wait_for_everyone`` analogue: a named
  ``sync_global_devices`` fence across all hosts.
- :func:`is_main` gates aggregation/printing to process 0, and
  :func:`shard_sequences <aether_tpu.eval.sharding.shard_sequences>` (already
  rank-aware) replaces ``PartialState.split_between_processes``.

Sequence sharding stays embarrassingly parallel over DCN — collectives ride
the ICI mesh inside each host's pipeline, exactly the layering SURVEY
section 5 prescribes.
"""

from __future__ import annotations

import os
from typing import Optional

_ENV_ALIASES = {
    "coordinator_address": ("AETHER_COORDINATOR", "JAX_COORDINATOR_ADDRESS"),
    "num_processes": ("AETHER_NUM_PROCESSES", "JAX_NUM_PROCESSES"),
    "process_id": ("AETHER_PROCESS_ID", "JAX_PROCESS_ID"),
}


def _from_env(name: str) -> Optional[str]:
    for var in _ENV_ALIASES[name]:
        val = os.environ.get(var)
        if val not in (None, ""):
            return val
    return None


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join (or skip) the multi-host process group. Returns True if joined.

    Resolution order per field: explicit argument, then environment
    (``AETHER_*`` alias or JAX's own variable). When nothing is configured
    and the backend is not a TPU pod, this is a single-process run and the
    call is a no-op returning False — callers never need to special-case
    local runs. Idempotent: a second call after a successful join returns
    True without re-initializing.
    """
    import jax

    if getattr(initialize, "_joined", False):
        return True

    coordinator_address = coordinator_address or _from_env("coordinator_address")
    if num_processes is None:
        env = _from_env("num_processes")
        num_processes = int(env) if env is not None else None
    if process_id is None:
        env = _from_env("process_id")
        process_id = int(env) if env is not None else None

    if coordinator_address is None:
        # TPU pods auto-detect everything; anywhere else an unconfigured call
        # means single-host. jax.distributed.initialize() with no args would
        # raise off-pod, so probe the platform request rather than crashing.
        platforms = os.environ.get("JAX_PLATFORMS", "")
        if "tpu" not in platforms and num_processes in (None, 1):
            return False
        jax.distributed.initialize()
    else:
        if num_processes in (None, 1):
            return False
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    initialize._joined = True
    return True


def is_distributed() -> bool:
    """True when more than one process shares the jax runtime."""
    import jax

    return jax.process_count() > 1


def is_main() -> bool:
    """True on process 0 — gate aggregation, summary writes, and logging."""
    import jax

    return jax.process_index() == 0


def barrier(name: str = "aether_barrier") -> None:
    """Block until every process reaches this named fence.

    The reference's ``accelerator.wait_for_everyone()`` before main-process
    aggregation (`rel_pose/launch_aether.py:348-350`). No-op single-process.
    """
    if not is_distributed():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
