"""Multi-host work sharding for embarrassingly-parallel evaluation.

The reference shards evaluation sequences over ranks with HF Accelerate's
``PartialState.split_between_processes`` (``evaluation/video_depth/
launch_aether.py:320-323``). The TPU-native equivalent: each host in a
``jax.distributed`` job takes a contiguous slice by ``jax.process_index()``;
no collective traffic is needed (sequences are independent), so this stays on
the host side and DCN is touched only if the caller aggregates.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, TypeVar

T = TypeVar("T")


def shard_sequences(
    items: Sequence[T],
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[T]:
    """Return this process's slice of ``items`` (contiguous, load-balanced).

    With k = len(items) % n processes, the first k processes take
    ceil(len/n) items — the same contract as Accelerate's
    ``split_between_processes`` without padding.
    """
    if process_index is None or process_count is None:
        import jax

        process_index = jax.process_index() if process_index is None else process_index
        process_count = jax.process_count() if process_count is None else process_count
    if process_count <= 1:
        return list(items)
    n = len(items)
    base, extra = divmod(n, process_count)
    start = process_index * base + min(process_index, extra)
    stop = start + base + (1 if process_index < extra else 0)
    return list(items[start:stop])
