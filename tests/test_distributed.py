"""Multi-host bootstrap tests (parallel/distributed.py).

The 2-process test is the real thing, not a mock: two subprocesses join a
jax.distributed process group over a localhost coordinator (Gloo CPU
collectives), cross-gather their ranks, shard a sequence list the way the
eval drivers do, and meet at the named barrier — the TPU-native analogue of
the reference's Accelerate launcher + ``wait_for_everyone``
(`evaluation/rel_pose/launch_aether.py:272-355`).
"""

import os
import socket
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_single_process_is_noop():
    from aether_tpu.parallel.distributed import (
        barrier,
        initialize,
        is_distributed,
        is_main,
    )

    for var in ("AETHER_COORDINATOR", "JAX_COORDINATOR_ADDRESS",
                "AETHER_NUM_PROCESSES", "JAX_NUM_PROCESSES"):
        assert os.environ.get(var) in (None, ""), f"{var} leaked into tests"
    assert initialize() is False  # unconfigured, non-pod: single host
    assert not is_distributed()
    assert is_main()
    barrier("noop")  # must not require a process group


_WORKER = textwrap.dedent("""
    import os, sys
    # sitecustomize on this image force-injects the axon TPU platform even
    # over a JAX_PLATFORMS=cpu env (same issue conftest.py handles for the
    # main process) -- pin via jax.config, which wins as long as no backend
    # has been initialized yet.
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, port = int(sys.argv[1]), sys.argv[2]
    sys.path.insert(0, {repo!r})
    from aether_tpu.parallel.distributed import (
        barrier, initialize, is_distributed, is_main)

    assert initialize(coordinator_address=f"127.0.0.1:{{port}}",
                      num_processes=2, process_id=pid)
    assert initialize() is True  # idempotent after join

    import jax
    assert jax.process_count() == 2
    assert is_distributed()
    assert is_main() == (pid == 0)

    # rank-aware sequence sharding picks up jax.process_index() implicitly
    from aether_tpu.eval.sharding import shard_sequences
    mine = shard_sequences(["a", "b", "c"])
    assert mine == (["a", "b"] if pid == 0 else ["c"]), mine

    # a real cross-process collective + the named fence
    from jax.experimental import multihost_utils
    ranks = multihost_utils.process_allgather(
        jax.numpy.asarray([jax.process_index()])).ravel().tolist()
    assert ranks == [0, 1], ranks
    barrier("eval_done")
    print(f"OK rank {{pid}}")
""").format(repo=REPO)


def test_two_process_group_localhost():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("XLA_", "JAX_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"
        assert f"OK rank {pid}" in out
