#!/usr/bin/env python
"""Probe: does a copy_to_host_async D2H transfer overlap subsequent device
compute on the tunneled runtime? Decides whether streaming the RGB pull
during the disparity decode can cut e2e (the pulls are ~40 MB each on a
10-20 MB/s link)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/overlap_cache")


def main():
    from aether_tpu.utils.profiling import warm_transfer_channel

    print(f"warm {warm_transfer_channel():.1f}s", file=sys.stderr, flush=True)

    # device workload ~2-4 s: chained matmuls
    @jax.jit
    def work(x):
        for _ in range(40):
            x = jnp.tanh(x @ x)
        return x

    x = jax.random.normal(jax.random.PRNGKey(0), (4096, 4096), jnp.bfloat16)
    big = (jax.random.uniform(jax.random.PRNGKey(1), (41, 480, 720, 3))
           * 255).astype(jnp.uint8)
    jax.block_until_ready((x, big))

    y = work(x)
    y.block_until_ready()
    t0 = time.perf_counter()
    y = work(x)
    y.block_until_ready()
    t_dev = time.perf_counter() - t0
    print(f"device work alone: {t_dev:.2f} s", flush=True)

    _ = np.asarray(big)  # warm the pull path
    t0 = time.perf_counter()
    big.copy_to_host_async()
    h = np.asarray(big)
    t_pull = time.perf_counter() - t0
    print(f"pull alone ({big.nbytes/2**20:.0f} MB): {t_pull:.2f} s "
          f"({big.nbytes/2**20/t_pull:.1f} MB/s)", flush=True)

    t0 = time.perf_counter()
    big.copy_to_host_async()
    y = work(x)
    y.block_until_ready()
    t_mid = time.perf_counter() - t0
    h = np.asarray(big)
    t_both = time.perf_counter() - t0
    print(f"pull+work overlapped: work-done at {t_mid:.2f} s, both done "
          f"{t_both:.2f} s (serial would be {t_dev + t_pull:.2f})", flush=True)
    ratio = t_both / (t_dev + t_pull)
    print(f"overlap verdict: {'YES' if ratio < 0.8 else 'NO'} "
          f"(both/serial = {ratio:.2f})")


if __name__ == "__main__":
    main()
