#!/usr/bin/env python
"""Probe the device->host tunnel: compile latency + pull throughput.

The shared remote TPU ("axon") contends across tenants; measured pull
throughput has ranged 1.5-17 MB/s between sessions. Benchmarks are
meaningless when the tunnel is degraded, so run this first:

    python tools/tunnel_probe.py [--mb 24]

prints one line: ``tunnel: compile=XXs pull=XX MB/s exec=XXms``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    n = args.mb * (1 << 20) // 4

    @jax.jit
    def make(seed):
        # cheap to compute, incompressible-ish payload; fresh seed per
        # call defeats the axon execution dedupe
        return jax.random.bits(jax.random.PRNGKey(seed), (n,)).astype(
            jnp.int32
        )

    t0 = time.perf_counter()
    x = make(jnp.int32(0))
    _ = np.asarray(x[:8])
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    x = make(jnp.int32(1))
    _ = np.asarray(x[:8])
    exec_ms = (time.perf_counter() - t0) * 1e3

    t0 = time.perf_counter()
    _ = np.asarray(make(jnp.int32(2)))
    pull = args.mb / (time.perf_counter() - t0)

    from fastsk_tpu.ops.transfer import pull_array

    t0 = time.perf_counter()
    _ = pull_array(make(jnp.int32(3)).reshape(-1, 1 << 10))
    pull_c = args.mb / (time.perf_counter() - t0)

    print(
        f"tunnel: compile={compile_s:.1f}s pull={pull:.1f} MB/s "
        f"(chunked {pull_c:.1f}) exec={exec_ms:.0f}ms "
        f"({jax.devices()[0].platform})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
