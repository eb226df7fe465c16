"""Observability: progress logging, timing, profiler traces, throughput.

The reference's only observability is printf gated by a quiet flag
(fastsk_kernel.cpp:85, :252) and wall-clock deltas in the harness. Here:

- ``Progress``: structured stderr logging gated by ``KernelConfig.quiet``,
  with elapsed-time stamps;
- ``timed``: context manager measuring a span and reporting a rate
  (e.g. sequence-pairs/s, the efficiency metric in BASELINE.md);
- ``profiler_trace``: wraps ``jax.profiler.trace`` so any engine run can
  emit a TensorBoard-loadable device trace.
"""

from __future__ import annotations

import contextlib
import sys
import time
from typing import Iterator, Optional


class Progress:
    def __init__(self, quiet: bool = True, stream=None):
        self.quiet = quiet
        self.stream = stream or sys.stderr
        self._t0 = time.perf_counter()

    def log(self, msg: str) -> None:
        if self.quiet:
            return
        dt = time.perf_counter() - self._t0
        print(f"[fastsk +{dt:8.2f}s] {msg}", file=self.stream, flush=True)


@contextlib.contextmanager
def timed(
    progress: Progress, label: str, work_items: Optional[float] = None,
    unit: str = "items",
) -> Iterator[dict]:
    """Measure a span; on exit logs wall time and, when ``work_items`` is
    given, the achieved rate. Yields a dict the caller may inspect."""
    out = {"label": label}
    t0 = time.perf_counter()
    try:
        yield out
    finally:
        wall = time.perf_counter() - t0
        out["wall_s"] = wall
        if work_items:
            out["rate"] = work_items / max(wall, 1e-12)
            progress.log(
                f"{label}: {wall:.2f} s ({out['rate']:.3e} {unit}/s)"
            )
        else:
            progress.log(f"{label}: {wall:.2f} s")


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Emit a jax.profiler device trace into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def enable_compilation_cache(path: str | None = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent).

    The experiment harness times kernels in fresh subprocesses (kill-on-
    timeout isolation, reference convention test/utils.py:15-66); without
    a persistent cache every point would pay full XLA compilation. Set
    ``FASTSK_COMPILATION_CACHE=0`` to disable, or to a directory to
    relocate it.
    """
    import os

    import jax

    env = os.environ.get("FASTSK_COMPILATION_CACHE", "")
    if env == "0":
        return ""
    path = path or env or os.path.expanduser("~/.cache/fastsk_tpu/jax")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return ""
    return path
