"""Tracing / profiling harness.

The reference's only instrumentation is wall-clock logs (SURVEY.md §5).
TPU-native: `jax.profiler` traces viewable in XProf/TensorBoard, plus a
chained-timing helper that defeats the runtime's identical-execution
dedup (repeated same-input dispatches get pipelined/cached and report
impossible speeds — always chain the output back into the input).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace: `with trace("/tmp/xprof"): run()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def chained_throughput(fn: Callable, x, *args, iters: int = 30,
                       warmup: int = 2):
    """Items/sec for ``fn(x, *args) -> x_next`` (same shape/dtype so the
    output chains into the next call, forcing sequential execution)."""
    for _ in range(warmup):
        x = fn(x, *args)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x, *args)
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0
    return iters / dt, dt / iters


def device_memory_stats() -> dict:
    """Live/peak HBM per device (when the backend reports it)."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:  # backend without stats
            continue
        if s:
            out[str(d)] = {k: s[k] for k in
                           ("bytes_in_use", "peak_bytes_in_use")
                           if k in s}
    return out
