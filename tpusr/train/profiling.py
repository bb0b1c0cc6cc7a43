"""Profiling helpers (SURVEY.md §5 tracing row): jax.profiler traces and a
steady-state timing harness for compiled callables."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_compiled(fn, *args, iters: int = 10, warmup: int = 1):
    """Steady-state seconds/call of a jitted callable (blocks on results).

    Replaces the reference's `time_algorithm` (profiling_methods.py:17-27)
    for compiled functions: excludes compile time, amortizes dispatch.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def device_memory_mb(device=None) -> dict:
    """Current/peak device memory in MB (reference's get_memory_info analog)."""
    dev = device or jax.local_devices()[0]
    stats = dev.memory_stats() or {}
    mb = 1024.0 * 1024.0
    return {
        "current_mb": stats.get("bytes_in_use", 0) / mb,
        "peak_mb": stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)) / mb,
    }
