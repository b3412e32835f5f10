"""Profiling and timing helpers.

The reference has no profiler hooks at all (SURVEY.md §5 — loss prints
every 50 iterations are its only observability).  Here: ``jax.profiler``
trace annotation contexts around the pipeline stages, plus a wall-clock
timer that forces completion through a host fetch (``block_until_ready``
does not synchronize on this image's TPU tunnel — see ``bench.py``).
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["annotate", "trace", "timed", "timed_best"]


def annotate(name: str):
    """Named region for the TPU profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace for the enclosed block (view in TensorBoard
    / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_best(fn, repeats: int = 3):
    """``(result, best_seconds)`` — warm once, then min over repeats.

    Same return order as :func:`timed`.  The benchmarking idiom for this
    image's TPU tunnel: completion is forced by ``jax.device_get``
    (``block_until_ready`` does not synchronize on axon) and the min
    filters the tunnel's sporadic multi-second stalls.  Used by the
    ``tools/`` benchmark harnesses.
    """
    result = jax.device_get(fn())  # compile + warm
    best = float("inf")
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        result = jax.device_get(fn())
        best = min(best, time.perf_counter() - t0)
    return result, best


def timed(fn, *args, warmup: int = 1, repeats: int = 1, **kwargs):
    """``(result, seconds)`` with compile excluded and completion forced by
    a device-to-host fetch of the outputs."""
    result = None
    for _ in range(max(warmup, 0)):
        result = jax.device_get(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(max(repeats, 1)):
        result = jax.device_get(fn(*args, **kwargs))
    elapsed = (time.perf_counter() - t0) / max(repeats, 1)
    return result, elapsed
