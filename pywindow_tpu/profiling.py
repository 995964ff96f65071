"""Tracing, timing and metrics.

The reference has no observability at all (SURVEY §5): its only logging
is two window warnings through a borrowed rdkit logger.  Here:

* ``stage(name)`` — a context manager accumulating wall-time per
  pipeline stage into :data:`METRICS` (and optionally annotating the
  XLA profile via ``jax.profiler.TraceAnnotation``),
* ``trace(dir)`` — wraps ``jax.profiler.trace`` for on-TPU profiling,
* :class:`Metrics` — counters (frames analysed, rays kept, clusters
  found, optimiser iterations) that the analysis layer feeds.

Everything is no-overhead-by-default: collection only happens once
``enable()`` is called (or PYWINDOW_TPU_PROFILE=1 is set).
"""

from __future__ import annotations

import collections
import contextlib
import logging
import os
import time

logger = logging.getLogger("pywindow_tpu")


class Metrics:
    """Process-wide counters and stage timers."""

    def __init__(self) -> None:
        self.counters: collections.Counter = collections.Counter()
        self.stage_seconds: collections.defaultdict = (
            collections.defaultdict(float)
        )
        self.stage_calls: collections.Counter = collections.Counter()

    def count(self, name: str, value: float = 1) -> None:
        """Increment counter *name* by *value*."""
        self.counters[name] += value

    def snapshot(self) -> dict:
        """Copy of all counters and stage timings."""
        return {
            "counters": dict(self.counters),
            "stage_seconds": dict(self.stage_seconds),
            "stage_calls": dict(self.stage_calls),
        }

    def reset(self) -> None:
        """Clear all counters and stage timings."""
        self.counters.clear()
        self.stage_seconds.clear()
        self.stage_calls.clear()


METRICS = Metrics()
_ENABLED = os.environ.get("PYWINDOW_TPU_PROFILE", "") == "1"


def enable(on: bool = True) -> None:
    """Globally enable/disable stage timing collection."""
    global _ENABLED
    _ENABLED = on


def enabled() -> bool:
    """Whether stage timing collection is on."""
    return _ENABLED


@contextlib.contextmanager
def stage(name: str):
    """Time a pipeline stage (no-op unless profiling is enabled)."""
    if not _ENABLED:
        yield
        return
    try:
        import jax.profiler

        annotation = jax.profiler.TraceAnnotation(name)
        annotation.__enter__()
    except Exception:  # pragma: no cover - profiler unavailable
        annotation = None
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        METRICS.stage_seconds[name] += dt
        METRICS.stage_calls[name] += 1
        if annotation is not None:
            annotation.__exit__(None, None, None)
        logger.debug("stage %s: %.3f ms", name, dt * 1e3)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA device profile (view with tensorboard/xprof)."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
