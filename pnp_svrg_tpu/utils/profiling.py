"""Profiling and phase timing.

The reference instruments with manual wall-clock accumulators only
(``gradient_time`` / ``denoise_time`` inside every algorithm, e.g. reference
``algorithms/pnp_svrg.py:49-79``; SURVEY.md §5 "Tracing / profiling"). The
TPU build keeps that split (``algorithms.compat`` populates the same dict
keys) and adds proper device-side tracing:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory (XLA op-level timeline, HBM usage).
* :func:`annotate` — named trace region, visible in the profiler timeline.
* :class:`PhaseTimers` — host-side named accumulators with
  ``block_until_ready`` fencing, for the gradient-vs-denoise split on paths
  that don't go through ``algorithms.compat``.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a JAX/XLA profiler trace into ``logdir`` (TensorBoard format)."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region in the profiler timeline (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimers:
    """Named wall-clock accumulators fenced with ``block_until_ready``.

    >>> timers = PhaseTimers()
    >>> with timers.phase("gradient"):
    ...     v = grad(z)
    >>> timers.totals()["gradient"]
    """

    def __init__(self):
        self._totals: dict[str, float] = defaultdict(float)
        self._counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, fence=None):
        """Time a phase; ``fence`` (a pytree of arrays) is blocked on before
        the clock stops so async dispatch doesn't under-count."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            self._totals[name] += time.perf_counter() - t0
            self._counts[name] += 1

    def add(self, name: str, seconds: float) -> None:
        self._totals[name] += seconds
        self._counts[name] += 1

    def totals(self) -> dict[str, float]:
        return dict(self._totals)

    def counts(self) -> dict[str, int]:
        return dict(self._counts)

    def summary(self) -> str:
        return ", ".join(
            f"{k}: {v:.3f}s/{self._counts[k]}" for k, v in self._totals.items()
        )
