"""Profiling and phase timing.

The reference instruments with manual wall-clock accumulators only
(``gradient_time`` / ``denoise_time`` inside every algorithm, e.g. reference
``algorithms/pnp_svrg.py:49-79``; SURVEY.md §5 "Tracing / profiling"). The
TPU build keeps that split (``algorithms.compat`` populates the same dict
keys) and adds proper device-side tracing:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory (XLA op-level timeline, HBM usage).
* :func:`annotate` — named trace region, visible in the profiler timeline.
* :class:`PhaseTimers` — host-side named accumulators with a scalar-readback
  fence (default; ``block_until_ready`` is unreliable over the axon PJRT
  tunnel), for the gradient-vs-denoise split on paths that don't go through
  ``algorithms.compat``.
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


def scalar_fence(tree) -> None:
    """Synchronize by reading ONE scalar from each array back to the host.

    ``jax.block_until_ready`` does not reliably block on some PJRT transports
    (notably the axon TPU tunnel this project benches over — see CLAUDE.md
    "Measuring performance"), so the trustworthy fence is a host readback of
    a scalar: it forces the producing computation to finish without
    transferring the full buffer.
    """
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "reshape") and getattr(leaf, "size", 0):
            float(jax.numpy.real(leaf.reshape(-1)[0]))


class PhaseTimers:
    """Named wall-clock accumulators with a device-synchronizing fence.

    >>> timers = PhaseTimers()
    >>> with timers.phase("gradient", fence=lambda: v):
    ...     v = grad(z)
    >>> timers.totals()["gradient"]
    """

    def __init__(self, fence_mode: str = "scalar"):
        """``fence_mode``: "scalar" (default — host readback of one element
        per fenced array, the only fence that reliably blocks over the axon
        PJRT tunnel) or "block" (``jax.block_until_ready``, cheapest on
        backends where it works)."""
        if fence_mode not in ("scalar", "block"):
            raise ValueError(f"unknown fence_mode {fence_mode!r}")
        self._fence_mode = fence_mode
        self._totals: dict[str, float] = defaultdict(float)
        self._counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, fence=None):
        """Time a phase; ``fence`` (a pytree of arrays, or a zero-arg callable
        returning one — use a callable when the arrays are produced inside
        the block) is synchronized before the clock stops so async dispatch
        doesn't under-count."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                tree = fence() if callable(fence) else fence
                if self._fence_mode == "scalar":
                    scalar_fence(tree)
                else:
                    jax.block_until_ready(tree)
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
