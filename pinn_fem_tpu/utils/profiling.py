"""Tracing / profiling hooks.

The reference has no profiling at all (SURVEY §5: wall-clock claims in a
README; history lists are the only introspection).  Here:

  * trace(log_dir): context manager around jax.profiler.trace — captures a
    full XLA/TPU trace viewable in TensorBoard/Perfetto;
  * Stopwatch: lightweight named wall-clock sections with a report dict,
    used by bench.py and available to embedders;
  * annotate(name): TraceAnnotation wrapper so host-side phases show up
    inside device traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace into log_dir (TensorBoard-compatible)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that appears on the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class Stopwatch:
    """Accumulating named wall-clock sections.

    >>> sw = Stopwatch()
    >>> with sw.section("assembly"):
    ...     ...
    >>> sw.report()  # {"assembly": {"total_s": ..., "count": ...}}
    """

    def __init__(self):
        self._totals: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._totals[name] = self._totals.get(name, 0.0) + dt
            self._counts[name] = self._counts.get(name, 0) + 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self._totals[k], "count": self._counts[k],
                "mean_s": self._totals[k] / self._counts[k]}
            for k in self._totals
        }
