"""Phase timers + optional jax.profiler tracing (SURVEY.md §5.1).

``Timer`` is a zero-cost-when-disabled context manager used at phase
boundaries only — never inside jit — and calls ``block_until_ready`` on a
supplied array so device work is actually attributed to the phase.
``trace_context`` wraps a region in a jax.profiler trace when a trace dir is
given (CLI flag ``--trace-dir``), viewable in Perfetto/XProf.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class Timer:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.times: dict = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            dt = (time.perf_counter() - t0) * 1000.0
            self.times.setdefault(name, []).append(dt)

    def mean_ms(self, name: str) -> float:
        v = self.times.get(name, [])
        return sum(v) / len(v) if v else 0.0


@contextlib.contextmanager
def trace_context(trace_dir: Optional[str]):
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
