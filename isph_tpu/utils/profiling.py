"""Profiling / tracing hooks.

Parity with the reference's Teuchos timer registry (~27 named timers,
utils.h:20-47, summarized per step pair_isph.cpp:1377) and the
FUNCT_ENTER/EXIT call tracer (macrodef.h:26-41):

- named_scope(): jax.profiler.TraceAnnotation wrappers so device traces carry
  the same phase names (compute_pre / helmholtz / poisson / ...).
- Timers: host-side accumulated wall timers with a summarize() table.
- trace(): context manager around jax.profiler.trace for TensorBoard dumps.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def named_scope(name: str) -> Iterator[None]:
    with jax.named_scope(name):
        yield


class Timers:
    """Host-side phase timers (Teuchos::TimeMonitor replacement).  Note that
    under jit, device work is async: wrap the timed region's results in
    block_until_ready for truthful numbers."""

    def __init__(self):
        self._acc: Dict[str, float] = defaultdict(float)
        self._cnt: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def scope(self, name: str):
        t0 = time.perf_counter()
        try:
            with jax.named_scope(name):
                yield
        finally:
            self._acc[name] += time.perf_counter() - t0
            self._cnt[name] += 1

    def summarize(self) -> str:
        lines = ["%-40s %10s %8s" % ("timer", "total[s]", "calls")]
        for name in sorted(self._acc):
            lines.append("%-40s %10.4f %8d" % (name, self._acc[name], self._cnt[name]))
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
