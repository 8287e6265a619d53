"""Timing + profiling utilities.

Replaces the reference's `utility/tic_toc.h` (`TicToc` stopwatch around
`readImage` / `processImage` / `optimization`) and `printStatistics()`
(SURVEY.md §5.1). Device work is asynchronous under JAX, so timed sections
must end with a `block_until_ready` — `timed()` handles that; `jax.profiler`
trace capture wraps around it for kernel-level inspection.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class Timers:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def timed(self, name: str, sync=None):
        """Time a section; `sync` (optional array/pytree) is blocked on before
        the clock stops so device work is included."""
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def summary(self) -> dict:
        return {
            k: {"total_s": round(self.totals[k], 4), "n": self.counts[k],
                "mean_ms": round(1e3 * self.totals[k] / max(self.counts[k], 1), 3)}
            for k in sorted(self.totals)
        }

    def report(self) -> str:
        """`printStatistics` equivalent."""
        lines = [f"{k:28s} n={v['n']:5d} mean={v['mean_ms']:8.3f} ms total={v['total_s']:8.3f} s"
                 for k, v in self.summary().items()]
        return "\n".join(lines)


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """Capture a jax.profiler trace (TensorBoard-viewable) around a section."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
