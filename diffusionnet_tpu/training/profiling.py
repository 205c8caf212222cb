"""Profiling / tracing / timing observability.

The reference has no profiler hooks, timers, or trace exporters (SURVEY §5).
Here: lightweight stage timers for the precompute pipeline, a jax.profiler
trace context for device timelines, and slope-based throughput measurement that
is robust to async dispatch (block_until_ready is not reliable on all
platforms/plugins).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulating named stage timer for host pipelines.

    with timer.stage("eigendecomposition"): ...
    print(timer.report())
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["stage timings:"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {name:<32} {total:8.3f}s  x{self.counts[name]}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def slope_throughput(step_fn, state, n1: int = 4, n2: int = 12):
    """Items/sec of a chained step_fn(state) -> (state, scalar) measured by the
    slope method: wall clock of n2 vs n1 chained steps, each run ending in a
    forced scalar fetch. Cancels dispatch/fetch overheads and is immune to
    unreliable block_until_ready semantics."""
    state, out = step_fn(state)
    float(out)  # force

    def run(n, state):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            state, out = step_fn(state)
        float(out)
        return time.perf_counter() - t0, state

    t1, state = run(n1, state)
    t2, state = run(n2, state)
    per_step = max((t2 - t1) / (n2 - n1), 1e-12)
    return 1.0 / per_step, state
