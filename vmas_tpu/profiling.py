"""Tracing / profiling helpers.

The reference has no built-in profiling (SURVEY.md §5 — timing is ad hoc in
examples, reference examples/use_vmas_env.py:74-109). The TPU build provides:

* :class:`StepTimer` — wall-clock phase timers with device sync, for
  per-phase step breakdowns (action decode / physics / outputs).
* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace (XLA op timeline on the real chip).
* :func:`benchmark_fn` — steady-state throughput of a compiled callable
  (compile excluded, device-synced), the measurement protocol bench.py uses.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict

import jax

__all__ = ["StepTimer", "trace", "benchmark_fn"]


class StepTimer:
    """Accumulating named phase timer. Each phase ends with a device sync so
    asynchronous dispatch doesn't attribute device time to the wrong phase.

    >>> timer = StepTimer()
    >>> with timer.phase("physics"):
    ...     state = step(state)      # doctest: +SKIP
    >>> timer.summary()              # doctest: +SKIP
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1),
            }
            for k in self.totals
        }

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; open the result with TensorBoard's
    profile plugin or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark_fn(fn: Callable, *args, iters: int = 5, warmup: int = 2):
    """Steady-state seconds/call of a jitted callable: runs ``warmup``
    untimed calls (compile + clock ramp), then times ``iters`` calls with a
    final device sync. Returns (mean_seconds, last_output)."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out
