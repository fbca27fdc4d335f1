"""Tracing / profiling helpers.

The reference has no built-in profiling (SURVEY.md §5 — timing is ad hoc in
examples, reference examples/use_vmas_env.py:74-109). The TPU build provides:

* :class:`StepTimer` — wall-clock phase timers with device sync, for
  per-phase step breakdowns (action decode / physics / outputs).
* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace (XLA op timeline on the real chip).
* :func:`benchmark_fn` — steady-state throughput of a compiled callable
  (compile excluded, device-synced). Mean-of-iters; bench.py uses its own
  stricter steady-peak protocol (warm-until-stable, best of several
  windows) because the v5e's clock state wanders run to run.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict

import jax

__all__ = ["StepTimer", "trace", "benchmark_fn"]


class StepTimer:
    """Accumulating named phase timer.

    JAX dispatch is asynchronous: without a device sync at phase exit, a
    phase measures only enqueue time (~µs) and its device time is attributed
    to whichever later phase first blocks. Pass ``sync_on`` to block at exit:

    * a zero-arg callable, evaluated AT EXIT — closures are late-bound, so
      ``lambda: state`` picks up the ``state`` assigned inside the block:

      >>> timer = StepTimer()
      >>> with timer.phase("physics", sync_on=lambda: state):
      ...     state = step(state)      # doctest: +SKIP

    * or a pytree of arrays, blocked as-is (for values known up front).

    Without ``sync_on`` the phase measures dispatch time only.
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
                jax.block_until_ready(sync_on() if callable(sync_on) else sync_on)
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
    untimed calls (compile + clock ramp; pass 0 to include first-call
    compile in the measurement), then times ``iters`` calls with a final
    device sync. Returns (mean_seconds, last_output)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    out = None
    for _ in range(warmup):
        out = fn(*args)
    if out is not None:
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out
