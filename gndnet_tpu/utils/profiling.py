"""Profiling and timing utilities.

Replaces the reference's manual wall-clock instrumentation (AverageMeter
timers, commented time.time() deltas — reference: training.py:112-123,
ros_node.py:109-123, utils/speed_test.py:6-12) with:

* `trace` — context manager around `jax.profiler` writing a TensorBoard-
  loadable trace;
* `measure_hz` — forced-completion throughput measurement.  On tunneled TPU
  pools `jax.block_until_ready` can return before execution completes, so the
  only reliable anchor is a host-fetched scalar that data-depends on every
  result; this helper builds that harness (the methodology behind bench.py);
* `StageTimer` — cheap named host-side stage timers for pipeline debugging.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context: `with trace('/tmp/tb'): step(...)`."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_hz(fn, make_inputs, *, units_per_call: int = 1, reps: int = 5):
    """Throughput of `fn(*make_inputs())` in units/sec with forced completion.

    `fn` must return an array; a scalar reduction of it is fetched to host to
    anchor the timing.  Fresh inputs per rep defeat result caching; the
    fastest rep is reported (congested shared pools only add noise upward).
    """
    import jax
    import jax.numpy as jnp

    wrapped = jax.jit(lambda *a: jnp.sum(
        jax.tree_util.tree_reduce(
            lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)),
            fn(*a), jnp.float32(0))))
    args = make_inputs()
    float(wrapped(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        args = make_inputs()
        t0 = time.perf_counter()
        float(wrapped(*args))
        best = min(best, time.perf_counter() - t0)
    return units_per_call / best


class StageTimer:
    """Named accumulating host timers: `with t('voxelize'): ...`; `t.report()`."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            lines.append(
                f"{name}: total {self.totals[name]*1e3:.1f} ms over {n} "
                f"({self.totals[name]/n*1e3:.2f} ms avg)")
        return "\n".join(lines)
