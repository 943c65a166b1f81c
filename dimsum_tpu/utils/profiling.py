"""Tracing / profiling helpers.

The reference has only ad-hoc CUDA-event timing (sample.py:154-178), an NFE
counter (:30-49), and calflops probes (eval_toolbox/compute_flops.py).  The
TPU-native equivalents:

  * `trace(logdir)`: jax.profiler context -- produces a TensorBoard-viewable
    trace of device + host activity.
  * `timed`: wall-clock timing with a forced device->host sync (plain
    `block_until_ready` does not drain the remote TPU queue on tunneled
    setups; a host transfer does).
  * `xla_flops` / `xla_memory`: exact compiled-program cost from XLA's own
    analysis (no hook-based estimation).
  * NFE on adaptive solves comes from the dopri5 carried counter
    (transport/integrators.py ode_dopri5(return_nfe=True)).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Force completion of device work by pulling one leaf to host."""
    import jax

    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(leaves[-1])


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 1,
          **kwargs) -> float:
    """Seconds per call, with full device sync."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    sync(out)
    return (time.perf_counter() - t0) / iters


def xla_flops(fn: Callable, *args) -> float:
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", -1.0)) if cost else -1.0


def xla_memory(fn: Callable, *args) -> dict:
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    mem = compiled.memory_analysis()
    return {
        "temp_bytes": int(getattr(mem, "temp_size_in_bytes", -1)),
        "argument_bytes": int(getattr(mem, "argument_size_in_bytes", -1)),
        "output_bytes": int(getattr(mem, "output_size_in_bytes", -1)),
        "generated_code_bytes": int(
            getattr(mem, "generated_code_size_in_bytes", -1)),
    }


class MetricLogger:
    """Smoothed-scalar logger (reference dimsum/utils.py MetricLogger),
    windowed means for steady-rate reporting."""

    def __init__(self, window: int = 20):
        self.window = window
        self.series: dict = {}

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.series.setdefault(k, []).append(float(v))
            if len(self.series[k]) > 10 * self.window:
                self.series[k] = self.series[k][-self.window:]

    def mean(self, key: str) -> float:
        vals = self.series.get(key, [])
        return float(np.mean(vals[-self.window:])) if vals else float("nan")

    def global_mean(self, key: str) -> float:
        vals = self.series.get(key, [])
        return float(np.mean(vals)) if vals else float("nan")

    def __str__(self):
        return " ".join(f"{k}={self.mean(k):.4f}" for k in self.series)
