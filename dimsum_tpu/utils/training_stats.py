"""Collective training-statistics collector.

Reference: `/root/reference/eval_toolbox/torch_utils/training_stats.py`
(report :62, report0 :113, Collector :123, _sync :250 with its
`torch.distributed.all_reduce` of stacked [num, sum, sum_sq] moments).

TPU-native redesign -- same API, JAX collectives:

  * `report(name, value)` accumulates float64 [num, sum, sum_sq] moments
    host-side.  Values may be Python scalars, numpy arrays, or jax Arrays
    (fetched with `np.asarray`; call it outside jit).
  * For values produced INSIDE a jitted/shard_map step, compute
    `moments(value)` inside the program (and `jax.lax.psum` it over the
    mesh axes there -- the analogue of the reference's all_reduce), then
    feed the (3,)-vector to `report_moments(name, m)` on the host.
  * `Collector.update()` syncs across processes: with
    `jax.process_count() > 1` the stacked moment matrix is summed over
    hosts via `multihost_utils.process_allgather` (every host must call
    update() collectively, mirroring the reference's "consistent set of
    names across processes" contract); single-process runs skip it.
  * `Collector.num/mean/std/as_dict` match the reference semantics
    (NaN mean for empty stats, zero std for singletons, raw-variance
    clamping).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["report", "report0", "report_moments", "moments", "Collector",
           "reset"]

_NUM_MOMENTS = 3  # [num, sum, sum_sq]

_counters: Dict[str, np.ndarray] = {}   # name -> float64 (3,), since start
_cumulative: Dict[str, np.ndarray] = {}  # name -> float64 (3,), synced


def reset():
    """Clear all accumulated state (test isolation)."""
    _counters.clear()
    _cumulative.clear()


def moments(value):
    """In-graph moment vector [num, sum, sum_sq] of an arbitrary-shaped
    value; psum it over the mesh axis inside shard_map/jit, then pass the
    fetched result to `report_moments`."""
    v = jnp.ravel(value).astype(jnp.float32)
    return jnp.stack([
        jnp.asarray(v.size, jnp.float32),
        jnp.sum(v),
        jnp.sum(jnp.square(v)),
    ])


def report_moments(name: str, m):
    """Accumulate a precomputed [num, sum, sum_sq] vector (host-side)."""
    m = np.asarray(m, np.float64)
    assert m.shape == (_NUM_MOMENTS,)
    if name not in _counters:
        _counters[name] = np.zeros(_NUM_MOMENTS, np.float64)
    _counters[name] += m
    return m


def report(name: str, value):
    """Accumulate a set of scalars under `name` (reference report :62).
    Returns `value` so it can be used inline."""
    elems = np.asarray(value, np.float64).ravel()
    if name not in _counters:
        _counters[name] = np.zeros(_NUM_MOMENTS, np.float64)
    if elems.size:
        _counters[name] += np.array(
            [elems.size, elems.sum(), np.square(elems).sum()], np.float64)
    return value


def report0(name: str, value):
    """Accumulate only on process 0 (reference report0 :113)."""
    report(name, value if jax.process_index() == 0 else [])
    return value


def _sync(names: List[str]) -> List[Tuple[str, np.ndarray]]:
    """Sum per-process deltas across hosts and fold into the cumulative
    counters (reference _sync :250).  Collective when process_count > 1."""
    if not names:
        return []
    deltas = np.stack([
        _counters.get(n, np.zeros(_NUM_MOMENTS, np.float64)) for n in names
    ])
    for n in names:
        _counters[n] = np.zeros(_NUM_MOMENTS, np.float64)
    if jax.process_count() > 1:  # pragma: no cover - needs multi-host
        from jax.experimental import multihost_utils

        # float32 on-device transport; counters stay float64 on host
        gathered = multihost_utils.process_allgather(
            deltas.astype(np.float32))
        deltas = np.asarray(gathered, np.float64).sum(axis=0)
    for i, n in enumerate(names):
        if n not in _cumulative:
            _cumulative[n] = np.zeros(_NUM_MOMENTS, np.float64)
        _cumulative[n] += deltas[i]
    return [(n, _cumulative[n]) for n in names]


class Collector:
    """Windowed mean/std view over `report()`ed stats (reference :123)."""

    def __init__(self, regex: str = ".*", keep_previous: bool = True):
        self._regex = re.compile(regex)
        self._keep_previous = keep_previous
        self._cumulative: Dict[str, np.ndarray] = {}
        self._moments: Dict[str, np.ndarray] = {}
        self.update()
        self._moments.clear()

    def names(self):
        return [n for n in _counters if self._regex.fullmatch(n)]

    def update(self):
        if not self._keep_previous:
            self._moments.clear()
        for name, cumulative in _sync(self.names()):
            prev = self._cumulative.get(
                name, np.zeros(_NUM_MOMENTS, np.float64))
            delta = cumulative - prev
            self._cumulative[name] = cumulative.copy()
            if delta[0] != 0:
                self._moments[name] = delta

    def _get_delta(self, name):
        assert self._regex.fullmatch(name)
        return self._moments.get(name, np.zeros(_NUM_MOMENTS, np.float64))

    def num(self, name) -> int:
        return int(self._get_delta(name)[0])

    def mean(self, name) -> float:
        d = self._get_delta(name)
        return float("nan") if d[0] == 0 else float(d[1] / d[0])

    def std(self, name) -> float:
        d = self._get_delta(name)
        if d[0] == 0 or not np.isfinite(d[1]):
            return float("nan")
        if int(d[0]) == 1:
            return 0.0
        mean = d[1] / d[0]
        raw_var = d[2] / d[0]
        return float(np.sqrt(max(raw_var - mean * mean, 0.0)))

    def as_dict(self):
        return {
            name: dict(num=self.num(name), mean=self.mean(name),
                       std=self.std(name))
            for name in self.names()
        }

    def __getitem__(self, name):
        return self.mean(name)
