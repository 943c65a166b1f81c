"""Cross-process combination of metric feature statistics.

Reference: the eval toolbox shards detector inference across ranks with a
rank-strided loader and reassembles features by cross-rank broadcast
(`/root/reference/eval_toolbox/pytorch_fid/metric_utils.py:271-279` the
`item_subset` loader, `:116-126` the interleave; per-rank process spawning
in `calc_metrics.py:205-210`).

TPU-native version: each process accumulates a `FeatureStats` over its own
CONTIGUOUS slice of the work (samples it generated / its shard of the real
dataset), then one variable-length allgather combines them.  The streaming
moments are additive ([num, sum(x), sum(x^T x)]) and raw features
concatenate in process order -- contiguous slices in rank order reproduce
the single-process item order exactly, so KID's subset RNG and
precision/recall see identical inputs (asserted by
tests/test_dist_metrics.py against a single-process run).

Transport: the per-rank payload is pickled and gathered as padded uint8
through `multihost_utils.process_allgather` -- bit-exact for the fp64
moment accumulators (no dtype squeeze through the x32 device path) and
naturally handles ragged per-rank feature counts.  Volume matches the
reference's own rank-by-rank feature broadcast.
"""

from __future__ import annotations

import pickle
from typing import List

import numpy as np

from dimsum_tpu.eval.fid import FeatureStats

__all__ = ["allgather_bytes", "combine_feature_stats",
           "merge_feature_stats"]


def merge_feature_stats(parts: List[FeatureStats]) -> FeatureStats:
    """Merge partial FeatureStats (one per contiguous slice, in slice
    order): moments add, raw features concatenate.  The result is
    item-order-identical to a single pass over the concatenated slices."""
    out = FeatureStats(
        capture_all=any(p.capture_all for p in parts),
        capture_mean_cov=all(p.capture_mean_cov for p in parts))
    for p in parts:
        if p.num_items == 0:
            continue
        out.set_num_features(p.num_features)
        out.num_items += int(p.num_items)
        if out.capture_mean_cov:
            out.raw_mean += p.raw_mean
            out.raw_cov += p.raw_cov
        if out.capture_all:
            out.all_features.append(p.get_all())
    return out


def allgather_bytes(payload: bytes) -> List[bytes]:
    """Gather one variable-length byte string per jax process; every
    process returns the full list in process order."""
    import jax

    if jax.process_count() == 1:
        return [payload]
    from jax.experimental import multihost_utils

    arr = np.frombuffer(payload, np.uint8)
    lens = np.asarray(multihost_utils.process_allgather(
        np.array([arr.size], np.int32))).reshape(-1)
    padded = np.zeros(int(lens.max()), np.uint8)
    padded[: arr.size] = arr
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(len(lens), -1)
    return [gathered[i, : int(lens[i])].tobytes() for i in range(len(lens))]

def combine_feature_stats(stats: FeatureStats) -> FeatureStats:
    """Combine each process's partial FeatureStats into the global stats.

    Collective: every process must call it; every process returns the same
    combined object.  Single-process: identity."""
    import jax

    if jax.process_count() == 1:
        return stats
    state = dict(
        num_items=stats.num_items,
        raw_mean=stats.raw_mean, raw_cov=stats.raw_cov,
        all_features=(stats.get_all() if stats.capture_all
                      and stats.num_items > 0 else None),
    )
    payloads = allgather_bytes(pickle.dumps(state, protocol=4))
    parts = []
    for blob in payloads:  # process order == contiguous-slice order
        d = pickle.loads(blob)
        p = FeatureStats(capture_all=stats.capture_all,
                         capture_mean_cov=stats.capture_mean_cov)
        if d["num_items"]:
            p.set_num_features(d["raw_mean"].shape[0])
            p.num_items = int(d["num_items"])
            p.raw_mean, p.raw_cov = d["raw_mean"], d["raw_cov"]
            if p.capture_all and d["all_features"] is not None:
                p.all_features = [d["all_features"]]
        parts.append(p)
    return merge_feature_stats(parts)
