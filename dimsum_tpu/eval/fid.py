"""Metric math: FID, KID, Inception Score, improved precision/recall.

Reference: `/root/reference/eval_toolbox/pytorch_fid/`
(frechet_inception_distance.py:52-58 sqrtm FID, kernel_inception_distance.py,
inception_score.py, precision_recall.py) -- the StyleGAN-ADA metric suite.

Feature accumulation is streaming (mean / raw second moment), matching
FeatureStats (metric_utils.py:79-160), so 50k x 2048 features never need to
be held when only FID is computed.
"""

from __future__ import annotations

import functools
import sys
from typing import Optional

import numpy as np
import scipy.linalg


class FeatureStats:
    """Streaming feature statistics: raw mean/cov accumulators and an
    optional capped store of raw features (for KID/PR)."""

    def __init__(self, capture_all: bool = False,
                 capture_mean_cov: bool = True,
                 max_items: Optional[int] = None):
        self.capture_all = capture_all
        self.capture_mean_cov = capture_mean_cov
        self.max_items = max_items
        self.num_items = 0
        self.num_features = None
        self.all_features = []
        self.raw_mean = None
        self.raw_cov = None

    def set_num_features(self, num_features: int):
        if self.num_features is None:
            self.num_features = num_features
            self.raw_mean = np.zeros(num_features, np.float64)
            self.raw_cov = np.zeros((num_features, num_features), np.float64)
        else:
            assert num_features == self.num_features

    def is_full(self) -> bool:
        return (self.max_items is not None
                and self.num_items >= self.max_items)

    def append(self, x: np.ndarray):
        x = np.asarray(x, np.float32)
        assert x.ndim == 2
        if self.max_items is not None:
            if self.num_items >= self.max_items:
                return
            x = x[: self.max_items - self.num_items]
        self.set_num_features(x.shape[1])
        self.num_items += x.shape[0]
        if self.capture_all:
            self.all_features.append(x)
        if self.capture_mean_cov:
            x64 = x.astype(np.float64)
            self.raw_mean += x64.sum(axis=0)
            self.raw_cov += x64.T @ x64

    def get_all(self) -> np.ndarray:
        assert self.capture_all
        return np.concatenate(self.all_features, axis=0)

    def get_mean_cov(self):
        assert self.capture_mean_cov and self.num_items > 0
        mean = self.raw_mean / self.num_items
        cov = self.raw_cov / self.num_items - np.outer(mean, mean)
        return mean, cov

    def save(self, path: str):
        state = dict(num_items=self.num_items,
                     raw_mean=self.raw_mean, raw_cov=self.raw_cov,
                     capture_all=self.capture_all)
        if self.capture_all:
            state["all_features"] = self.get_all()
        np.savez_compressed(path, **state)

    @classmethod
    def load(cls, path: str) -> "FeatureStats":
        data = np.load(path, allow_pickle=True)
        obj = cls(capture_all=bool(data["capture_all"]))
        obj.num_items = int(data["num_items"])
        obj.raw_mean = data["raw_mean"]
        obj.raw_cov = data["raw_cov"]
        obj.num_features = obj.raw_mean.shape[0]
        if obj.capture_all and "all_features" in data:
            obj.all_features = [data["all_features"]]
        return obj


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """FID between two Gaussians (reference
    frechet_inception_distance.py:52-58)."""
    m = np.square(mu1 - mu2).sum()
    s = scipy.linalg.sqrtm(np.dot(sigma1, sigma2))
    fid = m + np.trace(sigma1 + sigma2 - s * 2)
    return float(np.real(fid))


def compute_fid(stats_real: FeatureStats, stats_gen: FeatureStats) -> float:
    mu_r, sig_r = stats_real.get_mean_cov()
    mu_g, sig_g = stats_gen.get_mean_cov()
    return frechet_distance(mu_g, sig_g, mu_r, sig_r)


def compute_kid(feats_real: np.ndarray, feats_gen: np.ndarray,
                num_subsets: int = 100, max_subset_size: int = 1000,
                seed: int = 0, impl: str = "auto") -> float:
    """Kernel Inception Distance (reference kernel_inception_distance.py):
    polynomial kernel (x.y/d + 1)^3 averaged over random subsets.

    impl "jax" runs the three m x m kernel matmuls per subset on the
    accelerator (one jitted program, subset indices drawn on host with the
    SAME rng stream as the numpy path); "numpy" is the reference math
    verbatim; "auto" picks jax off-CPU.  Exchange-tested in
    tests/test_pr_jax.py."""
    if impl == "auto":
        import jax

        impl = "jax" if jax.default_backend() != "cpu" else "numpy"
    rng = np.random.default_rng(seed)
    n = feats_real.shape[1]
    m = min(min(feats_real.shape[0], feats_gen.shape[0]), max_subset_size)

    if impl == "jax":
        import jax
        import jax.numpy as jnp

        # all subset indices drawn up front, SAME rng stream as the numpy
        # path (gen rows first, then real, per subset)
        xis = np.empty((num_subsets, m), np.int32)
        yis = np.empty((num_subsets, m), np.int32)
        for i in range(num_subsets):
            xis[i] = rng.choice(feats_gen.shape[0], m, replace=False)
            yis[i] = rng.choice(feats_real.shape[0], m, replace=False)

        # feature matrices MUST be jit arguments, not closed-over device
        # arrays: closures lower as HLO literals, and at 50k x 2048 the
        # ~800 MB compile request kills remote-compile backends (same
        # failure class as the vae/detector trees in sample_ddp.py).  One
        # lax.scan program returns all subset terms in a single call.
        @jax.jit
        def kid_terms(gd, rd, xis_d, yis_d):
            def one(_, ij):
                xi, yi = ij
                x = jnp.take(gd, xi, axis=0)
                y = jnp.take(rd, yi, axis=0)
                dot = lambda a, b: jnp.dot(  # noqa: E731
                    a, b.T, precision="highest",
                    preferred_element_type=jnp.float32)
                a = (dot(x, x) / n + 1) ** 3 + (dot(y, y) / n + 1) ** 3
                b = (dot(x, y) / n + 1) ** 3
                term = ((a.sum() - jnp.trace(a)) / (m - 1)
                        - b.sum() * 2 / m)
                return 0, term
            _, terms = jax.lax.scan(one, 0, (xis_d, yis_d))
            return terms

        # phase prints keep external stall-watchdogs fed: through a
        # remote-device tunnel the two uploads + compile are minutes of
        # legitimate silence, indistinguishable from a hang otherwise
        print("[kid] uploading gen features", file=sys.stderr)
        gd = jax.device_put(feats_gen.astype(np.float32))
        print("[kid] uploading real features", file=sys.stderr)
        rd = jax.device_put(feats_real.astype(np.float32))
        print("[kid] compiling + running subset scan", file=sys.stderr)
        terms = np.asarray(kid_terms(gd, rd,
                                     jnp.asarray(xis), jnp.asarray(yis)))
        print("[kid] done", file=sys.stderr)
        # host fp64 accumulation, same as the numpy path
        return float(terms.astype(np.float64).sum() / num_subsets / m)

    t = 0.0
    for _ in range(num_subsets):
        x = feats_gen[rng.choice(feats_gen.shape[0], m, replace=False)]
        y = feats_real[rng.choice(feats_real.shape[0], m, replace=False)]
        a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
        b = (x @ y.T / n + 1) ** 3
        t += (a.sum() - np.trace(a)) / (m - 1) - b.sum() * 2 / m
    return float(t / num_subsets / m)


def compute_inception_score(probs: np.ndarray, num_splits: int = 10):
    """IS from softmax probabilities (reference inception_score.py)."""
    scores = []
    n = probs.shape[0]
    num_splits = max(1, min(num_splits, n))  # avoid empty splits
    for i in range(num_splits):
        part = probs[i * n // num_splits: (i + 1) * n // num_splits]
        kl = part * (np.log(part + 1e-12)
                     - np.log(np.mean(part, axis=0, keepdims=True) + 1e-12))
        scores.append(np.exp(np.mean(np.sum(kl, axis=1))))
    return float(np.mean(scores)), float(np.std(scores))


def _pairwise_sq_dists(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    aa = np.sum(a ** 2, axis=1, keepdims=True)
    bb = np.sum(b ** 2, axis=1, keepdims=True)
    return np.maximum(aa - 2 * a @ b.T + bb.T, 0.0)


def compute_precision_recall(feats_real: np.ndarray, feats_gen: np.ndarray,
                             nhood_size: int = 3,
                             row_batch: int = 10000,
                             impl: str = "auto"):
    """Improved precision & recall (reference precision_recall.py):
    manifold membership via k-NN radii in feature space.

    impl:
      "numpy" -- the reference math verbatim: row-batched fp64 distance
                 matrices + full sort on host (at 50k x 50k this is hours
                 on one CPU core);
      "jax"   -- chunked fp32 distances on the accelerator: the -2ab term
                 rides the MXU (precision="highest", i.e. fp32-accurate --
                 ABOVE the fp16 the reference uses on GPU,
                 precision_recall.py:57), kth-neighbor via lax.top_k, hit
                 tests fused on device; hours -> minutes at 50k;
      "auto"  -- "jax" whenever a non-CPU backend is available.

    Both impls are exchange-tested on random features
    (tests/test_pr_jax.py)."""
    if impl == "auto":
        import jax

        impl = "jax" if jax.default_backend() != "cpu" else "numpy"
    if impl == "jax":
        # cap the device chunk: 4096 x 50k fp32 distances ~ 800 MB HBM
        return _pr_jax(feats_real, feats_gen, nhood_size,
                       row_batch=min(row_batch, 4096))

    def manifold_radii(feats):
        radii = np.zeros(feats.shape[0], np.float64)
        for i in range(0, feats.shape[0], row_batch):
            d = _pairwise_sq_dists(feats[i: i + row_batch], feats)
            # kth smallest excluding self (distance 0)
            radii[i: i + row_batch] = np.sort(d, axis=1)[:, nhood_size]
        return radii

    def fraction_in_manifold(probes, ref_feats, ref_radii):
        hits = np.zeros(probes.shape[0], bool)
        for i in range(0, probes.shape[0], row_batch):
            d = _pairwise_sq_dists(probes[i: i + row_batch], ref_feats)
            hits[i: i + row_batch] = np.any(d <= ref_radii[None, :], axis=1)
        return float(hits.mean())

    precision = fraction_in_manifold(feats_gen, feats_real,
                                     manifold_radii(feats_real))
    recall = fraction_in_manifold(feats_real, feats_gen,
                                  manifold_radii(feats_gen))
    return precision, recall


def _pr_jax(feats_real, feats_gen, nhood_size: int, row_batch: int):
    """Accelerator path for compute_precision_recall: one jitted program
    per (row chunk, ref set) shape; the python chunk loop costs only
    dispatch.  Padded ref columns are masked to +inf (radii) / radius -1
    (hits) so they can never win."""
    import jax
    import jax.numpy as jnp

    def pad_rows(x, mult):
        n = x.shape[0]
        p = (-n) % mult
        return (np.pad(x, ((0, p), (0, 0))) if p else x), n

    @functools.lru_cache(maxsize=None)
    def radii_fn(k):
        @jax.jit
        def f(rows, feats, valid_cols):
            d = (jnp.sum(rows ** 2, 1, keepdims=True)
                 - 2.0 * jnp.dot(rows, feats.T, precision="highest")
                 + jnp.sum(feats ** 2, 1)[None, :])
            d = jnp.where(jnp.arange(feats.shape[0])[None, :] < valid_cols,
                          jnp.maximum(d, 0.0), jnp.inf)
            # (k+1) smallest per row, ascending; [k] = kth excluding self
            small = -jax.lax.top_k(-d, k + 1)[0]
            return small[:, k]
        return f

    @jax.jit
    def hits_fn(rows, feats, radii, valid_cols):
        d = (jnp.sum(rows ** 2, 1, keepdims=True)
             - 2.0 * jnp.dot(rows, feats.T, precision="highest")
             + jnp.sum(feats ** 2, 1)[None, :])
        d = jnp.maximum(d, 0.0)
        ok = jnp.arange(feats.shape[0])[None, :] < valid_cols
        return jnp.any(ok & (d <= radii[None, :]), axis=1)

    def manifold_radii(feats_np):
        import sys
        import time

        feats, n = pad_rows(feats_np.astype(np.float32), 128)
        print(f"[pr-knn] uploading {feats.shape[0]} features",
              file=sys.stderr)
        dev = jax.device_put(feats)
        print("[pr-knn] radii pass (first call compiles)", file=sys.stderr)
        out = []
        last = time.time()
        for i in range(0, feats.shape[0], row_batch):
            out.append(np.asarray(radii_fn(nhood_size)(
                dev[i: i + row_batch], dev, n)))
            if time.time() - last > 120:  # heartbeat (watchdogs)
                print(f"[pr-knn] radii {i + row_batch}/{feats.shape[0]}",
                      file=sys.stderr)
                last = time.time()
        return dev, n, np.concatenate(out)[:n]

    def fraction(probes_np, ref_dev, ref_n, ref_radii):
        probes, n = pad_rows(probes_np.astype(np.float32), 128)
        print(f"[pr-knn] hit pass over {probes.shape[0]} probes",
              file=sys.stderr)
        pr_dev = jax.device_put(probes)
        radii = np.full(ref_dev.shape[0], -1.0, np.float32)
        radii[:ref_n] = ref_radii
        radii_dev = jax.device_put(radii)
        hits = []
        for i in range(0, probes.shape[0], row_batch):
            hits.append(np.asarray(hits_fn(
                pr_dev[i: i + row_batch], ref_dev, radii_dev, ref_n)))
        return float(np.concatenate(hits)[:n].mean())

    real_dev, real_n, real_radii = manifold_radii(feats_real)
    gen_dev, gen_n, gen_radii = manifold_radii(feats_gen)
    precision = fraction(feats_gen, real_dev, real_n, real_radii)
    recall = fraction(feats_real, gen_dev, gen_n, gen_radii)
    return precision, recall
