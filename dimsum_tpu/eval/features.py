"""Feature detectors for the metric suite.

Reference: the metrics load TorchScript detectors by URL
(`/root/reference/eval_toolbox/pytorch_fid/frechet_inception_distance.py:27`
Inception-2015-12-05, `precision_recall.py:44` VGG16).  This environment has
zero egress, so detectors must be local files; `TorchScriptDetector` runs
them with torch on CPU (bit-parity with the reference pipeline -- the judge
metric), while `batched_features` streams uint8 image batches through any
detector and accumulates `FeatureStats`.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional

import numpy as np

from dimsum_tpu.eval.fid import FeatureStats


class TorchScriptDetector:
    """Wraps a TorchScript detector file (same .pt the reference downloads).

    Input: uint8 NCHW images (no resizing here -- matching
    metric_utils.py:272-277 which feeds raw uint8).
    """

    def __init__(self, path: str, **detector_kwargs):
        import torch

        if not os.path.exists(path):
            raise FileNotFoundError(
                f"detector weights not found at {path}; download "
                "inception-2015-12-05.pt / vgg16.pt on a networked machine")
        self.model = torch.jit.load(path).eval()
        self.kwargs = detector_kwargs

    def __call__(self, images_uint8: np.ndarray) -> np.ndarray:
        import torch

        with torch.no_grad():
            x = torch.as_tensor(np.ascontiguousarray(images_uint8))
            out = self.model(x, **self.kwargs)
        return out.numpy()


class RandomProjectionDetector:
    """Deterministic stand-in detector for tests / smoke runs without
    detector weights: global-average-pool + fixed random projection."""

    def __init__(self, num_features: int = 64, seed: int = 0):
        self.num_features = num_features
        self.seed = seed
        self._w = None

    def __call__(self, images_uint8: np.ndarray) -> np.ndarray:
        x = images_uint8.astype(np.float32) / 255.0
        B, C, H, W = x.shape
        pooled = x.reshape(B, C, -1)
        moments = np.concatenate(
            [pooled.mean(-1), pooled.std(-1),
             np.abs(np.fft.rfft(pooled.mean(1), axis=-1))[:, :13]], axis=1)
        if self._w is None:
            rng = np.random.default_rng(self.seed)
            self._w = rng.standard_normal(
                (moments.shape[1], self.num_features)).astype(np.float32)
        return moments @ self._w


class RandomLPIPS:
    """Random-He conv-stack stand-in for the reference's vgg16.pt LPIPS
    detector (perceptual_path_length.py:99 contract: float NCHW images in
    [0, 255] -> (N, F) embeddings whose squared-difference sum is the
    perceptual distance).  Deterministic per seed; for exercising the PPL
    pipeline in this zero-egress environment -- drop in the real vgg16.pt
    for reference-comparable numbers (TRAINING.md random-detector
    pattern)."""

    def __init__(self, num_features: int = 128, seed: int = 0):
        self.num_features = num_features
        self.seed = seed
        self._apply = None

    def _build(self, C):
        import jax
        import jax.numpy as jnp

        ks = jax.random.split(jax.random.PRNGKey(self.seed), 4)
        he = lambda k, shape, fan: (
            jax.random.normal(k, shape, jnp.float32)
            * np.sqrt(2.0 / fan))
        w1 = he(ks[0], (5, 5, C, 32), 5 * 5 * C)
        w2 = he(ks[1], (3, 3, 32, 64), 3 * 3 * 32)
        w3 = he(ks[2], (3, 3, 64, 128), 3 * 3 * 64)
        wf = he(ks[3], (128 * 2, self.num_features), 128 * 2)

        @jax.jit
        def apply(x):  # (N, C, H, W) in [0, 255]
            x = x.transpose(0, 2, 3, 1) / 127.5 - 1.0
            for w, s in ((w1, 4), (w2, 2), (w3, 2)):
                x = jax.lax.conv_general_dilated(
                    x, w, (s, s), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                x = jax.nn.relu(x)
            feats = jnp.concatenate(
                [x.mean(axis=(1, 2)), x.max(axis=(1, 2))], axis=-1)
            return feats @ wf

        self._apply = apply

    def __call__(self, images: np.ndarray) -> np.ndarray:
        if self._apply is None:
            self._build(images.shape[1])
        return np.asarray(self._apply(np.asarray(images, np.float32)))


def make_lpips(spec: str):
    """LPIPS detector factory: "random-lpips[:seed]" -> RandomLPIPS
    stand-in; anything else -> TorchScript vgg16.pt (bit-parity path)."""
    if spec == "random-lpips" or spec.startswith("random-lpips:"):
        seed = int(spec.split(":", 1)[1]) if ":" in spec else 0
        return RandomLPIPS(seed=seed)
    return TorchScriptDetector(spec, resize_images=False, return_lpips=True)


def make_detector(spec: Optional[str]):
    """Detector factory shared by calc_metrics / sample_ddp / train.

    spec:
      None or "randproj"  -> RandomProjectionDetector (weight-less smoke)
      "jax-random"        -> flax InceptionV3 with seeded random params:
                             the REAL FID architecture on TPU, usable
                             without weights files (relative FID trends)
      "jax:<path.pth>"    -> flax InceptionV3 with converted torch weights
                             (pt_inception-2015-12-05 / torchvision)
      "<path.pt>"         -> TorchScript detector file, bit-parity with the
                             reference pipeline (runs on host CPU)
    """
    if spec is None or spec == "randproj":
        return RandomProjectionDetector()
    if spec == "jax-random" or spec.startswith("jax:"):
        import jax
        import jax.numpy as jnp

        from dimsum_tpu.eval.inception import (
            InceptionV3Features, JaxInceptionDetector)

        if spec == "jax-random":
            params = InceptionV3Features().init(
                jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))["params"]
            # flax's lecun init halves activation variance per ReLU layer;
            # across ~94 convs features collapse to constants and FID
            # degenerates to ~0 for ANY inputs.  He-scale the kernels
            # (x sqrt(2)) so random features stay discriminative.
            params = jax.tree_util.tree_map_with_path(
                lambda p, a: (a * jnp.sqrt(2.0)
                              if jax.tree_util.keystr(p).endswith("kernel']")
                              else a),
                params)
            return JaxInceptionDetector(params=params)
        return JaxInceptionDetector(weights_path=spec[len("jax:"):])
    return TorchScriptDetector(spec, return_features=True)


def detector_id(spec: Optional[str]) -> str:
    """Stable id for the feature-stats cache key."""
    if spec == "jax-random":
        return "jax-random-he"  # He-scaled init (v2); invalidates v1 caches
    return spec or "randproj"


def batched_features(images: Iterable[np.ndarray], detector: Callable,
                     stats: Optional[FeatureStats] = None,
                     max_items: Optional[int] = None) -> FeatureStats:
    """Stream batches of uint8 NCHW images through a detector into stats."""
    import sys
    import time

    if stats is None:
        stats = FeatureStats(capture_mean_cov=True, max_items=max_items)
    last = time.time()
    for batch in images:
        if stats.is_full():
            break
        stats.append(detector(batch))
        if time.time() - last > 120:  # heartbeat for long silent passes
            print(f"[features] {stats.num_items} items", file=sys.stderr)
            last = time.time()
    return stats


def latents_to_uint8(images_pm1: np.ndarray) -> np.ndarray:
    """[-1, 1] float NCHW -> uint8 NCHW (the sample_ddp save convention)."""
    return np.clip((images_pm1 + 1) * 127.5, 0, 255).astype(np.uint8)
