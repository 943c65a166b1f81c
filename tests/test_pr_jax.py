"""Accelerator precision/recall path (eval/fid.py::_pr_jax) vs the
reference numpy math (reference precision_recall.py k-NN manifold), on
uneven, non-128-aligned counts."""

import numpy as np

from dimsum_tpu.eval.fid import compute_precision_recall


def test_pr_jax_matches_numpy():
    rng = np.random.default_rng(0)
    # overlapping but distinct clouds so precision/recall land strictly
    # inside (0, 1) and both hit branches are exercised
    real = rng.standard_normal((1203, 48)).astype(np.float32)
    gen = (0.8 * rng.standard_normal((911, 48)) + 0.7).astype(np.float32)

    p_np, r_np = compute_precision_recall(real, gen, impl="numpy")
    p_jx, r_jx = compute_precision_recall(real, gen, impl="jax",
                                          row_batch=256)
    assert 0.0 < p_np < 1.0 and 0.0 < r_np < 1.0
    # fp32 distances vs fp64: identical unless a pair sits within float
    # rounding of a manifold radius (measure-zero for gaussian clouds)
    assert abs(p_jx - p_np) < 1e-9, (p_jx, p_np)
    assert abs(r_jx - r_np) < 1e-9, (r_jx, r_np)


def test_pr_jax_row_chunking_invariance():
    rng = np.random.default_rng(1)
    real = rng.standard_normal((300, 16)).astype(np.float32)
    gen = rng.standard_normal((257, 16)).astype(np.float32) + 0.3
    a = compute_precision_recall(real, gen, impl="jax", row_batch=64)
    b = compute_precision_recall(real, gen, impl="jax", row_batch=4096)
    assert a == b


def test_kid_jax_matches_numpy():
    from dimsum_tpu.eval.fid import compute_kid

    rng = np.random.default_rng(3)
    real = rng.standard_normal((700, 64)).astype(np.float32)
    gen = (rng.standard_normal((650, 64)) * 1.1 + 0.2).astype(np.float32)
    k_np = compute_kid(real, gen, num_subsets=20, max_subset_size=300,
                       impl="numpy")
    k_jx = compute_kid(real, gen, num_subsets=20, max_subset_size=300,
                       impl="jax")
    # same rng stream -> same subsets; fp32 matmul sum-order only
    assert abs(k_jx - k_np) < 1e-6 + 1e-4 * abs(k_np), (k_jx, k_np)
