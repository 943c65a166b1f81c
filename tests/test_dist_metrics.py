"""Rank-sharded metric feature pipeline (eval/dist_stats.py).

Reference behavior: the eval toolbox shards detector inference across ranks
and reassembles features by broadcast
(`/root/reference/eval_toolbox/pytorch_fid/metric_utils.py:271-279,116-126`).
Here: (1) merge math in-process -- partial FeatureStats over contiguous
slices merge into stats identical to one full pass; (2) two REAL processes
running calc_metrics.py produce fid/kid/pr identical to the single-process
run over the same folders (the test_multihost.py pattern)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_merge_feature_stats_matches_single_pass():
    from dimsum_tpu.eval.dist_stats import merge_feature_stats
    from dimsum_tpu.eval.fid import (
        FeatureStats, compute_fid, compute_kid, compute_precision_recall)

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((97, 16)).astype(np.float32)
    ref_feats = rng.standard_normal((83, 16)).astype(np.float32) + 0.1

    def full_pass(x):
        s = FeatureStats(capture_all=True)
        for i in range(0, len(x), 10):
            s.append(x[i: i + 10])
        return s

    def sharded(x, world):
        parts = []
        for r in range(world):
            lo, hi = r * len(x) // world, (r + 1) * len(x) // world
            p = FeatureStats(capture_all=True)
            for i in range(lo, hi, 7):  # different batch size per pass
                p.append(x[i: min(i + 7, hi)])
            parts.append(p)
        return merge_feature_stats(parts)

    single, merged = full_pass(feats), sharded(feats, 3)
    assert merged.num_items == single.num_items
    # identical item ORDER (KID's subset RNG / feature-level equality)
    np.testing.assert_array_equal(merged.get_all(), single.get_all())
    ms, cs = single.get_mean_cov()
    mm, cm = merged.get_mean_cov()
    np.testing.assert_allclose(mm, ms, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(cm, cs, rtol=1e-9, atol=1e-12)

    real_single, real_merged = full_pass(ref_feats), sharded(ref_feats, 2)
    fid_s = compute_fid(real_single, single)
    fid_m = compute_fid(real_merged, merged)
    assert abs(fid_s - fid_m) < 1e-8 * max(1.0, abs(fid_s))
    kid_s = compute_kid(real_single.get_all(), single.get_all())
    kid_m = compute_kid(real_merged.get_all(), merged.get_all())
    assert kid_s == kid_m  # identical fp32 features, identical subset RNG
    pr_s = compute_precision_recall(real_single.get_all(), single.get_all())
    pr_m = compute_precision_recall(real_merged.get_all(), merged.get_all())
    assert pr_s == pr_m


def _make_folder(path, n, seed, size=32):
    from PIL import Image

    rng = np.random.default_rng(seed)
    path.mkdir()
    for i in range(n):
        arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(path / f"{i:03d}.png")


def _env(n_local_devices=1):
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               XLA_FLAGS=f"--xla_force_host_platform_device_count"
                         f"={n_local_devices}",
               DIMSUM_JAX_CACHE="0")
    return env


def _parse_metrics(stdout):
    out = {}
    for line in stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            rec = json.loads(line)
            out.update(rec["results"])
    return out


@pytest.mark.slow
def test_two_process_calc_metrics_matches_single(tmp_path):
    """calc_metrics.py with --num-processes 2: both the real and generated
    folders shard across two REAL processes; fid/kid/pr must equal the
    single-process run (same inputs, contiguous slices reassembled in rank
    order)."""
    real, gen = tmp_path / "real", tmp_path / "gen"
    _make_folder(real, 25, seed=1)   # odd count: uneven shards
    _make_folder(gen, 21, seed=2)
    metrics = "fid2k_full,kid50k_full,pr50k3_full"

    base = ["calc_metrics.py", "--metrics", metrics,
            "--real-dir", str(real), "--gen-dir", str(gen),
            "--image-size", "32", "--batch-size", "8"]

    # single process (its own stats cache so nothing is shared)
    r = subprocess.run(
        [sys.executable] + base + ["--cache-dir", str(tmp_path / "c1")],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    single = _parse_metrics(r.stdout)
    assert single, r.stdout

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable] + base
            + ["--cache-dir", str(tmp_path / "c2"),
               "--num-processes", "2", "--process-id", str(i),
               "--coordinator", f"localhost:{port}"],
            cwd=REPO, env=_env(), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}: {out[-2000:]}\n{err[-2000:]}"
    multi = _parse_metrics(outs[0][0])  # rank 0 reports
    assert not _parse_metrics(outs[1][0]), "rank 1 must not report metrics"

    assert set(multi) == set(single)
    for k in single:
        # moments re-sum across ranks in a different fp64 order -> allclose;
        # kid/pr recompute from IDENTICAL fp32 features -> tight too
        np.testing.assert_allclose(
            multi[k], single[k], rtol=1e-9, atol=1e-9,
            err_msg=f"metric {k}: single={single[k]} multi={multi[k]}")

    # rank 0 wrote the combined real-side stats cache
    assert list((tmp_path / "c2").glob("*.npz"))


@pytest.mark.slow
def test_two_process_sample_ddp_streaming(tmp_path):
    """sample_ddp.py --eval-streaming with --num-processes 2 (the lifted
    single-process restriction): each rank generates its slice, features
    allgather, rank 0 reports finite fid/kid/pr, zero PNGs written."""
    real = tmp_path / "real"
    _make_folder(real, 12, seed=3, size=64)
    out = tmp_path / "gen"

    port = _free_port()
    args = ["sample_ddp.py", "ODE", "--model", "DiM-S/2",
            "--image-size", "64", "--num-classes", "4",
            "--block-type", "combined", "--bimamba-type", "none",
            "--cond-mamba", "--rms-norm", "--learnable-pe",
            "--use-attn-every-k-layers", "2",
            "--sampling-method", "euler", "--num-sampling-steps", "2",
            "--per-proc-batch-size", "4", "--num-fid-samples", "8",
            "--vae-ckpt", "random", "--sample-dir", str(out),
            "--eval-refdir", str(real), "--eval-streaming",
            "--eval-metric", "fid2k_full,kid50k_full,pr50k3_full"]
    procs = [
        subprocess.Popen(
            [sys.executable] + args
            + ["--num-processes", "2", "--process-id", str(i),
               "--coordinator", f"localhost:{port}"],
            cwd=REPO, env=_env(), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900) for p in procs]
    for i, (p, (o, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}: {o[-2000:]}\n{err[-2000:]}"

    assert not list(out.glob("*.png"))
    results = _parse_metrics(outs[0][0])
    for k in ("fid2k_full", "kid50k_full",
              "pr50k3_full_precision", "pr50k3_full_recall"):
        assert k in results and np.isfinite(results[k]), (k, results)
    assert not _parse_metrics(outs[1][0])
