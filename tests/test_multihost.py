"""Multi-host execution test: 2 real processes on CPU.

Launches train.py twice via subprocess with jax.distributed.initialize
(localhost coordinator, 4 virtual CPU devices per process = 8 global),
trains 2 steps on a shared tiny latent dataset, and asserts the final
checkpointed params match a single-process 8-device run exactly (the
reference's torchrun DDP contract, /root/reference/dimsum/train.py:145,259:
rank-sharded loading + gradient allreduce must be placement-invariant).
"""

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


def _make_dataset(tmp_path, n=16):
    shape = (4, 8, 8)
    feats = np.memmap(tmp_path / "latents.dat", np.float32, mode="w+",
                      shape=(n, *shape))
    labels = np.memmap(tmp_path / "labels.dat", np.int64, mode="w+",
                       shape=(n,))
    rng = np.random.default_rng(0)
    feats[:] = rng.standard_normal((n, *shape)).astype(np.float32)
    labels[:] = rng.integers(0, 4, n)
    feats.flush()
    labels.flush()


def _train_args(tmp_path, exp, extra):
    return ["train.py", "--exp", exp, "--results-dir",
            str(tmp_path / "results"),
            "--model", "DiM-S/2", "--image-size", "64", "--num-classes",
            "4", "--dataset", "latent_memmap", "--datadir", str(tmp_path),
            "--global-batch-size", "16", "--epochs", "1",
            "--block-type", "combined", "--bimamba-type", "none",
            "--cond-mamba", "--rms-norm", "--learnable-pe",
            "--use-attn-every-k-layers", "2", "--log-every", "1",
            "--save-content-every", "1", "--plot-every", "99",
            "--ckpt-every", "99", "--num-workers", "0"] + extra


def _env(n_local_devices):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={n_local_devices}",
        DIMSUM_JAX_CACHE="0")
    return env


def _restore_params(content_dir):
    import jax
    import orbax.checkpoint as ocp

    # numpy-template restore: read host arrays regardless of the device
    # mesh the checkpoint was saved from (the multi-process run stamps
    # multihost device ids into the sharding metadata, which cannot be
    # reconstructed in this single-process comparator)
    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.join(os.path.abspath(str(content_dir)), "2", "default")
    assert os.path.isdir(path), f"expected step-2 checkpoint at {path}"
    tree = ckptr.metadata(path).item_metadata.tree
    is_meta = lambda x: hasattr(x, "shape") and hasattr(x, "dtype")  # noqa: E731
    template = jax.tree.map(lambda m: np.zeros(m.shape, m.dtype), tree,
                            is_leaf=is_meta)
    rargs = jax.tree.map(lambda a: ocp.RestoreArgs(restore_type=np.ndarray),
                         template)
    state = ckptr.restore(path, item=template, restore_args=rargs)
    assert int(np.asarray(state["step"])) == 2
    return state["params"], state["ema_params"]


@pytest.mark.slow
def test_two_process_train_matches_single_process(tmp_path):
    _make_dataset(tmp_path)

    # single process, 8 virtual devices
    r = subprocess.run(
        [sys.executable] + _train_args(tmp_path, "single", []),
        cwd=REPO, env=_env(8), capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, f"single: {r.stdout[-2000:]}\n{r.stderr[-2000:]}"

    # two processes x 4 local devices = the same 8-device global mesh
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable] + _train_args(
                tmp_path, "multi",
                ["--num-processes", "2", "--process-id", str(i),
                 "--coordinator", f"localhost:{port}"]),
            cwd=REPO, env=_env(4), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=1200) for p in procs]
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"proc {i}: {out[-2000:]}\n{err[-2000:]}")

    # rank 0 wrote the log; rank 1 must not have duplicated file logging
    log = (tmp_path / "results" / "multi" / "log.txt").read_text()
    assert "multi-host: process 0/2" in log
    assert log.count("beginning epoch 0") == 1

    p_single, ema_single = _restore_params(
        tmp_path / "results" / "single" / "content")
    p_multi, ema_multi = _restore_params(
        tmp_path / "results" / "multi" / "content")

    import jax

    flat_s = jax.tree_util.tree_leaves_with_path(p_single)
    flat_m = dict(jax.tree_util.tree_leaves_with_path(p_multi))
    assert len(flat_s) == len(flat_m)
    for path, a in flat_s:
        b = flat_m[path]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5,
            err_msg=f"param mismatch at {path}")
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ema_single),
            jax.tree_util.tree_leaves_with_path(ema_multi)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=1e-5,
                                   err_msg=f"ema mismatch at {pa}")
