"""In-training eval helpers: device residency + caching semantics.

The r4 overfit run was oom-killed by its own in-training evals: the jitted
sampler re-uploaded the ema/vae param trees host->device on EVERY gen batch
(jax keeps no committed buffer for numpy args), and each eval rebuilt the
detector (a fresh InceptionV3 compile).  These tests pin the fixed
contract: one upload per eval, one detector per run.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import train as train_mod


def test_eval_dev_params_uploads_once_and_evicts_stale():
    train_mod._EVAL_DEV_CACHE.clear()
    tree1 = {"w": np.ones((4, 4), np.float32)}
    out1 = train_mod._eval_dev_params("vae", tree1)
    assert isinstance(out1["w"], jax.Array)
    # same tree identity -> the SAME device copy (no re-upload)
    assert train_mod._eval_dev_params("vae", tree1)["w"] is out1["w"]

    # a new tree under the same tag replaces the old entry (no growth)
    tree2 = {"w": np.zeros((4, 4), np.float32)}
    out2 = train_mod._eval_dev_params("vae", tree2)
    keys = [k for k in train_mod._EVAL_DEV_CACHE if k[0] == "vae"]
    assert len(keys) == 1
    np.testing.assert_array_equal(np.asarray(out2["w"]), 0.0)
    train_mod._EVAL_DEV_CACHE.clear()


def test_eval_ema_params_reshards_to_one_local_device():
    class FakeState:
        ema_params = {"k": jnp.arange(8.0).reshape(2, 4)}

    out = train_mod._eval_ema_params(FakeState())
    leaf = out["k"]
    assert len(leaf.devices()) == 1
    assert next(iter(leaf.devices())) == jax.local_devices()[0]
    np.testing.assert_array_equal(np.asarray(leaf),
                                  np.arange(8.0).reshape(2, 4))


def test_eval_ema_params_handles_mesh_sharded_state():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()[:4]
    mesh = Mesh(np.array(devs), ("data",))
    arr = jax.device_put(jnp.arange(16.0).reshape(4, 4),
                         NamedSharding(mesh, P("data", None)))

    class FakeState:
        ema_params = {"k": arr}

    out = train_mod._eval_ema_params(FakeState())
    assert len(out["k"].devices()) == 1
    np.testing.assert_array_equal(np.asarray(out["k"]),
                                  np.arange(16.0).reshape(4, 4))
