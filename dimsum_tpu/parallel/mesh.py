"""Device mesh construction and sharding rules.

The reference's only distribution strategy is DDP over NCCL
(`/root/reference/dimsum/train.py:145,180`).  The TPU-native equivalents:

  * data parallelism: a 1-D "data" mesh axis; the train/sample step runs
    under `shard_map` so the Pallas kernels stay single-device-local and
    gradients are reduced with one `psum` over ICI.
  * tensor parallelism (optional, not needed for 460M parity): a "model"
    axis with GSPMD parameter annotations; XLA inserts the collectives.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host initialization (the reference's init_process_group
    equivalent, train.py:145).  One call per host; collectives then ride
    ICI within a slice and DCN across slices.  Returns the process index.
    No-op on single-host setups.

    On TPU pods `num_processes`/`process_id` may be omitted (auto-detected
    from the TPU environment, like torchrun's env:// rendezvous); on
    CPU/GPU pass them explicitly per process."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return jax.process_index()


def host_local_to_global(mesh: Mesh, spec, *arrays):
    """Assemble global arrays from per-process local pieces.

    Each process passes the rows IT loaded (its Loader shard / its slice of
    the per-shard key array); the pieces concatenate along the sharded axis
    in process order (the mesh is built from `jax.devices()`, which orders
    devices by process index).  Single-process: a plain sharded device_put.
    """
    if jax.process_count() == 1:
        sh = NamedSharding(mesh, spec)
        out = tuple(jax.device_put(a, sh) for a in arrays)
    else:
        from jax.experimental import multihost_utils

        out = tuple(
            multihost_utils.host_local_array_to_global_array(a, mesh, spec)
            for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_to_mesh(tree, mesh: Mesh):
    """Place an identical-on-every-process host pytree as globally
    replicated jax.Arrays on the mesh (each process fills its addressable
    shards from its local copy; no cross-host transfer)."""
    sh = NamedSharding(mesh, P())

    def put(a):
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, sh,
                                            lambda idx: a[idx])

    return jax.tree.map(put, tree)


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh.  data=None uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def make_seq_mesh(data: int = 1, seq: Optional[int] = None,
                  devices=None) -> Mesh:
    """(data, seq) mesh for sequence parallelism (DiMConfig.seq_axis="seq"):
    batch over 'data', the token axis of every mixer's conv+scan over 'seq'
    (halo + two-pass state exchange over ICI). For L=1024+ configs."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if seq is None:
        seq = n // data
    assert data * seq == n, f"{data}x{seq} != {n} devices"
    return Mesh(np.asarray(devices).reshape(data, seq),
                axis_names=("data", "seq"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Tensor-parallel parameter rules (GSPMD path)
# ---------------------------------------------------------------------------

# path-regex -> PartitionSpec. Column-parallel projections shard the output
# feature dim; row-parallel shard the input dim (their matmuls then reduce
# over 'model' via an XLA-inserted psum).
_TP_RULES = [
    (r".*in_proj.*kernel", P(None, "model")),
    (r".*(x_proj|out_proj).*kernel", P("model", None)),
    (r".*conv1d.*kernel", P("model", None)),
    (r".*dt_proj.*kernel", P(None, "model")),
    (r".*dt_proj.*bias", P("model")),
    (r".*A(_b)?_log", P("model", None)),
    (r".*D(_b)?$", P("model")),
    (r".*w12.*kernel", P(None, "model")),
    (r".*w3.*kernel", P("model", None)),
    (r".*(qkv|qkv1|qkv2).*kernel", P(None, "model")),
    (r".*linear_fc1.*kernel", P(None, "model")),
    (r".*linear_fc2.*kernel", P("model", None)),
    # stacked MoE experts (EP): shard the expert axis
    (r".*experts_fc[12]_(kernel|bias)", P("model")),
]


def tp_param_specs(params) -> Dict:
    """PartitionSpec pytree for tensor-parallel parameter placement."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        for pattern, spec in _TP_RULES:
            if re.match(pattern, name):
                return spec
        return P()

    specs = {tuple(p): spec_for(p) for p, _ in flat}

    def lookup(path, leaf):
        return specs[tuple(path)]

    return jax.tree_util.tree_map_with_path(lookup, params)


def tp_shardings(mesh: Mesh, params):
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        tp_param_specs(params),
                        is_leaf=lambda x: isinstance(x, P))
