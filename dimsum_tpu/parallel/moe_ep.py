"""Expert-parallel MoE FFN: top-1 routing with capacity-based dispatch and
`all_to_all` over a 'model' mesh axis.

The reference's SwitchMLP keeps every expert local
(`/root/reference/dimsum/switch_mlp.py:52-53` -- "no all-to-all anywhere");
SURVEY 2.6 notes the TPU-native EP is a shard_map all-to-all.  This is that:

  * tokens are sharded over 'data', the stacked expert weights over the
    expert axis across 'model' (each device holds E/K experts);
  * each device buckets its local tokens into per-expert capacity slots
    (Switch-Transformer dispatch: position-in-expert one-hots, tokens over
    capacity are dropped and pass through the residual);
  * one all_to_all ships buckets to the experts' owners over ICI, the
    expert FFNs run batched as einsums over the local expert stack, and a
    second all_to_all ships results back.

Exact (drop-free) parity with the dense-local SwitchMLP holds whenever
capacity >= tokens routed to the busiest expert; tests pin this.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def init_expert_params(key, num_experts: int, dim: int, hidden: int,
                       gated: bool = True):
    """Stacked expert FFN weights: shard axis 0 over 'model' for EP."""
    k1, k2, k3 = jax.random.split(key, 3)
    scale_in = 1.0 / math.sqrt(dim)
    scale_h = 1.0 / math.sqrt(hidden)
    w1_out = 2 * hidden if gated else hidden
    return {
        "router": jax.random.normal(k3, (dim, num_experts)) * scale_in,
        "w1": jax.random.normal(k1, (num_experts, dim, w1_out)) * scale_in,
        "w2": jax.random.normal(k2, (num_experts, hidden, dim)) * scale_h,
    }


def _expert_ffn(w1, w2, x, gated: bool):
    """x: (E_local, S, D) through per-expert GLU/GELU FFN."""
    h = jnp.einsum("esd,edh->esh", x, w1)
    if gated:
        a, b = jnp.split(h, 2, axis=-1)
        h = jax.nn.gelu(a, approximate=False) * b
    else:
        h = jax.nn.gelu(h, approximate=False)
    return jnp.einsum("esh,ehd->esd", h, w2)


def _dispatch_top1(xf, logits, num_experts: int, capacity: int,
                   routing_mode: str = "top1"):
    """Switch-Transformer top-1 capacity dispatch (reference routing:
    switch_mlp.py:76-86 -- sinkhorn mode only changes the activation; the
    route_algo is never called in the reference forward).

    Returns (pos1h (T, E, C) dispatch one-hots, max_prob (T,))."""
    if routing_mode == "sinkhorn":
        route = jax.nn.sigmoid(logits)
    else:
        route = jax.nn.softmax(logits, axis=-1)
    max_prob = jnp.max(route, axis=-1)
    max_ind = jnp.argmax(route, axis=-1)
    onehot = jax.nn.one_hot(max_ind, num_experts, dtype=xf.dtype)  # (T, E)
    pos = jnp.cumsum(onehot, axis=0) * onehot                      # 1-based
    keep = (pos > 0) & (pos <= capacity)
    disp = jnp.where(keep, onehot, 0.0)
    pos1h = jax.nn.one_hot((pos - 1).astype(jnp.int32), capacity,
                           dtype=xf.dtype) * disp[..., None]       # (T, E, C)
    return pos1h, max_prob


def switch_ep_gspmd(x, logits, w1, w2, b1=None, b2=None, mesh=None,
                    axis: str = "model", capacity_factor: float = 2.0,
                    gated: bool = True, routing_mode: str = "top1"):
    """GSPMD expert parallelism: capacity dispatch + sharding constraints.

    x: (B, L, D) tokens (shard batch over 'data' outside); logits: (B, L, E)
    router output; w1: (E, D, H'), w2: (E, H, D) stacked expert weights --
    shard axis 0 over `axis`.  Instead of an explicit all_to_all (the
    shard_map path above), the dispatched buckets are annotated with
    `with_sharding_constraint` and XLA inserts the cross-chip exchange.
    Runs unsharded (exact dense-parity) when mesh is None.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    B, L, D = x.shape
    T = B * L
    E = w1.shape[0]
    xf = x.reshape(T, D)
    capacity = max(1, int(math.ceil(T * capacity_factor / E)))
    pos1h, max_prob = _dispatch_top1(xf, logits.reshape(T, E), E, capacity,
                                     routing_mode)

    def shard_e(a):
        if mesh is None:
            return a
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

    buckets = shard_e(jnp.einsum("tec,td->ecd", pos1h, xf))  # (E, C, D)
    h = jnp.einsum("ecd,edh->ech", buckets, shard_e(w1))
    if b1 is not None:
        h = h + shard_e(b1)[:, None, :]
    if gated:
        a, b = jnp.split(h, 2, axis=-1)
        h = jax.nn.gelu(a, approximate=False) * b
    else:
        h = jax.nn.gelu(h, approximate=False)
    eout = jnp.einsum("ech,ehd->ecd", h, shard_e(w2))
    if b2 is not None:
        eout = eout + shard_e(b2)[:, None, :]
    eout = shard_e(eout)
    out = jnp.einsum("tec,ecd->td", pos1h, eout) * max_prob[:, None]
    return out.reshape(B, L, D)


def stack_expert_params(switch_params):
    """Convert the dense-path SwitchMLP param tree
    (local_experts_{i}/linear_fc{1,2}) into the stacked (E, ...) arrays the
    EP paths consume.  Used for tests and for loading dense checkpoints
    into EP-sharded models."""
    idx = sorted(int(k.split("_")[-1]) for k in switch_params
                 if k.startswith("local_experts_"))
    w1 = jnp.stack([switch_params[f"local_experts_{i}"]["linear_fc1"]["kernel"]
                    for i in idx])
    w2 = jnp.stack([switch_params[f"local_experts_{i}"]["linear_fc2"]["kernel"]
                    for i in idx])
    out = {"w1": w1, "w2": w2}
    fc1 = switch_params[f"local_experts_{idx[0]}"]["linear_fc1"]
    if "bias" in fc1:
        out["b1"] = jnp.stack(
            [switch_params[f"local_experts_{i}"]["linear_fc1"]["bias"]
             for i in idx])
        out["b2"] = jnp.stack(
            [switch_params[f"local_experts_{i}"]["linear_fc2"]["bias"]
             for i in idx])
    return out


def switch_ep_apply(params, x, axis_name: Optional[str] = None,
                    capacity_factor: float = 2.0, gated: bool = True,
                    routing_mode: str = "top1"):
    """Top-1 MoE FFN.  x: (B, L, D).

    With axis_name=None: single-device capacity dispatch (all experts
    local).  With axis_name set (inside shard_map): params['w1'/'w2'] hold
    only this device's expert slice; dispatch crosses the mesh via
    all_to_all.
    """
    B, L, D = x.shape
    T = B * L
    xf = x.reshape(T, D)
    k = lax.axis_size(axis_name) if axis_name else 1
    e_local = params["w1"].shape[0]
    E = e_local * k

    logits = xf @ params["router"]
    capacity = max(1, int(math.ceil(T * capacity_factor / E)))
    pos1h, max_prob = _dispatch_top1(xf, logits, E, capacity, routing_mode)

    buckets = jnp.einsum("tec,td->ecd", pos1h, xf)               # (E, C, D)

    if axis_name:
        # ship each expert's bucket to its owner; receive all devices'
        # buckets for the local experts
        buckets = buckets.reshape(k, e_local, capacity, D)
        recv = lax.all_to_all(buckets, axis_name, split_axis=0,
                              concat_axis=0, tiled=False)
        # (k_src, E_local, C, D) -> (E_local, k_src * C, D)
        expert_in = recv.transpose(1, 0, 2, 3).reshape(
            e_local, k * capacity, D)
    else:
        expert_in = buckets

    expert_out = _expert_ffn(params["w1"], params["w2"], expert_in, gated)

    if axis_name:
        back = expert_out.reshape(e_local, k, capacity, D).transpose(
            1, 0, 2, 3)
        out_buckets = lax.all_to_all(back, axis_name, split_axis=0,
                                     concat_axis=0, tiled=False)
        out_buckets = out_buckets.reshape(E, capacity, D)
    else:
        out_buckets = expert_out

    out = jnp.einsum("tec,ecd->td", pos1h, out_buckets)
    out = out * max_prob[:, None]
    return out.reshape(B, L, D)
