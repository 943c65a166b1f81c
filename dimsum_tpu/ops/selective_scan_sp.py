"""Sequence-parallel selective scan: shard L across chips.

The reference's long-sequence story is a single-device chunked kernel
(SURVEY 2.6: "cross-chip sequence sharding possible by carrying
(A-product, state) pairs over ICI").  This implements exactly that, the
TPU way, for use inside `shard_map` with the sequence axis sharded:

  1. local pass: each shard scans its L-slice from h0 = 0, emitting its
     final state h_last; the shard's total decay A-product needs no scan at
     all -- it is exp(A * sum_t dt'_t).
  2. one small all_gather of (a_prod, h_last) summaries ((K, B, D, N),
     kilobytes) rides ICI; an exclusive fold gives each shard its true
     incoming state h0_k = sum_{j<k} (prod_{j<i<k} a_i) h_j.
  3. second local pass seeded with h0_k produces exact outputs.

Cost: 2x local scan compute + one tiny collective -- the standard price for
turning a sequential recurrence into a two-level scan across devices.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from dimsum_tpu.ops.selective_scan import (
    _pallas_supported,
    _selective_scan_pallas_fwd_impl,
    selective_scan_xla,
)


def _local_scan(u, dt, A, B, C, D, z, bias, softplus, h0, want_last,
                impl: Optional[str]):
    if impl == "pallas" or (impl is None and _pallas_supported(u, A)):
        return _selective_scan_pallas_fwd_impl(
            u, dt, A, B, C, D, z, bias, softplus, h0=h0,
            want_last_state=want_last)
    out = selective_scan_xla(u, dt, A, B, C, D, z, bias, softplus,
                             return_last_state=want_last, h0=h0)
    return out


def selective_scan_seq_parallel(
    u, delta, A, B, C, D=None, z=None, delta_bias=None,
    delta_softplus: bool = False, axis_name: str = "seq",
    impl: Optional[str] = None,
):
    """Call INSIDE shard_map with u/delta/B/C/z sharded along L over
    `axis_name`.  Returns the exact full-sequence scan outputs for the local
    shard."""
    k = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)

    # local pass from zero state
    _, h_last = _local_scan(u, delta, A, B, C, D, z, delta_bias,
                            delta_softplus, None, True, impl)

    # shard decay product: exp(A * sum_t dt') -- no scan needed
    dtf = delta.astype(jnp.float32)
    if delta_bias is not None:
        dtf = dtf + delta_bias.astype(jnp.float32)[None, None, :]
    if delta_softplus:
        dtf = jax.nn.softplus(dtf)
    a_prod = jnp.exp(
        jnp.einsum("bd,dn->bdn", dtf.sum(axis=1), A.astype(jnp.float32)))

    # gather summaries across shards (tiny) and fold the exclusive prefix
    a_g = lax.all_gather(a_prod, axis_name)   # (K, B, D, N)
    h_g = lax.all_gather(h_last, axis_name)   # (K, B, D, N)
    running = jnp.zeros_like(h_last)
    h0 = jnp.zeros_like(h_last)
    for j in range(k):
        h0 = jnp.where(my == j, running, h0)
        running = a_g[j] * running + h_g[j]

    # exact second pass seeded with the true incoming state
    return _local_scan(u, delta, A, B, C, D, z, delta_bias, delta_softplus,
                       h0, False, impl)
