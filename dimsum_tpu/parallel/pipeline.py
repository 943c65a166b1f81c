"""Pipeline parallelism: GPipe-style microbatch schedule over a 'stage'
mesh axis with `ppermute` hops between stages.

Not present in the reference (DDP-only; SURVEY 2.6 marks PP absent and
unnecessary at 460M) -- provided as the TPU-native PP building block for
larger configs: layers are stacked and sharded over stages, activations hop
stage->stage over ICI, and the K-1 bubble steps are the usual GPipe cost.

Works on any pytree of activations with static shapes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def pipeline_apply(stage_fn: Callable, stage_params, x,
                   axis_name: str = "stage", num_microbatches: int = 4):
    """Run `stage_fn` at every pipeline stage over microbatches of x.

    Call INSIDE shard_map with `stage_params` sharded over `axis_name`
    (each device holds its stage's parameters) and x replicated.

    stage_fn(stage_params, microbatch) -> microbatch (same structure).
    x: (B, ...) with B % num_microbatches == 0.  Returns the full output
    batch, replicated on every stage.
    """
    k = lax.axis_size(axis_name)
    s = lax.axis_index(axis_name)
    B = jax.tree.leaves(x)[0].shape[0]
    assert B % num_microbatches == 0
    mb = B // num_microbatches
    m = num_microbatches

    xs = jax.tree.map(
        lambda a: a.reshape(m, mb, *a.shape[1:]), x)
    zero_mb = jax.tree.map(lambda a: jnp.zeros_like(a[0]), xs)
    outs = jax.tree.map(lambda a: jnp.zeros_like(a), xs)

    fwd_perm = [(i, (i + 1) % k) for i in range(k)]

    def step(i, carry):
        buf, outs = carry
        # stage 0 injects microbatch i (when one remains); other stages
        # consume what arrived from the previous stage
        inject = jax.tree.map(
            lambda a, z: jnp.where(i < m, a[jnp.minimum(i, m - 1)], z),
            xs, zero_mb)
        inp = jax.tree.map(
            lambda inj, b: jnp.where(s == 0, inj, b), inject, buf)
        out = stage_fn(stage_params, inp)
        # the last stage banks its result for microbatch (i - k + 1)
        j = i - (k - 1)
        valid = (j >= 0) & (j < m)
        jc = jnp.clip(j, 0, m - 1)

        def bank(acc, o):
            upd = jnp.where(valid & (s == k - 1), o, acc[jc])
            return acc.at[jc].set(upd)

        outs = jax.tree.map(bank, outs, out)
        # ship activations to the next stage
        buf = jax.tree.map(
            lambda o: lax.ppermute(o, axis_name, fwd_perm), out)
        return buf, outs

    _, outs = lax.fori_loop(0, m + k - 1, step, (zero_mb, outs))
    # replicate the collected outputs (only the last stage holds them)
    outs = jax.tree.map(
        lambda a: lax.psum(jnp.where(s == k - 1, a, jnp.zeros_like(a)),
                           axis_name), outs)
    return jax.tree.map(lambda a: a.reshape(B, *a.shape[2:]), outs)
