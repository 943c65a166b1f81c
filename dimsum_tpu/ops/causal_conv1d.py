"""Depthwise causal 1-D convolution with optional fused SiLU.

Reference semantics: `/root/reference/causal-conv1d/csrc/causal_conv1d.cpp`
(`causal_conv1d_fwd`, width 2..4, left zero padding, per-channel weights) and
its python oracle `causal_conv1d_ref`
(`causal-conv1d/causal_conv1d/causal_conv1d_interface.py:45`).

The reference's `_fwd_cond(x, ..., init_states)` variant ignores
`init_states` entirely (all cond pointers are commented out in
`causal_conv1d.cpp:128-140`; the output buffer is fully overwritten), so
behaviorally `fwd_cond == fwd` and we expose only the plain op.

TPU-native layout: x is (batch, seqlen, dim) with channels on the lane axis.
A width-W causal depthwise conv is W shifted multiply-adds -- pure VPU work
that XLA fuses with neighboring elementwise ops; no Pallas needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["causal_conv1d", "causal_conv1d_halo", "causal_conv1d_update"]


def causal_conv1d(x, weight, bias=None, activation: str | None = "silu",
                  reverse: bool = False):
    """x: (B, L, D); weight: (D, W); bias: (D,).  Returns (B, L, D).

    y[b, t, d] = sum_k weight[d, k] * x[b, t - (W-1) + k, d]   (zero padded)

    With `reverse=True` the conv is ANTI-causal in the original token order:
    y[b, t, d] = sum_k weight[d, k] * x[b, t + (W-1) - k, d], which equals
    flip(causal_conv1d(flip(x))) with identical products accumulated in the
    same k order (bitwise equal) -- the flip-free path for reversed-scan
    blocks (reference applies literal flips, models_dim.py:1496-1507)."""
    if activation not in (None, "silu", "swish"):
        raise NotImplementedError(f"activation {activation}")
    B, L, D = x.shape
    W = weight.shape[1]
    dtype_in = x.dtype
    xf = x.astype(jnp.float32)
    wf = weight.astype(jnp.float32)
    if reverse:
        xp = jnp.pad(xf, ((0, 0), (0, W - 1), (0, 0)))
    else:
        xp = jnp.pad(xf, ((0, 0), (W - 1, 0), (0, 0)))
    y = jnp.zeros_like(xf)
    for k in range(W):
        o = (W - 1 - k) if reverse else k
        y = y + xp[:, o : o + L, :] * wf[None, None, :, k]
    if bias is not None:
        y = y + bias.astype(jnp.float32)[None, None, :]
    if activation in ("silu", "swish"):
        y = y * jax.nn.sigmoid(y)
    return y.astype(dtype_in)


def causal_conv1d_halo(x, weight, bias=None, activation: str | None = "silu",
                       axis_name: str = "seq"):
    """Sequence-sharded causal conv for use INSIDE shard_map with the L axis
    sharded over `axis_name`: each shard receives the previous shard's last
    W-1 tokens as a left halo over ICI (one ppermute of a few KB), so the
    sharded result equals the unsharded `causal_conv1d` exactly.  Shard 0's
    halo is zeros == the unsharded zero padding (ppermute leaves
    unaddressed destinations zero)."""
    W = weight.shape[1]
    if x.shape[1] < W - 1:
        raise ValueError(
            f"causal_conv1d_halo: per-shard seqlen {x.shape[1]} is shorter "
            f"than the conv halo width {W - 1}; the single-hop halo "
            f"exchange would silently diverge from the unsharded conv -- "
            f"use fewer sequence shards")
    k = lax.axis_size(axis_name)
    halo = x[:, x.shape[1] - (W - 1):, :]
    prev = lax.ppermute(halo, axis_name,
                        [(i, i + 1) for i in range(k - 1)])
    xp = jnp.concatenate([prev, x], axis=1)
    return causal_conv1d(xp, weight, bias, activation)[:, W - 1:, :]


def causal_conv1d_update(x, conv_state, weight, bias=None,
                         activation: str | None = "silu"):
    """Single-token decode step (reference: causal_conv1d_update.cu:26-66).

    x: (B, D) new token; conv_state: (B, W, D) ring of the last W inputs.
    Returns (y, new_conv_state).
    """
    B, D = x.shape
    new_state = jnp.concatenate([conv_state[:, 1:, :], x[:, None, :]], axis=1)
    y = jnp.einsum(
        "bwd,dw->bd", new_state.astype(jnp.float32), weight.astype(jnp.float32)
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)[None, :]
    if activation in ("silu", "swish"):
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype), new_state
