"""Fused residual-add + LayerNorm/RMSNorm and adaLN modulation helpers.

Reference semantics: Triton `layer_norm_fn` / `rms_norm_fn`
(`/root/reference/mamba/mamba_ssm/ops/triton/layernorm.py:19,33`): the
residual add happens first, the added result is returned as the new residual
(optionally kept in fp32), and the normalization of the sum is returned as the
block input.  On TPU this is pure VPU work that XLA fuses; the functions below
just pin down the exact dtype/eps semantics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["rms_norm", "layer_norm", "fused_add_norm", "modulate"]


def rms_norm(x, weight, bias=None, eps: float = 1e-5):
    """RMSNorm computed in fp32, cast back to x.dtype (weight has no bias in
    the reference RMSNorm module, but bias is accepted for generality)."""
    dtype_in = x.dtype
    xf = x.astype(jnp.float32)
    rstd = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    out = xf * rstd * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype_in)


def layer_norm(x, weight=None, bias=None, eps: float = 1e-6):
    """LayerNorm computed in fp32.  weight/bias may be None
    (elementwise_affine=False in the reference DiT blocks)."""
    dtype_in = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype_in)


def fused_add_norm(
    x,
    weight,
    bias=None,
    residual=None,
    eps: float = 1e-5,
    prenorm: bool = True,
    residual_in_fp32: bool = True,
    is_rms: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """residual' = x + residual; out = Norm(residual').

    Returns (out, residual') when prenorm else out.  Matches the call sites in
    `/root/reference/dimsum/models_dim.py` (e.g. :1079-1099).
    """
    if residual is not None:
        total = x.astype(jnp.float32) + residual.astype(jnp.float32)
    else:
        total = x.astype(jnp.float32)
    norm_fn = rms_norm if is_rms else layer_norm
    out = norm_fn(total, weight, bias, eps=eps).astype(x.dtype)
    if not prenorm:
        return out
    new_residual = total if residual_in_fp32 else total.astype(x.dtype)
    return out, new_residual


def modulate(x, shift, scale):
    """adaLN modulation: x * (1 + scale) + shift with (N, D) -> (N, 1, D)
    broadcast (reference models_dim.py:34)."""
    return x * (1 + scale[:, None, :]) + shift[:, None, :]
