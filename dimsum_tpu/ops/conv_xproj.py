"""Fused depthwise-causal-conv + SiLU + x_proj matmul (one HBM pass).

In the Mamba fast path (reference selective_scan_interface.py:174-372) the
conv output `x_conv` is consumed twice: by the `x_proj` matmul that produces
(dt, B, C) and by the selective-scan kernel.  As separate XLA ops the chip
does

    read x -> conv fusion -> write x_conv          (50 MB round trip)
    read x_conv -> x_proj dot -> write x_dbl       (25 MB read)
    read x_conv -> scan kernel                     (25 MB read)

This kernel computes the conv and the x_proj partial dot in one VMEM pass
per channel block, so the x_proj read of `x_conv` disappears (~1 ms per
DiM-L/2 forward across 32 mixer-direction sites; device-trace bucket
"conv+SiLU prologues" is ~2.1 ms, BENCH.md).  The scan kernel still reads
the emitted `x_conv` -- that read is irreducible because (dt, B, C) must be
known before the recurrence starts.

Semantics match `causal_conv1d(x, w, b, activation="silu", reverse=r)`
followed by `x_conv @ w_xproj` exactly (same fp32 conv arithmetic, same
bf16-rounded matmul operands); the x_dbl accumulation across channel blocks
is fp32.  Backward recomputes through the reference composition under
`custom_vjp` (the fused op is forward-bandwidth optimization only).

Opt-in via DIMSUM_CONV_XPROJ=1 (dimsum_tpu/models/mamba.py) pending
end-to-end TPU measurement -- see BENCH.md for the verdict either way.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dimsum_tpu.ops.causal_conv1d import causal_conv1d

__all__ = ["conv_xproj", "conv_xproj_ref", "conv_xproj_supported"]


def conv_xproj_ref(x, conv_w, conv_b, w_xp, reverse: bool = False):
    """Oracle: the exact unfused composition the kernel replaces."""
    x_conv = causal_conv1d(x, conv_w, conv_b, activation="silu",
                           reverse=reverse)
    x_dbl = jnp.dot(x_conv, w_xp.astype(x_conv.dtype),
                    preferred_element_type=jnp.float32)
    return x_conv, x_dbl


def conv_xproj_supported(x, w_xp) -> bool:
    if os.environ.get("DIMSUM_CONV_XPROJ", "0") != "1":
        return False
    B, L, D = x.shape
    R = w_xp.shape[1]
    # one (L, d_block) tile per grid cell must fit VMEM comfortably
    return D % 128 == 0 and R <= 512 and L * max(D, 512) * 4 <= 8 * 2**20


def _kernel(x_ref, wc_ref, bc_ref, wx_ref, xconv_ref, xdbl_ref, *,
            width: int, seqlen: int, reverse: bool, out_dtype):
    d = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # (L, d_block)
    y = jnp.zeros_like(x)
    for k in range(width):
        o = width - 1 - k
        wk = wc_ref[k, :].astype(jnp.float32)[None, :]
        if reverse:
            # anti-causal: y[t] += w[k] * x[t + o]  (zero beyond the end)
            xk = jnp.pad(x, ((0, o), (0, 0)))[o:o + seqlen] if o else x
        else:
            # causal: y[t] += w[k] * x[t - o]  (zero before the start)
            xk = jnp.pad(x, ((o, 0), (0, 0)))[:seqlen] if o else x
        y = y + xk * wk
    y = y + bc_ref[0].astype(jnp.float32)[None, :]
    y = y * jax.nn.sigmoid(y)
    y_out = y.astype(out_dtype)
    xconv_ref[0] = y_out
    # partial x_proj dot for this channel block; bf16-rounded operand to
    # match the unfused Dense reading x_conv from HBM bitwise
    part = jnp.dot(y_out, wx_ref[...], preferred_element_type=jnp.float32)
    @pl.when(d == 0)
    def _init():
        xdbl_ref[0] = part
    @pl.when(d != 0)
    def _acc():
        xdbl_ref[0] = xdbl_ref[0] + part


def _conv_xproj_impl(x, conv_w, conv_b, w_xp, reverse: bool):
    B, L, D = x.shape
    W = conv_w.shape[1]
    R = w_xp.shape[1]
    d_block = int(os.environ.get("DIMSUM_CONV_XPROJ_DBLOCK", "512"))
    if d_block < 128 or (d_block & (d_block - 1)) != 0:
        import warnings
        warnings.warn(
            f"DIMSUM_CONV_XPROJ_DBLOCK={d_block} invalid (need a power of"
            " two >= 128); using 512", RuntimeWarning, stacklevel=3)
        d_block = 512
    while D % d_block != 0 and d_block > 128:
        d_block //= 2
    R_pad = max(128, ((R + 127) // 128) * 128)
    wx = w_xp.astype(x.dtype)
    if R_pad != R:
        wx = jnp.pad(wx, ((0, 0), (0, R_pad - R)))
    wc = jnp.swapaxes(conv_w, 0, 1)  # (W, D): lanes on the channel axis

    grid = (B, D // d_block)
    x_spec = pl.BlockSpec((1, L, d_block), lambda b, d: (b, 0, d),
                          memory_space=pltpu.VMEM)
    wc_spec = pl.BlockSpec((W, d_block), lambda b, d: (0, d),
                           memory_space=pltpu.VMEM)
    bc_spec = pl.BlockSpec((1, d_block), lambda b, d: (0, d),
                           memory_space=pltpu.VMEM)
    wx_spec = pl.BlockSpec((d_block, R_pad), lambda b, d: (d, 0),
                           memory_space=pltpu.VMEM)
    xdbl_spec = pl.BlockSpec((1, L, R_pad), lambda b, d: (b, 0, 0),
                             memory_space=pltpu.VMEM)

    x_conv, x_dbl = pl.pallas_call(
        functools.partial(_kernel, width=W, seqlen=L, reverse=reverse,
                          out_dtype=x.dtype),
        grid=grid,
        in_specs=[x_spec, wc_spec, bc_spec, wx_spec],
        out_specs=(x_spec, xdbl_spec),
        out_shape=(jax.ShapeDtypeStruct((B, L, D), x.dtype),
                   jax.ShapeDtypeStruct((B, L, R_pad), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x, wc, conv_b.reshape(1, D), wx)
    return x_conv, x_dbl[:, :, :R]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def conv_xproj(x, conv_w, conv_b, w_xp, reverse: bool = False):
    """x: (B, L, D); conv_w: (D, W); conv_b: (D,); w_xp: (D, R).

    Returns (x_conv (B,L,D) in x.dtype, x_dbl (B,L,R) fp32) ==
    `conv_xproj_ref` (the x_dbl cross-block accumulation is fp32, at least
    as precise as the single XLA dot it replaces)."""
    return _conv_xproj_impl(x, conv_w, conv_b, w_xp, reverse)


def _fwd(x, conv_w, conv_b, w_xp, reverse):
    return _conv_xproj_impl(x, conv_w, conv_b, w_xp, reverse), (
        x, conv_w, conv_b, w_xp)


def _bwd(reverse, res, g):
    x, conv_w, conv_b, w_xp = res
    _, vjp = jax.vjp(
        lambda *a: conv_xproj_ref(*a, reverse=reverse),
        x, conv_w, conv_b, w_xp)
    return vjp(g)


conv_xproj.defvjp(_fwd, _bwd)
