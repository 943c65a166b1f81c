"""Fused residual-add + LayerNorm/RMSNorm and adaLN modulation helpers.

Reference semantics: Triton `layer_norm_fn` / `rms_norm_fn`
(`/root/reference/mamba/mamba_ssm/ops/triton/layernorm.py:19,33`): the
residual add happens first, the added result is returned as the new residual
(optionally kept in fp32), and the normalization of the sum is returned as the
block input.  On TPU this is pure VPU work that XLA fuses; the functions below
just pin down the exact dtype/eps semantics.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["rms_norm", "layer_norm", "fused_add_norm", "modulate"]


# ---------------------------------------------------------------------------
# Pallas fused add+norm (TPU)
#
# XLA's reduce fusion for "residual' = x + res; out = Norm(residual')" runs
# at ~26% of HBM bandwidth on v5e (measured 0.31 ms per (24,256,1024) call:
# the fusion re-reads the f32 sum once per reduction pass).  The Pallas
# kernel reads each operand once into VMEM, computes both moments
# in-register, and writes out + new residual: ~2.3x faster, bitwise-
# equivalent fp32 math.
# ---------------------------------------------------------------------------


def _add_norm_kernel(x_ref, res_ref, w_ref, b_ref, out_ref, newres_ref,
                     *, eps, is_rms, has_res, has_w, has_b, out_dtype):
    f32 = jnp.float32
    total = x_ref[...].astype(f32)
    if has_res:
        total = total + res_ref[...].astype(f32)
    if is_rms:
        rstd = jax.lax.rsqrt(
            jnp.mean(jnp.square(total), axis=-1, keepdims=True) + eps)
        out = total * rstd
    else:
        mean = jnp.mean(total, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(total - mean), axis=-1, keepdims=True)
        out = (total - mean) * jax.lax.rsqrt(var + eps)
    if has_w:
        out = out * w_ref[...].astype(f32)
    if has_b:
        out = out + b_ref[...].astype(f32)
    out_ref[...] = out.astype(out_dtype)
    newres_ref[...] = total


def _pick_rows(n_rows: int) -> int:
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if n_rows % cand == 0:
            return cand
    return 0


def _add_norm_pallas(x2, res2, w_in, b_in, eps, is_rms, has_b, out_dtype):
    """x2/res2: (rows, D); w_in/b_in: (1, D) (b_in a zeros placeholder when
    has_b=False).  Returns (out (rows, D) out_dtype, newres f32)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, d = x2.shape
    t = _pick_rows(rows)
    row_spec = pl.BlockSpec((t, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _add_norm_kernel, eps=eps, is_rms=is_rms, has_res=True,
        has_w=True, has_b=has_b, out_dtype=out_dtype)
    import os

    return pl.pallas_call(
        kernel,
        grid=(rows // t,),
        in_specs=[row_spec, row_spec, vec_spec, vec_spec],
        out_specs=(row_spec, row_spec),
        out_shape=(jax.ShapeDtypeStruct((rows, d), out_dtype),
                   jax.ShapeDtypeStruct((rows, d), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=os.environ.get("DIMSUM_NORM_INTERPRET", "0") == "1",
    )(x2, res2, w_in, b_in)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _add_norm_op(x2, res2, w_in, b_in, eps, is_rms, has_b, out_dtype):
    return _add_norm_pallas(x2, res2, w_in, b_in, eps, is_rms, has_b,
                            out_dtype)


def _add_norm_fwd(x2, res2, w_in, b_in, eps, is_rms, has_b, out_dtype):
    out, total = _add_norm_pallas(x2, res2, w_in, b_in, eps, is_rms, has_b,
                                  out_dtype)
    marks = (jnp.zeros((), x2.dtype), jnp.zeros((), res2.dtype),
             jnp.zeros((), b_in.dtype))
    return (out, total), (total, w_in, marks)


def _add_norm_bwd(eps, is_rms, has_b, out_dtype, saved, grads):
    """Analytic LayerNorm/RMSNorm backward in XLA (training path; the
    sampling hot path never differentiates).  `total` is both the normalized
    input and a primal output, so its cotangent g_total adds through; x and
    residual receive the same cotangent dt."""
    total, w_in, (xm, rm, bm) = saved
    g_out, g_total = grads
    f32 = jnp.float32
    t = total.astype(f32)
    g = g_out.astype(f32)
    if is_rms:
        r = jax.lax.rsqrt(jnp.mean(jnp.square(t), -1, keepdims=True) + eps)
        xhat = t * r
    else:
        mean = jnp.mean(t, -1, keepdims=True)
        var = jnp.mean(jnp.square(t - mean), -1, keepdims=True)
        r = jax.lax.rsqrt(var + eps)
        xhat = (t - mean) * r
    gy = g * w_in.astype(f32)
    m1 = jnp.mean(gy * xhat, -1, keepdims=True)
    if is_rms:
        dt = r * (gy - xhat * m1)
    else:
        dt = r * (gy - jnp.mean(gy, -1, keepdims=True) - xhat * m1)
    if g_total is not None:
        dt = dt + g_total.astype(f32)
    dw = (g * xhat).sum(0, keepdims=True).astype(w_in.dtype)
    db = g.sum(0, keepdims=True).astype(bm.dtype)
    return (dt.astype(xm.dtype), dt.astype(rm.dtype), dw, db)


_add_norm_op.defvjp(_add_norm_fwd, _add_norm_bwd)


def _add_norm_pallas_ok(x) -> bool:
    """Opt-in (DIMSUM_PALLAS_NORM=1): the kernel itself is ~8x faster than
    XLA's standalone reduce fusion (39us vs 310us at (24,256,1024) f32 on
    v5e), but in the full DiM graph XLA fuses most add+norms into the
    PRECEDING matmul's epilogue, which the custom call breaks -- measured
    net -0.3% on the headline bench.  Useful where the producer is not a
    matmul (profile first)."""
    import os

    if os.environ.get("DIMSUM_NORM_INTERPRET", "0") == "1":
        pass  # interpret-mode testing on CPU
    elif (os.environ.get("DIMSUM_PALLAS_NORM", "0") != "1"
            or jax.default_backend() not in ("tpu", "axon")):
        return False
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    return (x.ndim >= 2 and x.shape[-1] % 128 == 0
            and x.shape[-1] <= 4096 and _pick_rows(rows) > 0)


def _norm_mxu_reductions() -> bool:
    """Opt-in (DIMSUM_NORM_MXU=1): compute the norm's cross-lane channel
    reductions as ones-column MXU matvecs instead of VPU reduce fusions.
    On v5e the multi-output reduce fusions at the add+norm sites run at
    ~3.4x the bandwidth floor (0.31 ms per (24,256,1024) site); a matvec
    reads the tensor once on the MXU and leaves XLA's elementwise fusion
    landscape untouched (no custom calls)."""
    return (os.environ.get("DIMSUM_NORM_MXU", "0") == "1"
            and jax.default_backend() in ("tpu", "axon"))


def _mxu_rowsum(xf):
    """sum over the channel (minor) axis via an MXU matvec: (..., D) ->
    (..., 1), fp32 accumulate."""
    d = xf.shape[-1]
    ones = jnp.ones((d, 1), jnp.float32)
    return jax.lax.dot_general(
        xf, ones, (((xf.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def rms_norm(x, weight, bias=None, eps: float = 1e-5):
    """RMSNorm computed in fp32, cast back to x.dtype (weight has no bias in
    the reference RMSNorm module, but bias is accepted for generality)."""
    dtype_in = x.dtype
    xf = x.astype(jnp.float32)
    if _norm_mxu_reductions():
        msq = _mxu_rowsum(xf * xf) / x.shape[-1]
    else:
        msq = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(msq + eps)
    out = xf * rstd * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype_in)


def layer_norm(x, weight=None, bias=None, eps: float = 1e-6):
    """LayerNorm computed in fp32.  weight/bias may be None
    (elementwise_affine=False in the reference DiT blocks)."""
    dtype_in = x.dtype
    xf = x.astype(jnp.float32)
    if _norm_mxu_reductions():
        d = x.shape[-1]
        mean = _mxu_rowsum(xf) / d
        var = _mxu_rowsum(jnp.square(xf - mean)) / d
    else:
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
    if residual is not None and weight is not None and _add_norm_pallas_ok(x):
        shape, d = x.shape, x.shape[-1]
        x2 = x.reshape(-1, d)
        res2 = residual.reshape(-1, d)
        w_in = weight.reshape(1, d)
        has_b = bias is not None
        b_in = (bias if has_b else jnp.zeros((d,), jnp.float32)).reshape(1, d)
        out, total = _add_norm_op(x2, res2, w_in, b_in, eps, is_rms, has_b,
                                  x.dtype)
        out = out.reshape(shape)
        total = total.reshape(shape)
    else:
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


# ---------------------------------------------------------------------------
# Fused (gate-add +) add + norm + adaLN-modulate Pallas kernel.
#
# The v5e trace of one DiM-L/2 forward shows ~20 multi-output reduce fusions
# of 0.31 ms each (the add+norm sites) plus their follow-up modulate
# fusions: XLA re-reads the f32 sum once per reduction pass and materializes
# the normalized tensor before modulating it.  This kernel performs
#     total  = base (+ gate * branch) (+ residual)
#     normed = Norm(total) * w (+ b)
#     out    = normed * (1 + scale) + shift          [optional]
# in ONE VMEM pass per row tile, emitting (out, total).  The backward is the
# plain XLA composition via jax.vjp (training already recomputes; the
# sampling hot path never differentiates).
# ---------------------------------------------------------------------------


def _norm_mod_kernel(base_ref, branch_ref, gate_ref, res_ref, w_ref, b_ref,
                     shift_ref, scale_ref, out_ref, total_ref,
                     *, eps, is_rms, has_branch, has_gate, has_res, has_w,
                     has_b, has_mod, round_total, out_dtype, total_dtype):
    f32 = jnp.float32
    d = base_ref.shape[-1]
    total = base_ref[...].astype(f32)
    if has_branch:
        br = branch_ref[...].astype(f32)
        if has_gate:
            br = gate_ref[...].reshape(1, d).astype(f32) * br
        total = total + br
    if has_res:
        total = total + res_ref[...].astype(f32)
    total_ref[...] = total.astype(total_dtype)
    if round_total:
        # match the unfused graph exactly: when the residual stream is
        # carried in bf16 the norm sees the ROUNDED sum
        total = total.astype(total_dtype).astype(f32)
    if is_rms:
        rstd = jax.lax.rsqrt(
            jnp.mean(jnp.square(total), axis=-1, keepdims=True) + eps)
        normed = total * rstd
    else:
        mean = jnp.mean(total, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(total - mean), axis=-1, keepdims=True)
        normed = (total - mean) * jax.lax.rsqrt(var + eps)
    if has_w:
        normed = normed * w_ref[...].astype(f32)
    if has_b:
        normed = normed + b_ref[...].astype(f32)
    out = normed.astype(out_dtype)
    if has_mod:
        one = jnp.ones((), out_dtype)
        out = (out * (one + scale_ref[...].reshape(1, d))
               + shift_ref[...].reshape(1, d))
    out_ref[...] = out


def _norm_mod_pallas(base, branch, gate, res, w, b, shift, scale,
                     *, L, eps, is_rms, flags, out_dtype, total_dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, d = base.shape
    t = _pick_rows(min(rows, L))
    while L % t != 0:  # row tiles must not straddle batch boundaries
        t //= 2
    row_spec = pl.BlockSpec((t, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    # per-batch vectors ride as (B, 1, D) (a (1, D) block over (B, D) would
    # violate Mosaic's 8-sublane block divisibility); tile i belongs to
    # batch (i*t)//L
    bvec_spec = pl.BlockSpec((1, 1, d), lambda i: (i * t // L, 0, 0),
                             memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def per_batch(v):  # (1, D) placeholders must not be indexed per-batch
        return bvec_spec if v.ndim == 3 else vec_spec

    def per_row(v):  # (1, D) placeholders must not be indexed per-tile
        return row_spec if v.shape[0] > 1 else vec_spec

    kernel = functools.partial(
        _norm_mod_kernel, eps=eps, is_rms=is_rms, out_dtype=out_dtype,
        total_dtype=total_dtype,
        round_total=total_dtype != jnp.float32, **flags)
    return pl.pallas_call(
        kernel,
        grid=(rows // t,),
        in_specs=[row_spec, per_row(branch), per_batch(gate), per_row(res),
                  vec_spec, vec_spec, per_batch(shift), per_batch(scale)],
        out_specs=(row_spec, row_spec),
        out_shape=(jax.ShapeDtypeStruct((rows, d), out_dtype),
                   jax.ShapeDtypeStruct((rows, d), total_dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=os.environ.get("DIMSUM_NORM_INTERPRET", "0") == "1",
    )(base, branch, gate, res, w, b, shift, scale)


def _fused_norm_mod_ok(x, fuse=None) -> bool:
    # OPT-IN (DIMSUM_FUSED_NORM=1, or fuse=True at a specific call site).
    # Measured r3 on the headline bench:
    # the kernel itself runs the whole add+norm+modulate site in 0.047 ms
    # vs the 0.31 ms multi-output reduce fusion it replaces, yet END-TO-END
    # is 1% SLOWER (0.9527 vs 0.9627 img/s; with the site-A add+norm kernel
    # also on: 0.9468).  The elementwise bucket does not shrink: XLA
    # redistributes the co-computed neighbors into new standalone fusions
    # and loses cross-op scheduling around the custom-call boundary.  Same
    # mechanism as the r2 pallas add+norm negative result -- locally-faster
    # custom calls lose globally.  Do not re-enable without re-measuring
    # bench.py.
    interpret = os.environ.get("DIMSUM_NORM_INTERPRET", "0") == "1"
    if not interpret:
        requested = (fuse if fuse is not None
                     else os.environ.get("DIMSUM_FUSED_NORM", "0") == "1")
        if not requested:
            return False
        if jax.default_backend() not in ("tpu", "axon"):
            return False
    if x.ndim != 3 or x.shape[-1] % 128 != 0 or x.shape[-1] > 4096:
        return False
    t = _pick_rows(min(x.shape[0] * x.shape[1], x.shape[1]))
    while t and x.shape[1] % t != 0:
        t //= 2
    return t > 0


def norm_modulate(
    x, weight, bias=None, *, branch=None, gate=None, residual=None,
    shift=None, scale=None, eps: float = 1e-5, is_rms: bool = True,
    total_dtype=None, fuse=None,
):
    """total = x (+ gate*branch) (+ residual); out = modulate(Norm(total)).

    Returns (out, total).  `x`/`branch`: (B, L, D); `gate`/`shift`/`scale`:
    (B, D) per-batch adaLN vectors; `residual`: (B, L, D).  One fused VMEM
    pass on TPU; exact-order XLA composition elsewhere.  `total` is emitted
    in `total_dtype` (default: x.dtype -- the bf16 residual-stream
    convention of the mid-block sites; pass jnp.float32 for the fp32
    stream)."""
    B, L, D = x.shape
    out_dtype = x.dtype
    total_dtype = total_dtype or x.dtype
    has_mod = shift is not None
    flags = dict(
        has_branch=branch is not None,
        has_gate=gate is not None,
        has_res=residual is not None,
        has_w=weight is not None,
        has_b=bias is not None,
        has_mod=has_mod,
    )
    if not _fused_norm_mod_ok(x, fuse):
        # straight composition, BITWISE identical to the legacy call sites:
        # without a residual the adds run per-op in the input dtype (the
        # legacy blocks did `hidden + gate*branch` in bf16); with a
        # residual the legacy fused_add_norm accumulated in the wider of
        # (f32, input dtype), preserving fp64 parity-model precision
        if residual is None:
            total = x
            if branch is not None:
                br = branch
                if gate is not None:
                    br = gate[:, None, :] * br
                total = total + br
        else:
            ct = jnp.promote_types(x.dtype, jnp.float32)
            total = x.astype(ct)
            if branch is not None:
                br = branch.astype(ct)
                if gate is not None:
                    br = gate.astype(ct)[:, None, :] * br
                total = total + br
            total = total + residual.astype(ct)
        total = total.astype(total_dtype)
        norm_fn = rms_norm if is_rms else layer_norm
        out = norm_fn(total, weight, bias, eps=eps).astype(out_dtype)
        if has_mod:
            out = modulate(out, shift, scale)
        return out, total

    # absent operands ride as (1, D) zeros with a constant index map --
    # never read (static flags) and negligible DMA (a full-row base alias
    # would stream the (t, D) block per tile up to 3x)
    zrow = jnp.zeros((1, D), x.dtype)
    base2 = x.reshape(-1, D)
    branch2 = branch.reshape(-1, D) if branch is not None else zrow
    gate2 = gate.reshape(B, 1, D) if gate is not None else zrow
    res2 = residual.reshape(-1, D) if residual is not None else zrow
    w2 = (weight if weight is not None
          else jnp.ones((D,), jnp.float32)).reshape(1, D)
    b2 = (bias if bias is not None
          else jnp.zeros((D,), jnp.float32)).reshape(1, D)
    shift2 = shift.reshape(B, 1, D) if has_mod else zrow
    scale2 = scale.reshape(B, 1, D) if has_mod else zrow
    out, total = _norm_mod_op(
        base2, branch2, gate2, res2, w2, b2, shift2, scale2,
        L, eps, is_rms, tuple(sorted(flags.items())),
        jnp.dtype(out_dtype).name, jnp.dtype(total_dtype).name)
    return out.reshape(B, L, D), total.reshape(B, L, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def _norm_mod_op(base, branch, gate, res, w, b, shift, scale,
                 L, eps, is_rms, flags_t, out_dtype_name, total_dtype_name):
    flags = dict(flags_t)
    return _norm_mod_pallas(
        base, branch, gate, res, w, b, shift, scale, L=L, eps=eps,
        is_rms=is_rms, flags=flags, out_dtype=jnp.dtype(out_dtype_name),
        total_dtype=jnp.dtype(total_dtype_name))


def _norm_mod_xla_2d(base, branch, gate, res, w, b, shift, scale,
                     L, eps, is_rms, flags, out_dtype, total_dtype):
    """Same math as the kernel on the flattened-2D operands (vjp path)."""
    f32 = jnp.float32
    rows, D = base.shape
    B = rows // L
    gate = gate.reshape(-1, D)      # per-batch vectors arrive as (B, 1, D)
    shift = shift.reshape(-1, D)
    scale = scale.reshape(-1, D)
    total = base.astype(f32)
    if flags["has_branch"]:
        br = branch.astype(f32)
        if flags["has_gate"]:
            gfull = jnp.repeat(gate.astype(f32), L, axis=0)
            br = gfull * br
        total = total + br
    if flags["has_res"]:
        total = total + res.astype(f32)
    total_out = total.astype(total_dtype)
    tn = total_out.astype(f32)
    if is_rms:
        normed = tn * jax.lax.rsqrt(
            jnp.mean(jnp.square(tn), -1, keepdims=True) + eps)
    else:
        mean = jnp.mean(tn, -1, keepdims=True)
        var = jnp.mean(jnp.square(tn - mean), -1, keepdims=True)
        normed = (tn - mean) * jax.lax.rsqrt(var + eps)
    if flags["has_w"]:
        normed = normed * w.astype(f32)
    if flags["has_b"]:
        normed = normed + b.astype(f32)
    out = normed.astype(out_dtype)
    if flags["has_mod"]:
        sfull = jnp.repeat(scale, L, axis=0)
        hfull = jnp.repeat(shift, L, axis=0)
        out = out * (jnp.ones((), out_dtype) + sfull) + hfull
    return out, total_out


def _norm_mod_fwd(base, branch, gate, res, w, b, shift, scale,
                  L, eps, is_rms, flags_t, out_dtype_name, total_dtype_name):
    y = _norm_mod_op(base, branch, gate, res, w, b, shift, scale,
                     L, eps, is_rms, flags_t, out_dtype_name,
                     total_dtype_name)
    return y, (base, branch, gate, res, w, b, shift, scale)


def _norm_mod_bwd(L, eps, is_rms, flags_t, out_dtype_name, total_dtype_name,
                  saved, grads):
    flags = dict(flags_t)
    fn = functools.partial(
        _norm_mod_xla_2d, L=L, eps=eps, is_rms=is_rms, flags=flags,
        out_dtype=jnp.dtype(out_dtype_name),
        total_dtype=jnp.dtype(total_dtype_name))
    _, vjp = jax.vjp(lambda *a: fn(*a), *saved)
    g_out, g_total = grads
    return vjp((g_out, g_total))


_norm_mod_op.defvjp(_norm_mod_fwd, _norm_mod_bwd)
