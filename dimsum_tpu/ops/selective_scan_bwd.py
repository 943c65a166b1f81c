"""Fused Pallas backward (reverse scan) for the selective scan.

Mirrors the reference CUDA backward's structure
(`/root/reference/mamba/csrc/selective_scan/selective_scan_bwd_kernel.cuh`:
replay chunks with a reverse scan and recomputed forward states) in TPU
terms:

  forward (training variant) additionally emits
    o          : pre-gate output  s + D*u              (B, L, D)
    boundaries : chunk-START states h                  (B, n_chunks, N, D)

  backward runs one Pallas kernel over grid (batch, d-blocks, chunks) with
  the CHUNK axis iterated in reverse.  Per chunk it
    1. recomputes dt', a=exp(dt'A), x=dt'uB and the in-chunk states h via
       the same doubling scan used forward, seeded by the saved boundary;
    2. solves the reverse gradient recurrence e_t = p_t + a_{t+1} e_{t+1}
       (p_t = go_t (x) C_t) as a doubling scan on time-flipped arrays with
       coefficients shifted by one step, carrying w = a_first * e_first
       across chunks in VMEM scratch;
    3. accumulates dA on-block (revisited output block stays in VMEM) and
       writes per-position du_scan/ddt/dB/dC partials (dB/dC carry a
       d-block axis, summed afterwards by XLA -- tiny arrays).

  The cheap elementwise gate/D-skip/bias gradients happen in XLA around the
  kernel (dz, dD, dbias, the go*D term of du), where they fuse for free.

Gradient math (h_t = a_t h_{t-1} + x_t, s_t = <C_t, h_t>, o = s + D u,
y = o * silu(z), given g = dL/dy):
  dz   = g * o * silu'(z)            go = g * silu(z)
  dD   = sum go * u                  ds = go
  e_t  = C_t ds_t + a_{t+1} e_{t+1}              (reverse recurrence)
  dC_t = sum_d ds_td h_tdn           dx_t = e_t
  da_t = e_t * h_{t-1}
  dB_tn = sum_d e dt' u              du_scan = sum_n e dt' B
  ddt' = sum_n (e u B + da a A)      ddt = ddt' * sigmoid(dt_raw + bias)
  dA   = sum_t da * a * dt'          dbias = sum_{b,t} ddt
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dimsum_tpu.ops.selective_scan import scan_rows_auto, scan_rows_rev_auto


def _fwd_train_kernel(
    u_ref, dt_ref, A_ref, B_ref, C_ref, D_ref, bias_ref, z_ref,
    y_ref, o_ref, bnd_ref,
    h_ref,
    *, n_state, chunk, d_block, delta_softplus, has_z, has_d, has_bias,
    out_dtype,
):
    l_idx = pl.program_id(2)

    @pl.when(l_idx == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    f32 = jnp.float32
    # save the chunk-START boundary state
    bnd_ref[0, 0] = h_ref[:]

    u = u_ref[0].astype(f32)
    dt = dt_ref[0].astype(f32)
    if has_bias:
        dt = dt + bias_ref[0][None, :].astype(f32)
    if delta_softplus:
        dt = jax.nn.softplus(dt)
    # exp2 trick (see selective_scan.py _scan_body)
    A = A_ref[:].astype(f32) * 1.4426950408889634
    Bm = B_ref[0].astype(f32)
    Cm = C_ref[0].astype(f32)

    rows = chunk * n_state
    a = jnp.exp2((dt[:, None, :] * A.T[None, :, :]).reshape(rows, d_block))
    x = ((dt * u)[:, None, :] * Bm[:, :, None]).reshape(rows, d_block)
    h, h_last = scan_rows_auto(a, x, h_ref[:], n_state, chunk, d_block)
    h_ref[:] = h_last

    s = (h.reshape(chunk, n_state, d_block) * Cm[:, :, None]).sum(axis=1)
    o = s + (u * D_ref[0][None, :].astype(f32) if has_d else 0.0)
    o_ref[0] = o.astype(f32)
    if has_z:
        zf = z_ref[0].astype(f32)
        y = o * (zf * jax.nn.sigmoid(zf))
    else:
        y = o
    y_ref[0] = y.astype(out_dtype)


def _bwd_kernel(
    u_ref, dt_ref, A_ref, B_ref, C_ref, go_ref, bnd_ref,
    du_ref, ddt_ref, dB_ref, dC_ref, dA_ref,
    w_ref,
    *, n_state, chunk, d_block, n_chunks, delta_softplus, has_bias,
    bias_ref=None,
):
    # NOTE: bias handled by caller folding into dt; kept minimal here.
    l_rev = pl.program_id(2)  # 0 .. n_chunks-1, chunk index = reversed

    @pl.when(l_rev == 0)
    def _():
        w_ref[:] = jnp.zeros_like(w_ref)
        dA_ref[...] = jnp.zeros_like(dA_ref)

    f32 = jnp.float32
    u = u_ref[0].astype(f32)
    dt_eff = dt_ref[0].astype(f32)  # already bias-added by wrapper
    sp = jax.nn.sigmoid(dt_eff)
    dtp = jax.nn.softplus(dt_eff) if delta_softplus else dt_eff
    A = A_ref[:].astype(f32)
    Bm = B_ref[0].astype(f32)
    Cm = C_ref[0].astype(f32)
    go = go_ref[0].astype(f32)  # gradient wrt s (pre-gate minus D-skip)

    rows = chunk * n_state
    At = A.T[None, :, :]
    # exp2 trick (scale only inside the exponent; At itself is reused
    # unscaled for the ddt/dA gradient terms below)
    a = jnp.exp2((dtp[:, None, :] * (At * 1.4426950408889634))
                 .reshape(rows, d_block))
    x = ((dtp * u)[:, None, :] * Bm[:, :, None]).reshape(rows, d_block)
    h0 = bnd_ref[0, 0]  # (n_state, d_block) chunk-start state
    h, _ = scan_rows_auto(a, x, h0, n_state, chunk, d_block)
    h_prev = jnp.concatenate([h0, h[: rows - n_state]], axis=0)

    # p = go (x) C  in (t, n) rows
    p = (go[:, None, :] * Cm[:, :, None]).reshape(rows, d_block)

    # reverse recurrence e_t = p_t + a_{t+1} e_{t+1} as a flip-free suffix
    # scan; w carries a_first * e_first from the (temporally) NEXT chunk.
    e, w_out = scan_rows_rev_auto(a, p, w_ref[:], n_state, chunk, d_block)
    w_ref[:] = w_out

    da = e * h_prev
    e3 = e.reshape(chunk, n_state, d_block)
    da3 = (da * a).reshape(chunk, n_state, d_block)

    du_ref[0] = (e3 * Bm[:, :, None]).sum(1) * dtp
    ddt_p = ((e3 * Bm[:, :, None]).sum(1) * u
             + (da3 * At).sum(1))
    ddt_ref[0] = ddt_p * sp if delta_softplus else ddt_p
    dB_ref[0, 0] = (e3 * (dtp * u)[:, None, :]).sum(2)
    dC_ref[0, 0] = (h.reshape(chunk, n_state, d_block)
                    * go[:, None, :]).sum(2)
    dA_ref[0] += (da3 * dtp[:, None, :]).sum(0).T  # (d_block, n_state)


def selective_scan_fwd_train(u, delta, A, B, C, D, z, delta_bias,
                             delta_softplus, chunk, d_block):
    """Forward emitting (y, o, boundaries) for the fused backward."""
    batch, seqlen, dim = u.shape
    n_state = A.shape[1]
    n_chunks = seqlen // chunk
    has_z, has_d, has_bias = z is not None, D is not None, delta_bias is not None
    D_in = (D if has_d else jnp.zeros((dim,), jnp.float32)).reshape(1, dim)
    bias_in = (delta_bias if has_bias else
               jnp.zeros((dim,), jnp.float32)).reshape(1, dim)
    z_in = z if has_z else u

    grid = (batch, dim // d_block, n_chunks)
    kernel = functools.partial(
        _fwd_train_kernel, n_state=n_state, chunk=chunk, d_block=d_block,
        delta_softplus=delta_softplus, has_z=has_z, has_d=has_d,
        has_bias=has_bias, out_dtype=u.dtype)

    bld = pl.BlockSpec((1, chunk, d_block), lambda b, d, l: (b, l, d),
                       memory_space=pltpu.VMEM)
    bln = pl.BlockSpec((1, chunk, n_state), lambda b, d, l: (b, l, 0),
                       memory_space=pltpu.VMEM)
    dn = pl.BlockSpec((d_block, n_state), lambda b, d, l: (d, 0),
                      memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, d_block), lambda b, d, l: (0, d),
                       memory_space=pltpu.VMEM)
    bnd = pl.BlockSpec((1, 1, n_state, d_block),
                       lambda b, d, l: (b, l, 0, d),
                       memory_space=pltpu.VMEM)

    y, o, boundaries = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bld, bld, dn, bln, bln, vec, vec, bld],
        out_specs=(bld, bld, bnd),
        out_shape=(
            jax.ShapeDtypeStruct(u.shape, u.dtype),
            jax.ShapeDtypeStruct(u.shape, jnp.float32),
            jax.ShapeDtypeStruct((batch, n_chunks, n_state, dim),
                                 jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((n_state, d_block), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(u, delta, A, B, C, D_in, bias_in, z_in)
    return y, o, boundaries


def selective_scan_bwd_pallas(u, delta, A, B, C, D, z, delta_bias,
                              delta_softplus, o, boundaries, g,
                              chunk, d_block):
    """Fused gradients.  Returns (du, ddelta, dA, dB, dC, dD, dz, dbias)
    with None for absent optionals."""
    batch, seqlen, dim = u.shape
    n_state = A.shape[1]
    n_chunks = seqlen // chunk
    ndb = dim // d_block
    f32 = jnp.float32

    gf = g.astype(f32)
    if z is not None:
        zf = z.astype(f32)
        sig = jax.nn.sigmoid(zf)
        silu = zf * sig
        go = gf * silu
        dz = (gf * o * (sig * (1 + zf * (1 - sig)))).astype(z.dtype)
    else:
        go = gf
        dz = None

    dD = (go * u.astype(f32)).sum((0, 1)) if D is not None else None

    # fold the bias into dt once so the kernel sees the effective dt
    dt_eff = delta.astype(f32)
    if delta_bias is not None:
        dt_eff = dt_eff + delta_bias.astype(f32)[None, None, :]

    grid = (batch, ndb, n_chunks)
    kernel = functools.partial(
        _bwd_kernel, n_state=n_state, chunk=chunk, d_block=d_block,
        n_chunks=n_chunks, delta_softplus=delta_softplus, has_bias=False)

    # chunk axis reversed: grid step l processes chunk (n_chunks-1-l)
    def rev(b, d, l):
        return (b, n_chunks - 1 - l, d)

    bld_r = pl.BlockSpec((1, chunk, d_block), rev, memory_space=pltpu.VMEM)
    bln_r = pl.BlockSpec((1, chunk, n_state),
                         lambda b, d, l: (b, n_chunks - 1 - l, 0),
                         memory_space=pltpu.VMEM)
    dn = pl.BlockSpec((d_block, n_state), lambda b, d, l: (d, 0),
                      memory_space=pltpu.VMEM)
    bnd = pl.BlockSpec((1, 1, n_state, d_block),
                       lambda b, d, l: (b, n_chunks - 1 - l, 0, d),
                       memory_space=pltpu.VMEM)
    dBspec = pl.BlockSpec((1, 1, chunk, n_state),
                          lambda b, d, l: (d, b, n_chunks - 1 - l, 0),
                          memory_space=pltpu.VMEM)
    dAspec = pl.BlockSpec((1, d_block, n_state), lambda b, d, l: (b, d, 0),
                          memory_space=pltpu.VMEM)

    du_s, ddt, dB_p, dC_p, dA_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bld_r, bld_r, dn, bln_r, bln_r, bld_r, bnd],
        out_specs=(bld_r, bld_r, dBspec, dBspec, dAspec),
        out_shape=(
            jax.ShapeDtypeStruct(u.shape, f32),
            jax.ShapeDtypeStruct(u.shape, f32),
            jax.ShapeDtypeStruct((ndb, batch, seqlen, n_state), f32),
            jax.ShapeDtypeStruct((ndb, batch, seqlen, n_state), f32),
            jax.ShapeDtypeStruct((batch, dim, n_state), f32),
        ),
        scratch_shapes=[pltpu.VMEM((n_state, d_block), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(u, dt_eff, A, B, C, go, boundaries)

    du = du_s + (go * D.astype(f32)[None, None, :] if D is not None else 0.0)
    dB = dB_p.sum(0).astype(B.dtype)
    dC = dC_p.sum(0).astype(C.dtype)
    dA = dA_p.sum(0)
    dbias = ddt.sum((0, 1)) if delta_bias is not None else None
    return (du.astype(u.dtype), ddt.astype(delta.dtype), dA.astype(A.dtype),
            dB, dC,
            dD.astype(D.dtype) if dD is not None else None,
            dz, dbias.astype(delta_bias.dtype) if dbias is not None else None)
