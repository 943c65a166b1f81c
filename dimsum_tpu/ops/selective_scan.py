"""TPU-native selective scan (Mamba S6 recurrence).

Computes, per batch b and channel d, the first-order linear recurrence

    dt      = softplus(delta + delta_bias)                  (optional)
    a_t     = exp(dt_t * A)                  (d_state-dim decay,  A < 0)
    h_t     = a_t * h_{t-1} + dt_t * u_t * B_t
    y_t     = <C_t, h_t> + D * u_t
    out_t   = y_t * silu(z_t)                               (optional gate)

Semantics follow the reference CUDA extension's `selective_scan_fn`
(`/root/reference/mamba/mamba_ssm/ops/selective_scan_interface.py:94` and the
pure-torch oracle `selective_scan_ref:104`), but the layout is TPU-native:

  u, delta, z : (batch, seqlen, dim)      -- dim on the 128-wide lane axis
  B, C        : (batch, seqlen, d_state)  -- input-dependent (the only mode
                                             DiMSUM uses)
  A           : (dim, d_state)
  D, delta_bias : (dim,)

(The reference uses (batch, dim, seqlen); we keep channels innermost so the
surrounding projections are plain MXU matmuls with no transposes.)

Three implementations:
  * `selective_scan_ref`    : sequential `lax.scan` in fp32 -- the oracle.
  * `selective_scan_xla`    : `lax.associative_scan` -- differentiable,
                              runs anywhere, O(log L) depth.
  * `selective_scan_pallas` : fused Pallas TPU kernel; discretization,
                              scan, C-contraction, D-skip and silu(z) gate all
                              happen in VMEM so the (B, L, D, N) intermediates
                              never touch HBM. Backward is the fused
                              reverse-scan kernel in selective_scan_bwd.py.
                              Supports h0 seeding and last-state output
                              (sequence parallelism / inference caches); see
                              selective_scan_sp.py for the cross-chip
                              sequence-sharded wrapper.

The reference's `_cond` variants (`mamba_inner_fn_cond`) pass an
`init_states` tensor that the shipped CUDA kernel ignores (see
`/root/reference/causal-conv1d/csrc/causal_conv1d.cpp:128-140`, where all cond
pointers are commented out). We therefore do NOT model an initial state in the
default path; `h0` exists as an explicit opt-in extension.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "selective_scan",
    "selective_scan_ref",
    "selective_scan_xla",
    "selective_scan_pallas",
    "selective_scan_dtlow",
]


def _prep(u, delta, A, B, C, D, z, delta_bias, delta_softplus):
    """Common fp32 preprocessing: bias + softplus on delta."""
    dt = delta.astype(jnp.float32)
    if delta_bias is not None:
        dt = dt + delta_bias.astype(jnp.float32)[None, None, :]
    if delta_softplus:
        dt = jax.nn.softplus(dt)
    return dt


def _expand_groups(B, dim):
    """Grouped B/C (batch, L, G, N) -> per-channel (batch, L, dim, N).

    Mirrors the reference's variable-B ngroups mode
    (`selective_scan_interface.py:94`: B of shape (b, ngroups, dstate, l),
    each group driving dim/ngroups contiguous channels).  2-D-per-step
    inputs (batch, L, N) are the ngroups=1 fast path and are returned
    unchanged (broadcast later)."""
    if B.ndim == 3:
        return B
    batch, L, G, N = B.shape
    return jnp.repeat(B, dim // G, axis=2).reshape(batch, L, dim, N)


def selective_scan_ref(
    u, delta, A, B, C, D=None, z=None, delta_bias=None, delta_softplus=False,
    return_last_state=False,
):
    """Sequential fp32 oracle (mirrors reference selective_scan_ref)."""
    dtype_in = u.dtype
    batch, seqlen, dim = u.shape
    dstate = A.shape[1]
    uf = u.astype(jnp.float32)
    dt = _prep(u, delta, A, B, C, D, z, delta_bias, delta_softplus)
    Af = A.astype(jnp.float32)
    grouped = B.ndim == 4
    Bf = _expand_groups(B, dim).astype(jnp.float32)
    Cf = _expand_groups(C, dim).astype(jnp.float32)

    deltaA = jnp.exp(jnp.einsum("bld,dn->bldn", dt, Af))
    if grouped:
        deltaB_u = (dt * uf)[..., None] * Bf
    else:
        deltaB_u = jnp.einsum("bld,bln,bld->bldn", dt, Bf, uf)

    def step(h, inputs):
        a_t, x_t, c_t = inputs
        h = a_t * h + x_t
        if grouped:
            y = jnp.einsum("bdn,bdn->bd", h, c_t)
        else:
            y = jnp.einsum("bdn,bn->bd", h, c_t)
        return h, y

    h0 = jnp.zeros((batch, dim, dstate), jnp.float32)
    # scan over L: move L to leading axis
    last_state, ys = lax.scan(
        step,
        h0,
        (
            jnp.moveaxis(deltaA, 1, 0),
            jnp.moveaxis(deltaB_u, 1, 0),
            jnp.moveaxis(Cf, 1, 0),
        ),
    )
    y = jnp.moveaxis(ys, 0, 1)  # (B, L, D)
    out = y if D is None else y + uf * D.astype(jnp.float32)[None, None, :]
    if z is not None:
        zf = z.astype(jnp.float32)
        out = out * (zf * jax.nn.sigmoid(zf))
    out = out.astype(dtype_in)
    return (out, last_state) if return_last_state else out


def selective_scan_xla(
    u, delta, A, B, C, D=None, z=None, delta_bias=None, delta_softplus=False,
    return_last_state=False, h0=None,
):
    """`lax.associative_scan` implementation (differentiable, portable)."""
    dtype_in = u.dtype
    dim = u.shape[-1]
    uf = u.astype(jnp.float32)
    dt = _prep(u, delta, A, B, C, D, z, delta_bias, delta_softplus)
    Af = A.astype(jnp.float32)
    grouped = B.ndim == 4
    Bf = _expand_groups(B, dim).astype(jnp.float32)
    Cf = _expand_groups(C, dim).astype(jnp.float32)

    a = jnp.exp(jnp.einsum("bld,dn->bldn", dt, Af))
    x = (dt * uf)[..., None] * (Bf if grouped else Bf[:, :, None, :])

    def combine(left, right):
        a_l, x_l = left
        a_r, x_r = right
        return a_r * a_l, a_r * x_l + x_r

    a_cum, h = lax.associative_scan(combine, (a, x), axis=1)
    if h0 is not None:
        h = h + a_cum * h0[:, None].astype(jnp.float32)
    if grouped:
        y = jnp.einsum("bldn,bldn->bld", h, Cf)
    else:
        y = jnp.einsum("bldn,bln->bld", h, Cf)
    out = y if D is None else y + uf * D.astype(jnp.float32)[None, None, :]
    if z is not None:
        zf = z.astype(jnp.float32)
        out = out * (zf * jax.nn.sigmoid(zf))
    out = out.astype(dtype_in)
    return (out, h[:, -1]) if return_last_state else out


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------


def scan_rows(a, x, h0, n_state: int, chunk: int, d_block: int,
              sub: int = 8):
    """In-VMEM inclusive scan over (chunk * n_state, d_block) row arrays in
    (t, n)-row-major layout, seeded with h0 (n_state, d_block).

    Two-level schedule: statically-unrolled sequential sweep over sub-chunks
    of `sub` timesteps, each solved with a log2(sub)-step doubling scan.
    ~40% less VPU work than a single full-width doubling scan (measured on
    v5e) because the doubling width shrinks from chunk to sub.

    dtype follows a/x (fp32 default; bf16 rows are the opt-in
    DIMSUM_SCAN_ROWS_BF16 experiment, with the h0 fold-in computed in fp32).

    Returns (h_full (rows, d_block), h_last (n_state, d_block)).
    """
    f32 = jnp.float32
    sub = min(sub, chunk)
    if chunk % sub != 0:  # odd chunk lengths: one full-width doubling scan
        sub = chunk
    nsub = chunk // sub
    srows = sub * n_state
    h_prev = h0
    outs = []
    for i in range(nsub):  # static unroll
        aa = a[i * srows:(i + 1) * srows]
        xx = x[i * srows:(i + 1) * srows]
        # fold the carry into the first timestep (x_0' = x_0 + a_0 h_prev):
        # the inclusive scan then yields h directly -- no full-width
        # stitch multiply afterwards (fp32 fold keeps the carry path fp32
        # even when the row arrays are bf16)
        seed = (xx[:n_state].astype(f32)
                + aa[:n_state].astype(f32) * h_prev.astype(f32))
        xx = jnp.concatenate(
            [seed.astype(xx.dtype), xx[n_state:]], axis=0)
        k = 1
        while k < sub:
            # the top k*n rows are already final for this pass -- combine
            # only the shifted tail instead of padding with ones/zeros
            # (32% faster on v5e, bitwise identical)
            sh = k * n_state
            xx = jnp.concatenate(
                [xx[:sh], xx[sh:] + aa[sh:] * xx[: srows - sh]], axis=0)
            if k * 2 < sub:  # the final pass's aa products are dead
                aa = jnp.concatenate(
                    [aa[:sh], aa[sh:] * aa[: srows - sh]], axis=0)
            k *= 2
        outs.append(xx)
        h_prev = xx[srows - n_state:]
    h = outs[0] if nsub == 1 else jnp.concatenate(outs, axis=0)
    return h, h_prev.astype(f32)


def scan_rows_bk(a, x, h0, n_state: int, chunk: int, d_block: int):
    """Work-efficient (Brent-Kung) variant of `scan_rows` with sub=8.

    Same two-level structure (sequential sweep over 8-timestep sub-chunks,
    carry folded into the first timestep), but the in-sub-chunk solve uses
    the Brent-Kung up/down-sweep instead of the Sklansky doubling scan:
    11 row-block FMAs + 4 a-products per 8 blocks vs Sklansky's 17 + 13
    (~45% fewer combine ops), at the cost of strided block accesses and a
    final interleave.  Numerics: each output is an equivalent product/sum
    tree re-association; parity with scan_rows is at fp32 reassociation
    level (tested).

    Returns (h_full (rows, d_block), h_last (n_state, d_block))."""
    f32 = jnp.float32
    n = n_state
    assert chunk % 8 == 0
    nsub = chunk // 8
    srows = 8 * n
    h_prev = h0
    outs = []
    for i in range(nsub):  # static unroll
        aa = a[i * srows:(i + 1) * srows]
        xx = x[i * srows:(i + 1) * srows]
        # even/odd via a pairs reshape: strided leading-dim slices lower to
        # (unsupported) 3-D gathers in Mosaic, plain slices do not
        a4 = aa.reshape(4, 2, n, d_block)
        x4 = xx.reshape(4, 2, n, d_block)
        xe, xo = x4[:, 0], x4[:, 1]   # timesteps (0,2,4,6) / (1,3,5,7)
        ae, ao = a4[:, 0], a4[:, 1]
        # carry fold into timestep 0 (x0' = x0 + a0 h_prev)
        x0 = (xe[0].astype(f32) + ae[0].astype(f32) * h_prev.astype(f32)
              ).astype(xx.dtype)
        # pair combines at odd indices (1,3,5,7); element 0 uses the fold
        u0 = xo[0] + ao[0] * x0
        urest = xo[1:] + ao[1:] * xe[1:]              # (3, n, d): 3,5,7
        au = ao[1:] * ae[1:]                          # a-prods at 3,5,7
        v3 = urest[0] + au[0] * u0                    # prefix(0..3)
        p5 = urest[1] + au[1] * v3                    # prefix(0..5)
        w7 = (urest[2] + au[2] * urest[1]) + (au[2] * au[1]) * v3
        # downsweep: evens 2,4,6 fold the preceding odd prefix
        podd = jnp.stack([u0, v3, p5], axis=0)
        down = xe[1:] + ae[1:] * podd                 # prefixes at 2,4,6
        h8 = jnp.stack([x0, u0, down[0], v3, down[1], p5, down[2], w7],
                       axis=0)
        outs.append(h8.reshape(srows, d_block))
        h_prev = w7.astype(f32)
    h = outs[0] if nsub == 1 else jnp.concatenate(outs, axis=0)
    return h, h_prev


def scan_rows_rev_bk(a, p, w, n_state: int, chunk: int, d_block: int,
                     shift_g: bool = True):
    """Brent-Kung variant of `scan_rows_rev` (same semantics, see there):
    suffix scan e_t = p_t + g_t e_{t+1} with g = a shifted one block
    (shift_g=True, the backward-gradient recurrence) or g = a
    (shift_g=False, the reverse-direction primal).  11 FMA + 3 products
    per 8 timesteps vs the Sklansky suffix doubling's 17 + 13."""
    f32 = jnp.float32
    n = n_state
    assert chunk % 8 == 0
    nsub = chunk // 8
    srows = 8 * n
    if shift_g:
        g = jnp.concatenate([a[n:], jnp.ones((n, d_block), f32)], axis=0)
    else:
        g = a
    carry = w
    outs = [None] * nsub
    for i in range(nsub - 1, -1, -1):  # static unroll, last sub-chunk first
        gg = g[i * srows:(i + 1) * srows]
        pp = p[i * srows:(i + 1) * srows]
        g4 = gg.reshape(4, 2, n, d_block)
        p4 = pp.reshape(4, 2, n, d_block)
        ge, go = g4[:, 0], g4[:, 1]   # elements (0,2,4,6) / (1,3,5,7)
        pe, po = p4[:, 0], p4[:, 1]
        # carry fold into element 7 (e7 = p7 + g7 * carry)
        p7 = (po[3].astype(f32) + go[3].astype(f32) * carry.astype(f32)
              ).astype(pp.dtype)
        # pair suffixes at even indices: s_k = p_{2k} + g_{2k} p_{2k+1}
        s012 = pe[:3] + ge[:3] * po[:3]
        s3 = pe[3] + ge[3] * p7
        G = ge[:3] * go[:3]
        e4 = s012[2] + G[2] * s3      # suffix(4..7)
        e2 = s012[1] + G[1] * e4      # suffix(2..7)
        e0 = s012[0] + G[0] * e2      # suffix(0..7)
        enext = jnp.stack([e2, e4, s3], axis=0)
        odd = po[:3] + go[:3] * enext  # suffixes at 1, 3, 5
        h8 = jnp.stack([e0, odd[0], e2, odd[1], e4, odd[2], s3, p7],
                       axis=0)
        outs[i] = h8.reshape(srows, d_block)
        carry = e0.astype(f32)
    e = outs[0] if nsub == 1 else jnp.concatenate(outs, axis=0)
    if shift_g:
        w_out = a[:n] * e[:n]
    else:
        w_out = e[:n].astype(f32)
    return e, w_out


def scan_rows_rev(a, p, w, n_state: int, chunk: int, d_block: int,
                  sub: int = 8, shift_g: bool = True):
    """Suffix (reverse-time) scan:  e_t = p_t + a_{t+1} e_{t+1}, with the
    cross-chunk carry w entering as  e_last = p_last + w  (w is
    a_first * e_first of the temporally NEXT chunk, computed there).

    Flip-free (Mosaic has no `rev` lowering): coefficients are shifted one
    row-block toward the past (g_t = a_{t+1}, g_last = 1) and the doubling
    combines run downward; sub-chunks are processed last-to-first with the
    first-row e of each later sub-chunk as the fold-in carry.

    With `shift_g=False` the coefficients are NOT shifted (g_t = a_t) and the
    carry enters as e_last = p_last + a_last * w: this computes the
    reverse-direction PRIMAL recurrence  h_t = a_t * h_{t+1} + p_t  (the
    flip-free forward of a reversed-scan block), and w_out is e_first (the
    carry for the temporally-previous chunk).

    Returns (e_full (rows, d_block), w_out).
    """
    f32 = jnp.float32
    sub = min(sub, chunk)
    if chunk % sub != 0:  # odd chunk lengths: one full-width doubling scan
        sub = chunk
    nsub = chunk // sub
    srows = sub * n_state
    rows = chunk * n_state
    if shift_g:
        g = jnp.concatenate([a[n_state:], jnp.ones((n_state, d_block), f32)],
                            axis=0)
    else:
        g = a
    carry = w
    outs = [None] * nsub
    for i in range(nsub - 1, -1, -1):  # static unroll, last sub-chunk first
        gg = g[i * srows:(i + 1) * srows]
        pp = p[i * srows:(i + 1) * srows]
        # fold the carry into the last timestep (p_last' = p_last +
        # g_last * carry): the suffix scan then yields e directly, no
        # full-width stitch (mirror of the scan_rows seed trick)
        pp = jnp.concatenate(
            [pp[: srows - n_state],
             pp[srows - n_state:] + gg[srows - n_state:] * carry], axis=0)
        k = 1
        while k < sub:
            # mirror of scan_rows: the BOTTOM k*n rows are final; combine
            # only the upward-shifted head
            sh = k * n_state
            pp = jnp.concatenate(
                [pp[: srows - sh] + gg[: srows - sh] * pp[sh:], pp[srows - sh:]],
                axis=0)
            if k * 2 < sub:  # the final pass's gg products are dead
                gg = jnp.concatenate(
                    [gg[: srows - sh] * gg[sh:], gg[srows - sh:]], axis=0)
            k *= 2
        outs[i] = pp
        carry = pp[:n_state]
    e = outs[0] if nsub == 1 else jnp.concatenate(outs, axis=0)
    if shift_g:
        w_out = a[:n_state] * e[:n_state]
    else:
        w_out = e[:n_state].astype(f32)  # h at this chunk's first timestep
    return e, w_out


def bk_default() -> bool:
    """Brent-Kung combine schedule default (r3: +4.9% headline;
    DIMSUM_SCAN_BK=0 restores the Sklansky doubling)."""
    return os.environ.get("DIMSUM_SCAN_BK", "1") == "1"


def scan_rows_auto(a, x, h0, n_state: int, chunk: int, d_block: int,
                   sub: int = 8):
    """scan_rows with the Brent-Kung schedule when eligible."""
    if bk_default() and chunk % 8 == 0 and a.dtype == jnp.float32:
        return scan_rows_bk(a, x, h0, n_state, chunk, d_block)
    return scan_rows(a, x, h0, n_state, chunk, d_block, sub=sub)


def scan_rows_rev_auto(a, p, w, n_state: int, chunk: int, d_block: int,
                       sub: int = 8, shift_g: bool = True):
    """scan_rows_rev with the Brent-Kung schedule when eligible."""
    if bk_default() and chunk % 8 == 0 and a.dtype == jnp.float32:
        return scan_rows_rev_bk(a, p, w, n_state, chunk, d_block,
                                shift_g=shift_g)
    return scan_rows_rev(a, p, w, n_state, chunk, d_block, sub=sub,
                         shift_g=shift_g)


def _scan_kernel(*refs, **kw):
    """pallas_call entry point (kernels must return None)."""
    _scan_body(*refs, **kw)


def _scan_body(
    # refs (block views)
    u_ref, dt_ref, A_ref, B_ref, C_ref, D_ref, bias_ref, z_ref, h0_ref,
    dtw_ref,
    out_ref,
    # scratch
    h_ref,
    *,
    n_state: int,
    chunk: int,
    d_block: int,
    delta_softplus: bool,
    has_z: bool,
    has_d: bool,
    has_bias: bool,
    has_h0: bool,
    out_dtype,
    sub: int = 16,
    grouped: bool = False,
    rows_bf16: bool = False,
    dt_rank: int = 0,
    reverse: bool = False,
    bk: bool = False,
):
    l_idx = pl.program_id(2)

    @pl.when(l_idx == 0)
    def _reset():
        if has_h0:
            h_ref[:] = h0_ref[0].astype(jnp.float32)
        else:
            h_ref[:] = jnp.zeros_like(h_ref)

    f32 = jnp.float32
    u = u_ref[0].astype(f32)        # (chunk, d_block)
    if dt_rank:
        # fused dt_proj expansion: delta never exists at (B, L, dim) in HBM.
        # dt_low (chunk, r) @ dt_w (r, d_block) on the MXU, fp32 accumulate
        # (reference applies the same weight-only matmul before its kernel,
        # mamba/mamba_ssm/ops/selective_scan_interface.py:191-194).
        dt = jax.lax.dot(dt_ref[0], dtw_ref[:],
                         preferred_element_type=f32)  # (chunk, d_block)
    else:
        dt = dt_ref[0].astype(f32)      # (chunk, d_block)
    if has_bias:
        dt = dt + bias_ref[0][None, :].astype(f32)
    if delta_softplus:
        dt = jax.nn.softplus(dt)
    # exp(dt*A) as exp2(dt*(A*log2 e)): exp2 skips the base-e range
    # reduction on the VPU (~8% kernel time on v5e; 1e-5-level rounding
    # differences only)
    A = A_ref[:].astype(f32) * 1.4426950408889634  # (d_block, n_state)
    if grouped:
        Bm = B_ref[0, 0].astype(f32)    # (chunk, n_state), this d-block's group
        Cm = C_ref[0, 0].astype(f32)
    else:
        Bm = B_ref[0].astype(f32)       # (chunk, n_state)
        Cm = C_ref[0].astype(f32)

    rows = chunk * n_state
    # Row-major (t, n) layout on the sublane axis, channels on lanes.
    a = jnp.exp2(
        (dt[:, None, :] * A.T[None, :, :]).reshape(rows, d_block)
    )
    x = ((dt * u)[:, None, :] * Bm[:, :, None]).reshape(rows, d_block)
    if rows_bf16 and not reverse:
        # opt-in experiment (DIMSUM_SCAN_ROWS_BF16): bf16 row arrays
        # through the doubling combines, fp32 carry fold at sub-chunk seams
        # (not wired for reverse mode, whose carry fold is in-row)
        a = a.astype(jnp.bfloat16)
        x = x.astype(jnp.bfloat16)

    # Two-level inclusive scan seeded with the carried state.  Reverse mode
    # runs the reversed-time recurrence h_t = a_t h_{t+1} + x_t natively
    # (the block specs feed chunks in reverse temporal order), replacing the
    # reference's literal sequence flips (models_dim.py:1496-1507) with zero
    # relayout cost.
    if reverse:
        if bk and chunk % 8 == 0 and not rows_bf16:
            h, h_last = scan_rows_rev_bk(a, x, h_ref[:], n_state, chunk,
                                         d_block, shift_g=False)
        else:
            h, h_last = scan_rows_rev(a, x, h_ref[:], n_state, chunk,
                                      d_block, sub=sub, shift_g=False)
    elif bk and chunk % 8 == 0 and not rows_bf16:
        h, h_last = scan_rows_bk(a, x, h_ref[:], n_state, chunk, d_block)
    else:
        h, h_last = scan_rows(a, x, h_ref[:], n_state, chunk, d_block,
                              sub=sub)
    h_ref[:] = h_last

    y = (h.reshape(chunk, n_state, d_block) * Cm[:, :, None]).sum(axis=1)
    if has_d:
        y = y + u * D_ref[0][None, :].astype(f32)
    if has_z:
        zf = z_ref[0].astype(f32)
        y = y * (zf * jax.nn.sigmoid(zf))
    out_ref[0] = y.astype(out_dtype)
    return h


def _scan_kernel_with_state(
    u_ref, dt_ref, A_ref, B_ref, C_ref, D_ref, bias_ref, z_ref, h0_ref,
    dtw_ref, out_ref, last_ref, h_scratch, **kw,
):
    """Variant that also emits the final carried state (for sequence
    parallelism and inference caches)."""
    h = _scan_body(u_ref, dt_ref, A_ref, B_ref, C_ref, D_ref, bias_ref,
                   z_ref, h0_ref, dtw_ref, out_ref, h_scratch, **kw)
    last_ref[0] = h[h.shape[0] - kw["n_state"]:, :].astype(last_ref.dtype)


def _pick_blocks(seqlen: int, dim: int, n_state: int = 16):
    """Choose (chunk, d_block) so chunk divides L and d_block divides dim.

    The kernel's live row-arrays are (chunk * n_state, d_block) fp32; cap
    the product chunk*n_state at 2048 rows (2 MiB per array at d_block
    256) -- measured fastest r3, see the comment at the cap below -- so
    dstate up to 256 (the reference kernel's maximum,
    selective_scan.cpp:262) stays within the ~16 MB VMEM budget with
    double-buffering headroom.

    dims that are not a multiple of 128 return d_block=-1; the dispatcher
    pads the channel axis (see _pad_dim in selective_scan_pallas)."""
    if dim % 128 != 0:
        d_block = -1  # caller pads to a lane multiple
    else:
        d_block = dim
        # 256 first: fewer, fatter invocations measured fastest on v5e
        # (bench.py 0.9125 vs 0.9085 img/s at d_block 128, r2)
        for cand in (256, 128, 512):
            if dim % cand == 0:
                d_block = cand
                break
    env_db = int(os.environ.get("DIMSUM_SCAN_DBLOCK", "0"))
    if env_db and dim % env_db == 0:
        d_block = env_db  # experimentation override (benchmarks/scan_micro)
    # cap chunk * n_state at 2048 rows (2 MiB fp32 per row-array at
    # d_block 256): measured fastest r3 under the Brent-Kung schedule --
    # L=256 N=16: chunk 128 -> 1.0175 img/s vs 256 -> 1.0086/1.0107 and
    # 64 -> 1.0036 (smaller live arrays leave VMEM headroom for
    # double-buffering; the extra carry fold is one row-block FMA).
    # 512-res agrees (0.1886 vs 0.1879).  dstate up to 256 still fits.
    chunk = min(seqlen, max(8, 2048 // max(n_state, 1)))
    env_ck = int(os.environ.get("DIMSUM_SCAN_CHUNK", "0"))
    if env_ck and seqlen % env_ck == 0:
        chunk = min(env_ck, seqlen)
    while seqlen % chunk != 0:
        chunk //= 2
    if chunk < 8 and seqlen * n_state <= 4096:
        # odd seqlens (e.g. 175) with no power-of-two divisor under the
        # cap: one full-width chunk (the odd-chunk scan path) beats a
        # degenerate grid of 1-timestep invocations
        chunk = seqlen
    return max(chunk, 1), d_block


def _selective_scan_pallas_fwd_impl(
    u, delta, A, B, C, D, z, delta_bias, delta_softplus,
    h0=None, want_last_state=False, dt_w=None, reverse=False,
):
    """When `dt_w` is given, `delta` is the LOW-RANK (batch, L, r) dt_proj
    input and the (r, dim) expansion happens inside the kernel (one tiny MXU
    dot per grid cell), so the full (batch, L, dim) delta never round-trips
    HBM.  `reverse=True` runs the reversed-time recurrence natively (chunks
    visited last-to-first via the block index maps, suffix scan in-kernel)."""
    if reverse and (want_last_state or h0 is not None):
        raise NotImplementedError("reverse scan with h0/last_state")
    batch, seqlen, dim = u.shape
    n_state = A.shape[1]
    dt_rank = 0 if dt_w is None else int(dt_w.shape[0])
    chunk, d_block = _pick_blocks(seqlen, dim, n_state)
    grouped = B.ndim == 4
    n_groups = B.shape[2] if grouped else 1
    if grouped:
        # each d-block must live inside one group's channel range
        gw = dim // n_groups
        while d_block > 0 and gw % d_block != 0:
            d_block //= 2
    if d_block <= 0 or chunk < 1 or n_state % 8 != 0:
        raise ValueError("unsupported shape for pallas selective scan")

    has_z = z is not None
    has_d = D is not None
    has_bias = delta_bias is not None
    has_h0 = h0 is not None
    # Pallas wants concrete arrays; use harmless placeholders for absent
    # optionals (they are never read thanks to the static flags).
    D_in = (D if has_d else jnp.zeros((dim,), jnp.float32)).reshape(1, dim)
    bias_in = (
        delta_bias if has_bias else jnp.zeros((dim,), jnp.float32)
    ).reshape(1, dim)
    z_in = z if has_z else u  # placeholder, never read
    # h0 arrives as (batch, dim, n_state); kernel blocks are (n_state, d).
    h0_in = (jnp.swapaxes(h0, 1, 2).astype(jnp.float32) if has_h0
             else jnp.zeros((batch, n_state, dim), jnp.float32))

    grid = (batch, dim // d_block, seqlen // chunk)

    kw = dict(
        n_state=n_state,
        chunk=chunk,
        d_block=d_block,
        delta_softplus=delta_softplus,
        has_z=has_z,
        has_d=has_d,
        has_bias=has_bias,
        has_h0=has_h0,
        out_dtype=u.dtype,
        # sub=8 measured fastest on v5e at headline shapes (benchmarks/
        # scan_micro.py: 0.995ms vs 1.095ms at sub=16, B24 L256 D1024 N16).
        # An in-place scratch-ref doubling scan (slice-stores instead of
        # per-pass concatenates) was measured SLOWER (1.034ms): Mosaic keeps
        # the value-based concats in registers, and the 4MB scratch steals
        # double-buffering headroom. Negative result, do not revisit.
        sub=int(os.environ.get("DIMSUM_SCAN_SUB", "8")),
        grouped=grouped,
        rows_bf16=os.environ.get("DIMSUM_SCAN_ROWS_BF16", "0") == "1",
        dt_rank=dt_rank,
        reverse=reverse,
        # Brent-Kung combine schedule: DEFAULT since r3 -- measured
        # 1.0085 vs 0.9613 img/s on the headline bench (+4.9%; the
        # work-efficient tree does 11 FMA + 4 products per 8 timesteps vs
        # the trimmed Sklansky doubling's 17 + 13).  DIMSUM_SCAN_BK=0
        # restores the doubling schedule.
        bk=bk_default(),
    )

    # reverse mode visits L-chunks last-to-first: grid step l maps to the
    # temporally (nL-1-l)-th block, so the carried state flows backward
    n_l = seqlen // chunk
    lmap = (lambda l: n_l - 1 - l) if reverse else (lambda l: l)

    bld_spec = pl.BlockSpec(
        (1, chunk, d_block), lambda b, d, l: (b, lmap(l), d),
        memory_space=pltpu.VMEM,
    )
    if grouped:
        # (batch, G, L, N) layout so the block's trailing (chunk, n_state)
        # dims satisfy Mosaic's (8, =dim) tiling constraint
        dpg = (dim // n_groups) // d_block  # d-blocks per group
        bln_spec = pl.BlockSpec(
            (1, 1, chunk, n_state), lambda b, d, l: (b, d // dpg, lmap(l), 0),
            memory_space=pltpu.VMEM,
        )
    else:
        bln_spec = pl.BlockSpec(
            (1, chunk, n_state), lambda b, d, l: (b, lmap(l), 0),
            memory_space=pltpu.VMEM,
        )
    dn_spec = pl.BlockSpec(
        (d_block, n_state), lambda b, d, l: (d, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec(
        (1, d_block), lambda b, d, l: (0, d), memory_space=pltpu.VMEM
    )
    state_spec = pl.BlockSpec(
        (1, n_state, d_block), lambda b, d, l: (b, 0, d),
        memory_space=pltpu.VMEM,
    )

    if dt_rank:
        dt_spec = pl.BlockSpec(
            (1, chunk, dt_rank), lambda b, d, l: (b, lmap(l), 0),
            memory_space=pltpu.VMEM,
        )
        dtw_spec = pl.BlockSpec(
            (dt_rank, d_block), lambda b, d, l: (0, d),
            memory_space=pltpu.VMEM,
        )
        dtw_in = dt_w
    else:
        dt_spec = bld_spec
        dtw_spec = vec_spec  # placeholder, never read
        dtw_in = jnp.zeros((1, dim), u.dtype)

    in_specs = [
        bld_spec,   # u
        dt_spec,    # delta (full (B,L,dim), or (B,L,r) when dt_w is given)
        dn_spec,    # A
        bln_spec,   # B
        bln_spec,   # C
        vec_spec,   # D
        vec_spec,   # delta_bias
        bld_spec,   # z
        state_spec,  # h0
        dtw_spec,   # dt_w
    ]
    if grouped:
        B = jnp.swapaxes(B, 1, 2)  # (batch, G, L, N)
        C = jnp.swapaxes(C, 1, 2)
    args = (u, delta, A, B, C, D_in, bias_in, z_in, h0_in, dtw_in)
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    scratch = [pltpu.VMEM((n_state, d_block), jnp.float32)]

    if want_last_state:
        y, last = pl.pallas_call(
            functools.partial(_scan_kernel_with_state, **kw),
            grid=grid,
            in_specs=in_specs,
            out_specs=(bld_spec, state_spec),
            out_shape=(
                jax.ShapeDtypeStruct(u.shape, u.dtype),
                jax.ShapeDtypeStruct((batch, n_state, dim), jnp.float32),
            ),
            scratch_shapes=scratch,
            compiler_params=compiler_params,
        )(*args)
        return y, jnp.swapaxes(last, 1, 2)  # -> (batch, dim, n_state)

    return pl.pallas_call(
        functools.partial(_scan_kernel, **kw),
        grid=grid,
        in_specs=in_specs,
        out_specs=bld_spec,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        scratch_shapes=scratch,
        compiler_params=compiler_params,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _selective_scan_pallas(u, delta, A, B, C, D, z, delta_bias, delta_softplus):
    return _selective_scan_pallas_fwd_impl(
        u, delta, A, B, C, D, z, delta_bias, delta_softplus
    )


def _pallas_fwd(u, delta, A, B, C, D, z, delta_bias, delta_softplus):
    """Training-mode forward: additionally saves the pre-gate activations and
    chunk-boundary states consumed by the fused reverse-scan backward."""
    from dimsum_tpu.ops.selective_scan_bwd import selective_scan_fwd_train

    batch, seqlen, dim = u.shape
    chunk, d_block = _pick_blocks(seqlen, dim, A.shape[1])
    chunk = min(chunk, 128)  # the backward holds ~7 row-arrays live in VMEM
    y, o, boundaries = selective_scan_fwd_train(
        u, delta, A, B, C, D, z, delta_bias, delta_softplus,
        chunk=chunk, d_block=d_block,
    )
    return y, (u, delta, A, B, C, D, z, delta_bias, o, boundaries)


def _pallas_bwd(delta_softplus, res, g):
    from dimsum_tpu.ops.selective_scan_bwd import selective_scan_bwd_pallas

    u, delta, A, B, C, D, z, delta_bias, o, boundaries = res
    batch, seqlen, dim = u.shape
    chunk, d_block = _pick_blocks(seqlen, dim, A.shape[1])
    chunk = min(chunk, 128)  # must match the forward's boundary spacing
    du, ddelta, dA, dB, dC, dD, dz, dbias = selective_scan_bwd_pallas(
        u, delta, A, B, C, D, z, delta_bias, delta_softplus, o, boundaries,
        g, chunk=chunk, d_block=d_block,
    )
    return du, ddelta, dA, dB, dC, dD, dz, dbias


_selective_scan_pallas.defvjp(_pallas_fwd, _pallas_bwd)


def _flipL(v):
    return None if v is None else jnp.flip(v, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _selective_scan_pallas_dtlow(u, dt_low, dt_w, A, B, C, D, z, delta_bias,
                                 delta_softplus, reverse=False):
    """Fused dt_proj variant: delta = dt_low @ dt_w expanded IN-KERNEL.

    The inference path never materializes the (batch, L, dim) delta (saves
    one full HBM round-trip + a standalone small dot per mixer).  Training
    expands delta once in the fwd rule and reuses the fused reverse-scan
    backward, then projects ddelta back to (ddt_low, ddt_w).

    `reverse=True` runs the reversed-time recurrence natively in the kernel
    (no sequence flips) on the inference path; the training fwd/bwd rules
    express reverse through explicit flips around the existing fused
    machinery (gradients there are already HBM-bound, the flips are noise)."""
    return _selective_scan_pallas_fwd_impl(
        u, dt_low, A, B, C, D, z, delta_bias, delta_softplus, dt_w=dt_w,
        reverse=reverse,
    )


def _dtlow_fwd(u, dt_low, dt_w, A, B, C, D, z, delta_bias, delta_softplus,
               reverse=False):
    if reverse:
        u, dt_low, B, C, z = (_flipL(u), _flipL(dt_low), _flipL(B), _flipL(C),
                              _flipL(z))
    delta = jnp.einsum("blr,rd->bld", dt_low, dt_w)
    y, res = _pallas_fwd(u, delta, A, B, C, D, z, delta_bias, delta_softplus)
    if reverse:
        y = _flipL(y)
    return y, (res, dt_low, dt_w)


def _dtlow_bwd(delta_softplus, reverse, res, g):
    inner, dt_low, dt_w = res
    if reverse:
        g = _flipL(g)
    du, ddelta, dA, dB, dC, dD, dz, dbias = _pallas_bwd(
        delta_softplus, inner, g)
    ddt_low = jnp.einsum("bld,rd->blr", ddelta, dt_w).astype(dt_low.dtype)
    ddt_w = jnp.einsum("blr,bld->rd", dt_low, ddelta).astype(dt_w.dtype)
    if reverse:
        du, ddt_low, dB, dC, dz = (_flipL(du), _flipL(ddt_low), _flipL(dB),
                                   _flipL(dC), _flipL(dz))
    return du, ddt_low, ddt_w, dA, dB, dC, dD, dz, dbias


_selective_scan_pallas_dtlow.defvjp(_dtlow_fwd, _dtlow_bwd)


def selective_scan_dtlow(
    u, dt_low, dt_w, A, B, C, D=None, z=None, delta_bias=None,
    delta_softplus=False, impl: Optional[str] = None, reverse: bool = False,
):
    """selective_scan with the dt_proj expansion folded into the kernel.

    `dt_low`: (batch, L, r) dt_proj INPUT; `dt_w`: (r, dim) dt_proj weight
    (already cast to the compute dtype).  Semantics match
    `selective_scan(u, dt_low @ dt_w, ...)` exactly; on the Pallas path the
    expansion happens per grid cell on the MXU.  Reference applies the same
    weight-only matmul ahead of its CUDA kernel
    (`/root/reference/mamba/mamba_ssm/ops/selective_scan_interface.py:191`).

    `reverse=True` computes flip_L(selective_scan(flip_L(inputs))) -- the
    reversed-scan direction of bidirectional/alternating blocks (reference
    models_dim.py:1496-1507) -- with NO materialized flips on the Pallas
    inference path (native reverse-time kernel).
    """
    if impl is None:
        impl = "pallas" if _pallas_supported(u, A) else "xla"
    if impl != "pallas" or B.ndim == 4:
        delta = jnp.einsum("blr,rd->bld", dt_low, dt_w)
        if reverse:
            y = selective_scan(
                _flipL(u), _flipL(delta), A, _flipL(B), _flipL(C), D=D,
                z=_flipL(z), delta_bias=delta_bias,
                delta_softplus=delta_softplus, impl=impl,
            )
            return _flipL(y)
        return selective_scan(
            u, delta, A, B, C, D=D, z=z, delta_bias=delta_bias,
            delta_softplus=delta_softplus, impl=impl,
        )
    dim = u.shape[-1]
    pad = (-dim) % 128
    if pad:
        pd = ((0, 0), (0, 0), (0, pad))
        u = jnp.pad(u, pd)
        dt_w = jnp.pad(dt_w, ((0, 0), (0, pad)))
        A = jnp.pad(A, ((0, pad), (0, 0)), constant_values=-1.0)
        if D is not None:
            D = jnp.pad(D, (0, pad))
        if z is not None:
            z = jnp.pad(z, pd)
        if delta_bias is not None:
            delta_bias = jnp.pad(delta_bias, (0, pad))
    y = _selective_scan_pallas_dtlow(
        u, dt_low, dt_w, A, B, C, D, z, delta_bias, delta_softplus, reverse
    )
    return y[..., :dim] if pad else y


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _selective_scan_pallas_grouped(u, delta, A, B, C, D, z, delta_bias,
                                   delta_softplus):
    """ngroups mode (B/C (batch, L, G, N)): Pallas forward with per-group
    B/C block indexing; backward recomputes through the XLA path (grouped
    scans are op-level reference parity -- no DiMSUM model trains with
    G > 1, so the fused reverse-scan backward keeps its G=1 fast path)."""
    return _selective_scan_pallas_fwd_impl(
        u, delta, A, B, C, D, z, delta_bias, delta_softplus)


def _grouped_fwd(u, delta, A, B, C, D, z, delta_bias, delta_softplus):
    y = _selective_scan_pallas_fwd_impl(
        u, delta, A, B, C, D, z, delta_bias, delta_softplus)
    return y, (u, delta, A, B, C, D, z, delta_bias)


def _grouped_bwd(delta_softplus, res, g):
    u, delta, A, B, C, D, z, delta_bias = res
    _, vjp = jax.vjp(
        lambda u_, dt_, A_, B_, C_, D_, z_, bias_: selective_scan_xla(
            u_, dt_, A_, B_, C_, D=D_, z=z_, delta_bias=bias_,
            delta_softplus=delta_softplus),
        u, delta, A, B, C, D, z, delta_bias)
    return vjp(g)


_selective_scan_pallas_grouped.defvjp(_grouped_fwd, _grouped_bwd)


def selective_scan_pallas(
    u, delta, A, B, C, D=None, z=None, delta_bias=None, delta_softplus=False,
    return_last_state=False,
):
    if return_last_state:
        return selective_scan_xla(
            u, delta, A, B, C, D, z, delta_bias, delta_softplus,
            return_last_state=True,
        )
    dim = u.shape[-1]
    if B.ndim == 4:
        if dim % 128 != 0 or (dim // B.shape[2]) % 128 != 0:
            return selective_scan_xla(
                u, delta, A, B, C, D, z, delta_bias, delta_softplus)
        return _selective_scan_pallas_grouped(
            u, delta, A, B, C, D, z, delta_bias, delta_softplus)
    pad = (-dim) % 128
    if pad:
        # pad the channel axis to a lane multiple; padded channels carry
        # zeros (A rows = -1 keep exp(dt*A) bounded) and are sliced away
        pd = ((0, 0), (0, 0), (0, pad))
        u = jnp.pad(u, pd)
        delta = jnp.pad(delta, pd)
        A = jnp.pad(A, ((0, pad), (0, 0)), constant_values=-1.0)
        if D is not None:
            D = jnp.pad(D, (0, pad))
        if z is not None:
            z = jnp.pad(z, pd)
        if delta_bias is not None:
            delta_bias = jnp.pad(delta_bias, (0, pad))
    y = _selective_scan_pallas(
        u, delta, A, B, C, D, z, delta_bias, delta_softplus
    )
    return y[..., :dim] if pad else y


def _pallas_supported(u, A) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    batch, seqlen, dim = u.shape
    n_state = A.shape[1]
    chunk, d_block = _pick_blocks(seqlen, dim, n_state)
    # d_block == -1 (dim not a lane multiple) is fine: the dispatcher pads
    return n_state % 8 == 0 and seqlen % chunk == 0


def selective_scan(
    u, delta, A, B, C, D=None, z=None, delta_bias=None, delta_softplus=False,
    return_last_state=False, impl: Optional[str] = None,
):
    """Dispatching front-end.  impl in {None, 'ref', 'xla', 'pallas'}."""
    if impl is None:
        impl = "pallas" if _pallas_supported(u, A) else "xla"
    if impl == "ref":
        fn = selective_scan_ref
    elif impl == "xla":
        fn = selective_scan_xla
    elif impl == "pallas":
        fn = selective_scan_pallas
    else:
        raise ValueError(f"unknown selective_scan impl: {impl}")
    return fn(
        u, delta, A, B, C, D=D, z=z, delta_bias=delta_bias,
        delta_softplus=delta_softplus, return_last_state=return_last_state,
    )


def selective_state_update(state, x, dt, A, B, C, D=None, z=None,
                           dt_bias=None, dt_softplus=False):
    """Single-token decode step (reference: triton selective_state_update).

    state: (batch, dim, d_state); x, dt, z: (batch, dim); B, C: (batch, d_state)
    Returns (y, new_state).
    """
    f32 = jnp.float32
    dtf = dt.astype(f32)
    if dt_bias is not None:
        dtf = dtf + dt_bias.astype(f32)[None, :]
    if dt_softplus:
        dtf = jax.nn.softplus(dtf)
    dA = jnp.exp(dtf[..., None] * A.astype(f32)[None, :, :])
    dB = dtf[..., None] * B.astype(f32)[:, None, :]
    new_state = state.astype(f32) * dA + x.astype(f32)[..., None] * dB
    y = jnp.einsum("bdn,bn->bd", new_state, C.astype(f32))
    if D is not None:
        y = y + D.astype(f32)[None, :] * x.astype(f32)
    if z is not None:
        zf = z.astype(f32)
        y = y * (zf * jax.nn.sigmoid(zf))
    return y.astype(x.dtype), new_state.astype(state.dtype)
