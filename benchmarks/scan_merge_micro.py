"""Microbenchmark: merged vs separate half-mixer scans.

The DiM-L/2 "combined" block runs TWO independent d_inner=1024 selective
scans per block (spatial + frequency half-mixers) -> 32 Pallas calls per
forward.  Merging a pair into ONE call means concatenating channels and
carrying per-half B/C as ngroups=2.  This measures whether the launch/
pipeline-fill savings beat the concat cost:

  a) two separate d=1024 calls           (today's layout)
  b) one ngroups=2 call at d=2048        (the merge, concat included)
  c) one plain call at d=2048, shared B/C (upper bound, no group indexing)

Usage: python benchmarks/scan_merge_micro.py [--batch 24]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def time_call(fn, args, iters=30, inner=4):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--seqlen", type=int, default=256)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--dstate", type=int, default=16)
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--only", type=str, default=None,
                    help="run a single variant: two|grouped|shared")
    args = ap.parse_args()

    B, L, D, N = args.batch, args.seqlen, args.dim, args.dstate
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    bf16 = jnp.bfloat16

    def mk(i, shape, dtype=bf16, scale=1.0):
        return jax.random.normal(ks[i], shape, dtype) * scale

    u1, u2 = mk(0, (B, L, D)), mk(1, (B, L, D))
    dt1, dt2 = mk(2, (B, L, D), scale=0.1), mk(3, (B, L, D), scale=0.1)
    A1 = -jnp.exp(mk(4, (D, N), jnp.float32))
    A2 = -jnp.exp(mk(5, (D, N), jnp.float32))
    B1, B2 = mk(6, (B, L, N)), mk(7, (B, L, N))
    C1, C2 = mk(8, (B, L, N)), mk(9, (B, L, N))
    z1, z2 = mk(10, (B, L, D)), mk(11, (B, L, D))
    Dv1 = jnp.ones((D,), jnp.float32)
    Dv2 = jnp.ones((D,), jnp.float32) * 0.5
    bias = jnp.zeros((D,), jnp.float32)

    from dimsum_tpu.ops.selective_scan import _selective_scan_pallas_fwd_impl

    chain = args.chain

    def two_calls(u1, u2):
        a, b = u1, u2
        for _ in range(chain):
            a = _selective_scan_pallas_fwd_impl(
                a, dt1, A1, B1, C1, Dv1, z1, bias, True)
            b = _selective_scan_pallas_fwd_impl(
                b, dt2, A2, B2, C2, Dv2, z2, bias, True)
        return jnp.mean(a.astype(jnp.float32)) + jnp.mean(
            b.astype(jnp.float32))

    Ag = jnp.concatenate([A1, A2], axis=0)
    Dg = jnp.concatenate([Dv1, Dv2])
    biasg = jnp.concatenate([bias, bias])
    Bg = jnp.stack([B1, B2], axis=2)  # (B, L, G=2, N)
    Cg = jnp.stack([C1, C2], axis=2)

    def merged_grouped(u1, u2):
        a, b = u1, u2
        for _ in range(chain):
            ug = jnp.concatenate([a, b], axis=-1)
            dtg = jnp.concatenate([dt1, dt2], axis=-1)
            zg = jnp.concatenate([z1, z2], axis=-1)
            y = _selective_scan_pallas_fwd_impl(
                ug, dtg, Ag, Bg, Cg, Dg, zg, biasg, True)
            a, b = y[..., :D], y[..., D:]
        return jnp.mean(a.astype(jnp.float32)) + jnp.mean(
            b.astype(jnp.float32))

    def merged_shared(u1, u2):
        a, b = u1, u2
        for _ in range(chain):
            ug = jnp.concatenate([a, b], axis=-1)
            dtg = jnp.concatenate([dt1, dt2], axis=-1)
            zg = jnp.concatenate([z1, z2], axis=-1)
            y = _selective_scan_pallas_fwd_impl(
                ug, dtg, Ag, B1, C1, Dg, zg, biasg, True)
            a, b = y[..., :D], y[..., D:]
        return jnp.mean(a.astype(jnp.float32)) + jnp.mean(
            b.astype(jnp.float32))

    # correctness of the merge vs the two separate calls
    ya = _selective_scan_pallas_fwd_impl(u1, dt1, A1, B1, C1, Dv1, z1, bias,
                                         True)
    yb = _selective_scan_pallas_fwd_impl(u2, dt2, A2, B2, C2, Dv2, z2, bias,
                                         True)
    yg = _selective_scan_pallas_fwd_impl(
        jnp.concatenate([u1, u2], -1), jnp.concatenate([dt1, dt2], -1),
        Ag, Bg, Cg, Dg, jnp.concatenate([z1, z2], -1), biasg, True)
    err = float(jnp.max(jnp.abs(
        jnp.concatenate([ya, yb], -1).astype(jnp.float32)
        - yg.astype(jnp.float32))))
    print(f"merge parity maxdiff: {err:.2e}", flush=True)

    variants = {"two": ("two d=1024 calls", two_calls),
                "grouped": ("one ngroups=2 d=2048 (incl concat)",
                            merged_grouped),
                "shared": ("one shared-BC d=2048 (incl concat)",
                           merged_shared)}
    keys_ = [args.only] if args.only else list(variants)
    for k in keys_:
        name, fn = variants[k]
        ms = time_call(jax.jit(fn), (u1, u2), iters=20) * 1e3 / chain
        print(f"{name:38s} {ms:7.3f} ms/blockpair", flush=True)


if __name__ == "__main__":
    main()
