"""Microbenchmark: the Pallas selective-scan forward at headline shapes.

Sweeps the two-level scan schedule's sub-chunk width (DIMSUM_SCAN_SUB) and
the (chunk, d_block) tiling (DIMSUM_SCAN_CHUNK / DIMSUM_SCAN_DBLOCK) on the
real chip, printing ms/call and effective bytes/s.  Headline shapes are the
DiM-L/2 "combined" half-mixers: B = 2*batch (CFG), L = 256 tokens,
d_inner = 1024, d_state = 16 (32 such calls per forward).

Usage:  python benchmarks/scan_micro.py [--batch 24] [--iters 50]
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


def time_call(fn, args, iters, inner: int = 4):
    """Min over `iters` timings of `inner` back-to-back calls (min is the
    right statistic against tunnel-latency spikes); fn must return a SCALAR
    so the forced sync transfer is negligible."""
    np.asarray(fn(*args))  # compile + warmup, force completion
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
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--chain", type=int, default=16,
                    help="scan applications chained inside one jitted "
                         "program (amortizes tunnel dispatch latency)")
    ap.add_argument("--subs", type=str, default="4,8,16,32")
    ap.add_argument("--chunks", type=str, default="0")
    ap.add_argument("--dblocks", type=str, default="0")
    args = ap.parse_args()

    B, L, D, N = args.batch, args.seqlen, args.dim, args.dstate
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    bf16 = jnp.bfloat16
    u = jax.random.normal(ks[0], (B, L, D), bf16)
    dt = jax.random.normal(ks[1], (B, L, D), bf16) * 0.1
    A = -jnp.exp(jax.random.normal(ks[2], (D, N), jnp.float32))
    Bm = jax.random.normal(ks[3], (B, L, N), bf16)
    Cm = jax.random.normal(ks[4], (B, L, N), bf16)
    Dv = jax.random.normal(ks[5], (D,), jnp.float32)
    z = jax.random.normal(ks[6], (B, L, D), bf16)
    bias = jax.random.normal(ks[7], (D,), jnp.float32) * 0.1

    inputs = (u, dt, A, Bm, Cm, Dv, z, bias)
    io_bytes = sum(int(np.prod(t.shape)) * t.dtype.itemsize for t in inputs)
    io_bytes += u.size * u.dtype.itemsize  # output

    import importlib

    ss = importlib.import_module("dimsum_tpu.ops.selective_scan")

    ref_out = None
    for sub in [int(s) for s in args.subs.split(",")]:
        for chunk in [int(c) for c in args.chunks.split(",")]:
            for db in [int(d) for d in args.dblocks.split(",")]:
                os.environ["DIMSUM_SCAN_SUB"] = str(sub)
                os.environ["DIMSUM_SCAN_CHUNK"] = str(chunk)
                os.environ["DIMSUM_SCAN_DBLOCK"] = str(db)

                chain = args.chain

                def call_one(u, dt, A, Bm, Cm, Dv, z, bias):
                    return ss._selective_scan_pallas_fwd_impl(
                        u, dt, A, Bm, Cm, Dv, z, bias, True)

                def call(u, dt, A, Bm, Cm, Dv, z, bias):
                    y = u
                    for _ in range(chain):
                        y = call_one(y, dt, A, Bm, Cm, Dv, z, bias)
                    # values may overflow through the chain -- irrelevant,
                    # TPU timing is data-independent; only the final scalar
                    # transfer matters for sync
                    return jnp.mean(y.astype(jnp.float32))

                fn = jax.jit(call)  # fresh fn per config -> fresh trace
                try:
                    ms = time_call(fn, inputs, args.iters) * 1e3 / chain
                except Exception as e:  # VMEM OOM etc.
                    print(f"sub={sub:3d} chunk={chunk:4d} db={db:4d}  "
                          f"FAILED: {type(e).__name__}")
                    continue
                out = np.asarray(jax.jit(call_one)(*inputs), np.float32)
                if ref_out is None:
                    ref_out = out
                    err = 0.0
                else:
                    err = float(np.max(np.abs(out - ref_out)))
                gbs = io_bytes / (ms / 1e3) / 1e9
                print(f"sub={sub:3d} chunk={chunk:4d} db={db:4d}  "
                      f"{ms:7.3f} ms  {gbs:6.1f} GB/s  maxdiff={err:.2e}")


if __name__ == "__main__":
    main()
