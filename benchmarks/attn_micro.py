"""Microbenchmark: attention implementations at DiM 512-res shapes.

The r3 profile showed the stock Pallas flash kernel at ~8.6 TF/s (23x off
MXU peak) for the cross-attention shapes (B=8, H=8, L=1024, Dh=64) -- this
sweeps XLA dot_product_attention vs flash with several BlockSizes at the
DiT (16-head) and CrossAttentionFusion (8-head) shapes.

Usage: python benchmarks/attn_micro.py [--batch 8] [--seqlen 1024]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def time_call(fn, args, iters=20, inner=8):
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seqlen", type=int, default=1024)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()

    B, L = args.batch, args.seqlen
    for H, Dh, tag in ((16, 64, "DiT attn"), (8, 64, "cross-attn")):
        k = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(k[0], (B, H, L, Dh), jnp.bfloat16)
        kk = jax.random.normal(k[1], (B, H, L, Dh), jnp.bfloat16)
        v = jax.random.normal(k[2], (B, H, L, Dh), jnp.bfloat16)
        flops = 4 * B * H * L * L * Dh

        def bench(name, fn):
            def chain(q, kk, v):
                o = q
                for _ in range(args.chain):
                    o = fn(o, kk, v)
                return jnp.mean(o.astype(jnp.float32))

            try:
                ms = time_call(jax.jit(chain), (q, kk, v)) * 1e3 / args.chain
            except Exception as e:
                print(f"  {tag:11s} {name:28s} FAILED {type(e).__name__}")
                return
            print(f"  {tag:11s} {name:28s} {ms:7.3f} ms "
                  f"{flops / (ms / 1e3) / 1e12:6.1f} TF/s", flush=True)

        def xla(q, kk, v):
            blhd = lambda t: t.transpose(0, 2, 1, 3)
            o = jax.nn.dot_product_attention(blhd(q), blhd(kk), blhd(v))
            return o.transpose(0, 2, 1, 3)

        bench("xla dot_product_attention", xla)

        from dimsum_tpu.ops.full_attention import (_build_call,
                                                   full_block_attention)

        def full_block_raw(q, kk, v):
            call = _build_call(B * H, L, Dh, q.dtype.name, False)
            scale = jnp.asarray(Dh ** -0.5, q.dtype)
            return call((q * scale).reshape(B * H, L, Dh),
                        kk.reshape(B * H, L, Dh),
                        v.reshape(B * H, L, Dh)).reshape(B, H, L, Dh)

        def full_block_wired(q, kk, v):
            # in-model layout (B, L, H, Dh): includes the transposes the
            # model path pays, same convention as the xla entry
            blhd = lambda t: t.transpose(0, 2, 1, 3)
            o = full_block_attention(blhd(q), blhd(kk), blhd(v), Dh ** -0.5)
            return o.transpose(0, 2, 1, 3)

        bench("full-block kernel (raw)", full_block_raw)
        bench("full-block kernel (wired)", full_block_wired)

        for qb in (256, 512):
            def full_block_qb(q, kk, v, qb=qb):
                call = _build_call(B * H, L, Dh, q.dtype.name, False, qb=qb)
                scale = jnp.asarray(Dh ** -0.5, q.dtype)
                return call((q * scale).reshape(B * H, L, Dh),
                            kk.reshape(B * H, L, Dh),
                            v.reshape(B * H, L, Dh)).reshape(B, H, L, Dh)

            bench(f"full-block qb={qb} (raw)", full_block_qb)

        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention)

        bench("flash default", functools.partial(
            flash_attention, sm_scale=Dh ** -0.5))
        for bq, bk in ((512, 512), (1024, 512), (1024, 1024), (256, 1024)):
            bs = BlockSizes(
                block_q=min(bq, L), block_k_major=min(bk, L),
                block_k=min(bk, L), block_b=1,
                block_q_major_dkv=min(bq, L), block_k_major_dkv=min(bk, L),
                block_q_dkv=min(bq, L), block_k_dkv=min(bk, L),
                block_q_dq=min(bq, L), block_k_dq=min(bk, L),
                block_k_major_dq=min(bk, L))
            bench(f"flash bq={bq} bk={bk}", functools.partial(
                flash_attention, sm_scale=Dh ** -0.5, block_sizes=bs))


if __name__ == "__main__":
    main()
