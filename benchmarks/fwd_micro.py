"""Microbenchmark: one DiM-L/2 "combined" forward (the headline model) at
several model batch sizes, min-stat timed on the real chip.  Decomposes the
throughput-vs-batch curve of bench.py: the 250-step sampler is 250x this
forward plus a trivial Euler update.

Usage: python benchmarks/fwd_micro.py [--batches 16,24,32,48] [--iters 8]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="16,24,32,48")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--attn-every-k", type=int, default=4)
    args = ap.parse_args()

    from dimsum_tpu.models.dim import DiM, DiMConfig

    cfg = DiMConfig(img_resolution=32, patch_size=2, hidden_size=1024,
                    depth=args.depth, num_classes=1000, rms_norm=True,
                    block_type="combined", cond_mamba=True,
                    learnable_pe=True,
                    use_attn_every_k_layers=args.attn_every_k,
                    dtype=jnp.bfloat16)
    model = DiM(cfg)

    for B in [int(b) for b in args.batches.split(",")]:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, 4, 32, 32),
                              jnp.float32)
        t = jnp.full((B,), 0.5, jnp.float32)
        y = jnp.zeros((B,), jnp.int32)
        # placeholder weights: timing needs shapes, not values (init of the
        # 460M model is its own slow compile through the relay)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(1), x, t, y)
        params = jax.tree.map(
            lambda s: (jnp.full(s.shape, 0.02, s.dtype)
                       if s.dtype != jnp.int32 else jnp.zeros(s.shape, s.dtype)),
            shapes)
        chain = args.chain

        @jax.jit
        def fwd(params, x, t, y):
            out = x
            for _ in range(chain):
                out = model.apply(params, out, t, y)[:, :4]
                out = out * jax.lax.rsqrt(
                    jnp.mean(jnp.square(out)) + 1e-6)
            return jnp.mean(out)

        np.asarray(fwd(params, x, t, y))
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(fwd(params, x, t, y))
            best = min(best, (time.perf_counter() - t0) / chain)
        ms = best * 1e3
        print(f"B={B:3d}  {ms:8.2f} ms  {ms / B * 1e3:7.1f} us/img "
              f"  {B / best:7.1f} img/s(fwd)")


if __name__ == "__main__":
    main()
