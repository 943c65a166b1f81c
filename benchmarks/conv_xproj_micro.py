"""Micro-benchmark: fused conv_xproj Pallas kernel vs the unfused
conv-fusion + XLA dot at the DiM-L/2 headline mixer shapes.

Run on TPU:  python benchmarks/conv_xproj_micro.py [--L 256] [--D 2048]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dimsum_tpu.ops.conv_xproj import _conv_xproj_impl, conv_xproj_ref


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=24)
    p.add_argument("--L", type=int, default=256)
    p.add_argument("--D", type=int, default=2048)
    p.add_argument("--R", type=int, default=96)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    k = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(k[0], (args.B, args.L, args.D), jnp.bfloat16)
    conv_w = jax.random.normal(k[1], (args.D, 4), jnp.float32) * 0.3
    conv_b = jax.random.normal(k[2], (args.D,), jnp.float32) * 0.1
    w_xp = jax.random.normal(k[3], (args.D, args.R), jnp.float32) \
        * (args.D ** -0.5)

    # chain iterations through a data dependency so the whole run is one
    # dispatch (tunnel latency amortized), mirroring scan_micro.py
    def chain(fn):
        def run(x0):
            def body(c, _):
                xc, xd = fn(c, conv_w, conv_b, w_xp)
                return c + xc * 1e-6 + jnp.sum(xd).astype(c.dtype) * 1e-12, None
            out, _ = jax.lax.scan(body, x0, None, length=args.iters)
            return out
        return jax.jit(run)

    fused = chain(lambda *a: _conv_xproj_impl(*a, reverse=False))
    unfused = chain(lambda *a: conv_xproj_ref(*a))

    for name, fn in [("unfused", unfused), ("fused", fused)]:
        r = fn(x)
        r.block_until_ready()  # compile + warm
        t0 = time.perf_counter()
        for _ in range(3):
            r = fn(x)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / (3 * args.iters) * 1e3
        print(f"{name:8s}: {dt:.4f} ms/call "
              f"({args.B}x{args.L}x{args.D} -> R={args.R})")


if __name__ == "__main__":
    main()
