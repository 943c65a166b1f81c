"""Microbenchmark: fused wavelet pack vs the local_scan(dwt_tokens())
composition at the DiM-L/2 combined freq-branch shape (B=48 CFG-doubled
half-batch... the freq half sees (2*batch, 256, 512)).

Usage: python benchmarks/wavelet_micro.py [--batch 48]
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


def time_call(fn, args, iters=20, inner=4):
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
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--side", type=int, default=16)
    ap.add_argument("--channels", type=int, default=512)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()

    from dimsum_tpu.ops.scan_orders import local_reverse, local_scan
    from dimsum_tpu.ops.wavelet import (
        dwt_tokens, idwt_tokens, wavelet_pack_windowed,
        wavelet_unpack_windowed,
    )

    B, side, C = args.batch, args.side, args.channels
    L = side * side
    window = side // 4
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, C), jnp.bfloat16)
    chain = args.chain

    def old_path(x, cf):
        y = x
        for _ in range(chain):
            y = local_scan(dwt_tokens(y, 2), w=window, H=side, W=side,
                           column_first=cf)
            y = idwt_tokens(local_reverse(y, w=window, H=side, W=side,
                                          column_first=cf), 2)
        return jnp.mean(y.astype(jnp.float32))

    def new_path(x, cf):
        y = x
        for _ in range(chain):
            y = wavelet_pack_windowed(y, 2, column_first=cf)
            y = wavelet_unpack_windowed(y, 2, column_first=cf)
        return jnp.mean(y.astype(jnp.float32))

    for cf in (False, True):
        a = time_call(jax.jit(lambda x: old_path(x, cf)), (x,)) * 1e3 / chain
        b = time_call(jax.jit(lambda x: new_path(x, cf)), (x,)) * 1e3 / chain
        print(f"column_first={cf}: composition {a:7.3f} ms/roundtrip, "
              f"fused {b:7.3f} ms/roundtrip", flush=True)


if __name__ == "__main__":
    main()
