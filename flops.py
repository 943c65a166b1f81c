"""FLOPs / throughput / memory probes.

Reference: `/root/reference/eval_toolbox/compute_flops.py` (calflops FLOPs +
throughput and memory probes :14-41).  TPU-native: FLOPs come from XLA's own
cost analysis of the compiled program (exact, not hook-based estimation);
memory from the compiled executable's reserved bytes; throughput measured
with a forced device sync.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def analyze(fn, *args):
    """Returns dict(flops, peak_bytes) for jitted fn at these args."""
    import jax

    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", -1)) if cost else -1.0
    try:
        mem = compiled.memory_analysis()
        peak = int(getattr(mem, "temp_size_in_bytes", 0)
                   + getattr(mem, "argument_size_in_bytes", 0)
                   + getattr(mem, "output_size_in_bytes", 0))
    except Exception:
        peak = -1
    return {"flops": flops, "peak_bytes": peak, "compiled": compiled}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="DiM-L/2")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--block-type", type=str, default="combined")
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--measure-throughput", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from dimsum_tpu.models.dim import DiM, DiM_models

    cfg = DiM_models[args.model](
        img_resolution=args.image_size // 8, num_classes=args.num_classes,
        rms_norm=True, block_type=args.block_type, cond_mamba=True,
        learnable_pe=True, use_attn_every_k_layers=4)
    model = DiM(cfg)
    x = jnp.zeros((args.batch, cfg.in_channels, cfg.img_resolution,
                   cfg.img_resolution))
    t = jnp.zeros((args.batch,))
    y = jnp.zeros((args.batch,), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, y)
    n_params = sum(int(np.prod(p_.shape))
                   for p_ in jax.tree.leaves(params))

    info = analyze(lambda p_, x_, t_, y_: model.apply(p_, x_, t_, y_),
                   params, x, t, y)
    out = {
        "model": args.model,
        "params_M": round(n_params / 1e6, 2),
        "forward_gflops": round(info["flops"] / 1e9, 2),
        "peak_bytes_GB": round(info["peak_bytes"] / 1e9, 3),
    }
    if args.measure_throughput:
        f = jax.jit(model.apply)
        r = f(params, x, t, y)
        np.asarray(r)
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            r = f(params, x, t, y)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / iters
        out["forward_ms"] = round(dt * 1e3, 3)
        out["img_per_sec"] = round(args.batch / dt, 2)
        if info["flops"] > 0:
            out["achieved_tflops"] = round(info["flops"] / dt / 1e12, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
