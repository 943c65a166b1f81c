"""Device-trace decomposition of one DiM-L/2 forward (the bench.py model
eval): captures a jax.profiler trace through the axon tunnel, parses the
device track (vm.trace.json.gz, pid 3), and aggregates op time by
category.  This is the r2/r3 BENCH.md methodology in one command.

Usage: python benchmarks/profile_fwd.py [--batch 24] [--reps 6]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def categorize(name: str, long_name: str = "") -> str:
    n = name.lower()
    ln = long_name.lower()
    if "flash" in n or "attention" in n:
        return "attention kernel"
    # NOTE: a fusion's long_name embeds its operand expressions (e.g.
    # "fusion(..., custom-call(...))"), so only the DEFINING opcode -- the
    # token right after the "= type{layout}" -- identifies a kernel call
    import re
    defining = re.search(r"= \S+ (\w[\w-]*)\(", ln)
    opcode = defining.group(1) if defining else ""
    if ("scan_kernel" in n or "pallas" in n or "_scan_branch" in n
            or opcode == "custom-call" or n == "custom-call"):
        return "pallas scan"
    if "convolution" in n or "dot" in n:
        return "matmul/conv"
    if "transpose" in n or "copy" in n or "reshape" in n:
        return "layout"
    if "fusion" in n:
        return "fusion (elementwise)"
    if "reduce" in n:
        return "reduce"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--logdir", type=str, default="/tmp/dimsum_prof")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    from dimsum_tpu.models.dim import DiM, DiMConfig

    latent = args.image_size // 8
    cfg = DiMConfig(img_resolution=latent, patch_size=2, hidden_size=1024,
                    depth=16, num_classes=1000, rms_norm=True,
                    block_type="combined", cond_mamba=True,
                    learnable_pe=True, use_attn_every_k_layers=4,
                    dtype=jnp.bfloat16)
    model = DiM(cfg)
    B = args.batch
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 4, latent, latent))
    t = jnp.full((B,), 0.5)
    y = jnp.zeros((B,), jnp.int32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(1), x, t, y)
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    fwd = jax.jit(lambda p, x, t, y: model.apply(p, x, t, y))
    np.asarray(fwd(params, x, t, y))  # compile

    jax.profiler.start_trace(args.logdir)
    for _ in range(args.reps):
        out = fwd(params, x, t, y)
    np.asarray(out)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(
        os.path.join(args.logdir, "plugins/profile/*/*.trace.json.gz")))
    assert paths, f"no trace under {args.logdir}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    events = [e for e in trace["traceEvents"]
              if e.get("ph") == "X" and e.get("pid") == 3]
    by_name = defaultdict(float)
    by_count = defaultdict(int)
    by_cat = defaultdict(float)
    name_cat = {}
    for e in events:
        short = e.get("name", "?")
        if short.startswith("jit_"):
            # module-level span enclosing the whole executable -- summing
            # it alongside its leaf ops double-counts the forward
            continue
        name = e.get("args", {}).get("long_name", short)
        dur = e.get("dur", 0) / 1e3 / args.reps  # us -> ms, per forward
        key = short + " | " + name[:90]
        by_name[key] += dur
        by_count[key] += 1
        # categorize from the FULL long_name once; the truncated key can
        # defeat the defining-opcode regex and disagree with the summary
        cat = categorize(short, name)
        by_cat[cat] += dur
        name_cat[key] = cat

    total = sum(by_cat.values())
    print(f"\n== per-forward device time (batch {B}, {args.reps} reps): "
          f"{total:.2f} ms ==")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:24s} {ms:8.2f} ms  {100 * ms / total:5.1f}%")
    print(f"\n== top {args.top} ops ==")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {ms:8.3f} ms  x{by_count[name] // args.reps:<3d} {name}")

    # per-category breakdown: where do the addressable (non-matmul,
    # non-scan) milliseconds live?
    for want in ("fusion (elementwise)", "layout", "reduce", "other"):
        items = [(n, ms) for n, ms in by_name.items()
                 if name_cat[n] == want]
        if not items:
            continue
        print(f"\n== {want}: top 20 of {len(items)} "
              f"(total {sum(ms for _, ms in items):.2f} ms) ==")
        for name, ms in sorted(items, key=lambda kv: -kv[1])[:20]:
            print(f"  {ms:8.3f} ms  x{by_count[name] // args.reps:<3d} "
                  f"{name[:160]}")


if __name__ == "__main__":
    main()
