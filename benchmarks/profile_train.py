"""Device-trace decomposition of one DiM training step (the TRAINING.md
configuration: DiM-B/2 "combined", global batch 32, bf16 compute, fused
Pallas reverse-scan backward, AdamW + EMA tail).

Same methodology as profile_fwd.py: jax.profiler trace through the axon
tunnel, device track (pid 3), aggregate by defining opcode.

Usage: python benchmarks/profile_train.py [--batch 32] [--reps 4]
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

from profile_fwd import categorize  # noqa: E402  (same dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--model", type=str, default="DiM-B/2")
    ap.add_argument("--fp32", action="store_true",
                    help="fp32 compute instead of the --bf16 recipe")
    ap.add_argument("--grad-checkpoint", action="store_true",
                    help="remat each block (needed for DiM-L/2 at bs>=16)")
    ap.add_argument("--remat-policy", type=str, default=None,
                    help="checkpoint policy: scan | dots_scan (see "
                         "dimsum_tpu/models/dim.py)")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--logdir", type=str, default="/tmp/dimsum_prof_train")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    from dimsum_tpu.models.dim import DiM, DiM_models
    from dimsum_tpu.parallel import (
        create_optimizer, create_train_state, make_train_step,
    )
    from dimsum_tpu.transport import create_transport

    cfg = DiM_models[args.model](
        img_resolution=32, num_classes=8, rms_norm=True,
        block_type="combined", cond_mamba=True, learnable_pe=True,
        use_attn_every_k_layers=4, label_dropout=0.15,
        grad_checkpoint=args.grad_checkpoint,
        remat_policy=args.remat_policy,
        dtype=jnp.float32 if args.fp32 else jnp.bfloat16)
    model = DiM(cfg)
    transport = create_transport("GVP", "velocity")
    optimizer = create_optimizer(1e-4, weight_decay=0.0)

    B = args.batch
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 4, 32, 32), jnp.float32)
    y = jnp.zeros((B,), jnp.int32)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 4, 32, 32)), jnp.zeros((1,)),
                        jnp.zeros((1,), jnp.int32))["params"]
    state = create_train_state(params, optimizer)
    step = make_train_step(model, transport, optimizer, mesh=None,
                           max_grad_norm=1.0, use_labels=True)

    k = jax.random.PRNGKey(2)
    state, metrics = step(state, x, y, k)  # compile
    np.asarray(metrics["loss"])

    jax.profiler.start_trace(args.logdir)
    for _ in range(args.reps):
        state, metrics = step(state, x, y, k)
    np.asarray(metrics["loss"])
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
        if short.startswith("jit_") or short.isdigit():
            # numeric names are umbrella spans (per-rep program executions /
            # remat call regions) that double-count their children
            continue
        name = e.get("args", {}).get("long_name", short)
        dur = e.get("dur", 0) / 1e3 / args.reps
        key = short + " | " + name[:90]
        by_name[key] += dur
        by_count[key] += 1
        cat = categorize(short, name)
        by_cat[cat] += dur
        name_cat[key] = cat

    total = sum(by_cat.values())
    print(f"\n== per-train-step device time (batch {B}, {args.reps} reps): "
          f"{total:.2f} ms ==")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:24s} {ms:8.2f} ms  {100 * ms / total:5.1f}%")
    print(f"\n== top {args.top} ops ==")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {ms:8.3f} ms  x{by_count[name] // args.reps:<3d} {name}")

    for want in ("fusion (elementwise)", "layout", "reduce", "other"):
        items = [(n, ms) for n, ms in by_name.items() if name_cat[n] == want]
        if not items:
            continue
        print(f"\n== {want}: top 20 of {len(items)} "
              f"(total {sum(ms for _, ms in items):.2f} ms) ==")
        for name, ms in sorted(items, key=lambda kv: -kv[1])[:20]:
            print(f"  {ms:8.3f} ms  x{by_count[name] // args.reps:<3d} "
                  f"{name[:160]}")


if __name__ == "__main__":
    main()
