"""Wall-clock training-step benchmark (TPU, tunnel-noise-aware).

Times a chain of N donated train steps with one final block (the tunnel's
8-45 ms dispatch latency amortizes over the chain, BENCH.md methodology),
reporting ms/step and img/s/chip.  Supports the flagship recipe shapes:

  python benchmarks/train_bench.py --model DiM-L/2 --batch 16 --bf16
  python benchmarks/train_bench.py --model DiM-L/2 --batch 88 --grad-accum 8

Reference anchor: the ImageNet recipe trains DiM-L/2 at global batch 704 on
8 GPUs = 88/chip (/root/reference/scripts/train.sh); with --grad-accum 8
each microbatch is 11/chip.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", type=str, default="DiM-L/2")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--grad-checkpoint", action="store_true",
                    help="remat each block (for batches whose activations "
                         "exceed HBM)")
    ap.add_argument("--remat-policy", type=str, default=None,
                    help="none | dots | scan | dots_scan")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--compile-only", action="store_true",
                    help="AOT-compile the step-chain program into the "
                         "persistent XLA cache and exit without executing "
                         "(params/opt state stay abstract via eval_shape)")
    args = ap.parse_args()

    from dimsum_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from dimsum_tpu.models.dim import DiM, DiM_models
    from dimsum_tpu.parallel import (
        create_optimizer, create_train_state, make_train_step,
    )
    from dimsum_tpu.transport import create_transport

    latent = args.image_size // 8
    cfg = DiM_models[args.model](
        img_resolution=latent, num_classes=1000, rms_norm=True,
        block_type="combined", cond_mamba=True, learnable_pe=True,
        use_attn_every_k_layers=4, label_dropout=0.15,
        grad_checkpoint=args.grad_checkpoint,
        remat_policy=args.remat_policy,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    model = DiM(cfg)
    transport = create_transport("GVP", "velocity")
    optimizer = create_optimizer(1e-4, weight_decay=0.0)

    B = args.batch
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 4, latent, latent),
                          jnp.float32)
    y = (jnp.arange(B) % 1000).astype(jnp.int32)
    if args.compile_only:
        params = jax.eval_shape(
            model.init, jax.random.PRNGKey(1),
            jnp.zeros((1, 4, latent, latent)),
            jnp.zeros((1,)), jnp.zeros((1,), jnp.int32))["params"]
        state = jax.eval_shape(lambda p: create_train_state(p, optimizer),
                               params)
    else:
        params = model.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 4, latent, latent)),
                            jnp.zeros((1,)),
                            jnp.zeros((1,), jnp.int32))["params"]
        state = create_train_state(params, optimizer)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    step = make_train_step(model, transport, optimizer, mesh=None,
                           max_grad_norm=1.0, use_labels=True,
                           grad_accum=args.grad_accum)

    # ONE jitted program scanning N steps (the BENCH.md methodology: the
    # tunnel adds 8-45 ms VARIABLE latency per dispatched program and its
    # async completion signaling is unreliable for chains of short
    # programs -- a 20-step chain of 460M train steps "measured" 20 ms/step
    # through per-call dispatch, 3x the hardware peak; a single multi-second
    # scan program is immune)
    from jax import lax

    k = jax.random.PRNGKey(2)

    def chain(state, n_key):
        def body(s, i):
            s, m = step(s, x, y, jax.random.fold_in(n_key, i))
            return s, m["loss"]

        return lax.scan(body, state, jnp.arange(args.steps))

    # block_until_ready does NOT sync through the tunnel; np.asarray does
    chain_j = jax.jit(chain, donate_argnums=(0,))
    if args.compile_only:
        t0 = time.time()
        chain_j.lower(state, k).compile()
        print(json.dumps({"compile_only": True,
                          "compile_s": round(time.time() - t0, 1)}))
        return
    t0 = time.time()
    state, losses = chain_j(state, k)
    np.asarray(losses)
    t_warm = time.time() - t0

    t0 = time.time()
    state, losses = chain_j(state, k)
    loss_last = float(np.asarray(losses)[-1])
    dt = (time.time() - t0) / args.steps
    metrics = {"loss": loss_last}

    print(json.dumps({
        "model": args.model, "batch": B, "image_size": args.image_size,
        "bf16": args.bf16, "grad_accum": args.grad_accum,
        "grad_checkpoint": args.grad_checkpoint,
        "remat_policy": args.remat_policy,
        "params_M": round(n_params / 1e6, 1),
        "ms_per_step": round(dt * 1e3, 1),
        "img_per_s_per_chip": round(B / dt, 1),
        "warmup_s": round(t_warm, 1),
        "loss": float(metrics["loss"]),
    }))


if __name__ == "__main__":
    main()
