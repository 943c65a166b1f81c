"""Mamba LM generation benchmark.

Reference: `/root/reference/mamba/benchmarks/benchmark_generation_mamba_simple.py`
(CUDA-graph decode benchmark).  Here the whole decode is one compiled
lax.scan program; this measures tokens/sec end to end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--d-model", type=int, default=768)
    p.add_argument("--n-layer", type=int, default=24)
    p.add_argument("--vocab", type=int, default=50277)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--promptlen", type=int, default=64)
    p.add_argument("--genlen", type=int, default=128)
    p.add_argument("--hf-ckpt", type=str, default=None,
                   help="local state_spaces/mamba checkpoint to load")
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from dimsum_tpu.models.lm import MambaLMConfig, MambaLMHeadModel, generate

    if args.hf_ckpt:
        from dimsum_tpu.utils.hf import load_hf_mamba

        cfg, params = load_hf_mamba(args.hf_ckpt)
    else:
        cfg = MambaLMConfig(d_model=args.d_model, n_layer=args.n_layer,
                            vocab_size=args.vocab)
        model = MambaLMHeadModel(cfg)
        ids0 = jnp.zeros((1, 4), jnp.int32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), ids0)

    ids = jax.random.randint(jax.random.PRNGKey(1),
                             (args.batch, args.promptlen), 0,
                             cfg.vocab_size).astype(jnp.int32)

    gen = jax.jit(lambda p_, i_: generate(
        p_, cfg, i_, max_new_tokens=args.genlen, temperature=1.0, top_k=40,
        rng=jax.random.PRNGKey(2)))
    out = gen(params, ids)
    np.asarray(out)  # compile + sync

    t0 = time.perf_counter()
    for _ in range(args.repeats):
        out = gen(params, ids)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / args.repeats
    toks = args.batch * (args.promptlen + args.genlen)
    print(json.dumps({
        "metric": "mamba_lm_generation",
        "tokens_per_sec": round(toks / dt, 1),
        "batch": args.batch,
        "prompt+gen": [args.promptlen, args.genlen],
        "seconds_per_call": round(dt, 4),
    }))


if __name__ == "__main__":
    main()
