"""Pipeline parallelism: GPipe-style microbatch schedule over a 'stage'
mesh axis with `ppermute` hops between stages.

Not present in the reference (DDP-only; SURVEY 2.6 marks PP absent and
unnecessary at 460M) -- provided as the TPU-native PP building block for
larger configs: layers are stacked and sharded over stages, activations hop
stage->stage over ICI, and the K-1 bubble steps are the usual GPipe cost.

Works on any pytree of activations with static shapes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def pipeline_apply(stage_fn: Callable, stage_params, x,
                   axis_name: str = "stage", num_microbatches: int = 4):
    """Run `stage_fn` at every pipeline stage over microbatches of x.

    Call INSIDE shard_map with `stage_params` sharded over `axis_name`
    (each device holds its stage's parameters) and x replicated.

    stage_fn(stage_params, microbatch) -> microbatch (same structure).
    x: (B, ...) with B % num_microbatches == 0.  Returns the full output
    batch, replicated on every stage.
    """
    k = lax.axis_size(axis_name)
    s = lax.axis_index(axis_name)
    B = jax.tree.leaves(x)[0].shape[0]
    assert B % num_microbatches == 0
    mb = B // num_microbatches
    m = num_microbatches

    xs = jax.tree.map(
        lambda a: a.reshape(m, mb, *a.shape[1:]), x)
    zero_mb = jax.tree.map(lambda a: jnp.zeros_like(a[0]), xs)
    outs = jax.tree.map(lambda a: jnp.zeros_like(a), xs)

    fwd_perm = [(i, (i + 1) % k) for i in range(k)]

    def step(i, carry):
        buf, outs = carry
        # stage 0 injects microbatch i (when one remains); other stages
        # consume what arrived from the previous stage
        inject = jax.tree.map(
            lambda a, z: jnp.where(i < m, a[jnp.minimum(i, m - 1)], z),
            xs, zero_mb)
        inp = jax.tree.map(
            lambda inj, b: jnp.where(s == 0, inj, b), inject, buf)
        out = stage_fn(stage_params, inp)
        # the last stage banks its result for microbatch (i - k + 1)
        j = i - (k - 1)
        valid = (j >= 0) & (j < m)
        jc = jnp.clip(j, 0, m - 1)

        def bank(acc, o):
            upd = jnp.where(valid & (s == k - 1), o, acc[jc])
            return acc.at[jc].set(upd)

        outs = jax.tree.map(bank, outs, out)
        # ship activations to the next stage
        buf = jax.tree.map(
            lambda o: lax.ppermute(o, axis_name, fwd_perm), out)
        return buf, outs

    _, outs = lax.fori_loop(0, m + k - 1, step, (zero_mb, outs))
    # replicate the collected outputs (only the last stage holds them)
    outs = jax.tree.map(
        lambda a: lax.psum(jnp.where(s == k - 1, a, jnp.zeros_like(a)),
                           axis_name), outs)
    return jax.tree.map(lambda a: a.reshape(B, *a.shape[2:]), outs)


# ---------------------------------------------------------------------------
# Full-model DiM pipeline: the 16-block backbone staged over 'stage'
# ---------------------------------------------------------------------------


def _stage_templates(cfg):
    """Standalone per-relative-index block modules for one pipeline stage.

    Valid when blocks_per_stage % 4 == 0 (and % attn_every == 0): the
    reference's alternating reverse=(i%2>0) / transpose=(i%4>=2) pattern
    and the attention-insertion points then depend only on i % stage_size,
    so every stage runs the SAME program with its own parameters."""
    from dimsum_tpu.models.dim import _gen_paths, make_dim_block

    zig = cfg.scan_type.split("_")[0] in ("zigma", "sweep", "jpeg")
    paths = (_gen_paths(cfg.grid_size, cfg.scan_type, cfg.eff_depth)
             if zig else (None, None))
    paths2 = (_gen_paths(cfg.grid_size, "jpeg_2", cfg.eff_depth)
              if cfg.block_type == "combined_fourier" else (None, None))
    return [make_dim_block(i, cfg, paths, paths2, name=None)
            for i in range(cfg.eff_depth)]


def dim_pipeline_forward(cfg, params, x, t, y, mesh,
                         num_microbatches: int = 4,
                         axis_name: str = "stage"):
    """Run a DiM forward with the block stack pipelined over `axis_name`
    (GPipe microbatches, activations hopping stage->stage over ICI).

    Embedders and the final layer are replicated (a fraction of a percent
    of the FLOPs); the depth-proportional block stack is sharded: stage s
    holds the parameters of blocks [s*per, (s+1)*per).  Exact vs the
    sequential DiM forward (tests/test_pipeline.py).

    Constraints (asserted): non-MoE, pe_type 'ape', no fourier layers /
    final norm, depth divisible by num_stages with per-stage block count
    divisible by 4 (the reverse/transpose period) and by
    use_attn_every_k_layers when attention is enabled.
    """
    import numpy as np
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from dimsum_tpu.models.blocks import DiTBlock
    from dimsum_tpu.models.embedders import (
        FinalLayer, LabelEmbedder, PatchEmbed, TimestepEmbedder, unpatchify,
    )

    k = mesh.shape[axis_name]
    depth = cfg.eff_depth
    assert depth % k == 0, f"depth {depth} not divisible by {k} stages"
    per = depth // k
    assert per % 4 == 0, (
        f"{per} blocks/stage breaks the i%4 reverse/transpose period -- "
        f"use a stage count with depth/stages % 4 == 0")
    if cfg.use_attn_every_k_layers > 0:
        assert per % cfg.use_attn_every_k_layers == 0, (
            "attention insertion period must divide the stage size")
        assert not cfg.use_independent_attn, (
            "pipeline supports the shared attention block only")
    assert not cfg.is_moe and not cfg.enable_fourier_layers
    assert not cfg.use_final_norm and cfg.pe_type == "ape"

    templates = _stage_templates(cfg)[:per]
    attn_every = cfg.use_attn_every_k_layers

    # ---- replicated glue: embedders -----------------------------------
    N = x.shape[0]
    t_emb = TimestepEmbedder(cfg.hidden_size, dtype=cfg.dtype).apply(
        {"params": params["t_embedder"]}, t)
    y_embedder = LabelEmbedder(cfg.num_classes, cfg.hidden_size,
                               cfg.label_dropout)
    if y is None:
        y = jnp.full((N,), cfg.num_classes, jnp.int32)
    y_emb = y_embedder.apply({"params": params["y_embedder"]}, y)
    c = (t_emb + y_emb).astype(cfg.dtype)
    h = PatchEmbed(cfg.patch_size, cfg.hidden_size, dtype=cfg.dtype).apply(
        {"params": params["x_embedder"]}, x.astype(cfg.dtype))
    h = h + params["pos_embed"].astype(cfg.dtype)  # inference: stop_gradient
    #                                                is irrelevant here

    # ---- stack per-stage block params over the stage axis -------------
    stacked = []
    for j in range(per):
        stacked.append(jax.tree.map(
            lambda *a: jnp.stack(a),
            *[params[f"blocks_{s * per + j}"] for s in range(k)]))
    attn_params = (params["attn_block"] if attn_every > 0 else None)
    attn_mod = (DiTBlock(cfg.hidden_size, 16,
                         use_gated_mlp=cfg.use_gated_mlp, dtype=cfg.dtype)
                if attn_every > 0 else None)

    def stage_fn(stage_params, mb):
        h_, r_, c_ = mb
        sp, ap = stage_params
        for j, tmpl in enumerate(templates):
            pj = jax.tree.map(lambda a: a[0], sp[j])
            h_, r_ = tmpl.apply({"params": pj}, h_, r_, c_)
            if attn_every > 0 and (j + 1) % attn_every == 0:
                h_ = attn_mod.apply({"params": ap}, h_, c_)
        return (h_, r_, c_)

    import math as _math

    # clamp to a divisor of the batch (GPipe needs equal microbatches)
    num_microbatches = _math.gcd(num_microbatches, N) or 1

    residual0 = jnp.zeros(h.shape,
                          jnp.float32 if cfg.residual_in_fp32 else h.dtype)
    # NOTE the first block sees residual=None in the sequential model;
    # residual 0 + add is identical for the prenorm blocks
    in_specs = ((jax.tree.map(lambda _: P(axis_name), stacked), P()),
                (P(), P(), P()))
    pp = shard_map(
        lambda w, v: pipeline_apply(stage_fn, w, v, axis_name=axis_name,
                                    num_microbatches=num_microbatches),
        mesh=mesh, in_specs=in_specs, out_specs=(P(), P(), P()),
        check_vma=False)
    h, _, _ = pp((stacked, attn_params), (h, residual0, c))

    out = FinalLayer(cfg.patch_size, cfg.out_channels,
                     dtype=cfg.dtype).apply(
        {"params": params["final_layer"]}, h, c)
    return unpatchify(out.astype(jnp.float32), cfg.patch_size,
                      cfg.out_channels)
