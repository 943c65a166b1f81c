"""Mamba / CondMamba mixer modules (flax).

Reference: `/root/reference/mamba/mamba_ssm/modules/mamba_simple.py`
(`Mamba` :42-380, `CondMamba` :438-785).  The compute path mirrors the fused
`mamba_inner_fn` fast path (selective_scan_interface.py:174-372):

  in_proj -> [x | z] -> depthwise causal conv + SiLU -> x_proj -> (dt, B, C)
  -> dt_proj (weight only; bias fused into the scan's delta_bias+softplus)
  -> selective scan with D-skip and silu(z) gate -> out_proj

Extensions carried over from the reference:
  * scan_type "v2": a full second parameter set (A_b, conv1d_b, x_proj_b,
    dt_proj_b, D_b) running a flipped scan summed before out_proj (:189-220).
  * zigzag scan types ("zigma_*", "sweep_*", "jpeg_*"): gather by a per-layer
    permutation before the conv and inverse-gather after out_proj (:222-253).
  * CondMamba's `cond_proj`: present in checkpoints but functionally dead in
    the reference fast path (the CUDA conv ignores `init_states`; see
    SURVEY.md 2.1).  We create the parameters for checkpoint parity and keep
    the computation out of the graph.  Set `use_cond_init=True` to opt in to
    actually seeding the scan state with the projected condition.

TPU-native layout throughout: (batch, seqlen, channels).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from dimsum_tpu.ops.causal_conv1d import causal_conv1d, causal_conv1d_halo
from dimsum_tpu.ops.conv_xproj import conv_xproj, conv_xproj_supported
from dimsum_tpu.ops.selective_scan import (
    selective_scan, selective_scan_dtlow, selective_scan_xla)
from dimsum_tpu.ops.selective_scan_sp import selective_scan_seq_parallel


class _XProj(nn.Module):
    """Bias-free projection sharing nn.Dense's param layout (one "kernel"
    param), so the DIMSUM_CONV_XPROJ=1 fused path leaves the checkpoint
    tree byte-identical to the nn.Dense it replaces."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_in, conv_w, conv_b, reverse: bool):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x_in.shape[-1], self.features))
        x_conv, x_dbl = conv_xproj(
            x_in, conv_w,
            conv_b if conv_b is not None
            else jnp.zeros((x_in.shape[-1],), jnp.float32),
            kernel, reverse)
        return x_conv, x_dbl.astype(self.dtype)


def _dt_kernel_init(dt_rank: int, dt_scale: float, dt_init: str):
    std = dt_rank ** -0.5 * dt_scale

    def init(key, shape, dtype=jnp.float32):
        if dt_init == "constant":
            return jnp.full(shape, std, dtype)
        if dt_init == "random":
            return jax.random.uniform(key, shape, dtype, -std, std)
        raise NotImplementedError(dt_init)

    return init


def _dt_bias_init(dt_min: float, dt_max: float, dt_init_floor: float):
    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(
            jax.random.uniform(key, shape, jnp.float32)
            * (math.log(dt_max) - math.log(dt_min))
            + math.log(dt_min)
        )
        dt = jnp.maximum(dt, dt_init_floor)
        # inverse softplus
        inv_dt = dt + jnp.log(-jnp.expm1(-dt))
        return inv_dt.astype(dtype)

    return init


def _a_log_init(d_inner: int, d_state: int):
    def init(key, shape, dtype=jnp.float32):
        a = jnp.tile(jnp.arange(1, d_state + 1, dtype=jnp.float32),
                     (d_inner, 1))
        return jnp.log(a).astype(dtype)

    return init


class Mamba(nn.Module):
    """Mamba-1 selective-SSM mixer.  Set `d_cond` for the CondMamba variant
    (creates `cond_proj`, reference mamba_simple.py:491-492)."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Optional[int] = None  # None => ceil(d_model / 16)
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init: str = "random"
    dt_scale: float = 1.0
    dt_init_floor: float = 1e-4
    conv_bias: bool = True
    bias: bool = False
    layer_idx: int = 0
    scan_type: str = "none"
    d_cond: Optional[int] = None
    use_cond_init: bool = False
    zigzag_paths: Optional[np.ndarray] = None          # (depth*, L) fwd perms
    zigzag_paths_reverse: Optional[np.ndarray] = None  # inverse perms
    scan_impl: Optional[str] = None
    reverse_tokens: bool = False  # run the mixer in reversed token order:
    #                               equals flip_L(mixer(flip_L(x))) but with
    #                               an anticausal conv + native reverse-time
    #                               scan kernel -- no materialized flips
    #                               (the reference flips literally,
    #                               models_dim.py:1496-1507)
    seq_axis: Optional[str] = None  # shard_map axis name: sequence-parallel
    seq_mesh: Any = None  # when set, the mixer opens its OWN shard_map
    #                       islands (halo conv + two-pass scan) over
    #                       seq_axis, so the surrounding model can run as
    #                       plain GSPMD (DiMConfig.seq_axis plumbs here);
    #                       when None, the caller must already be inside a
    #                       shard_map with seq_axis in scope
    dtype: Any = jnp.float32

    @property
    def d_inner(self):
        return int(self.expand * self.d_model)

    @property
    def dt_rank_(self):
        return (math.ceil(self.d_model / 16)
                if self.dt_rank is None else self.dt_rank)

    def _scan_branch(self, x_in, z, cond_emb, suffix: str,
                     reverse: bool = False):
        """conv -> x_proj -> dt_proj -> selective scan for one direction.

        `reverse=True` computes flip_L(branch(flip_L(x))) flip-free: the
        conv runs anticausal and the scan runs reverse-time in-kernel.  The
        h0-seeding and sequence-parallel paths don't support native reverse;
        they fall back to explicit flips (same semantics)."""
        if reverse and (self.seq_axis is not None
                        or (cond_emb is not None and self.use_cond_init)):
            y = self._scan_branch(jnp.flip(x_in, 1), jnp.flip(z, 1),
                                  cond_emb, suffix, reverse=False)
            return jnp.flip(y, 1)
        d_inner, d_state, r = self.d_inner, self.d_state, self.dt_rank_
        conv_w = self.param(f"conv1d{suffix}_kernel",
                            nn.initializers.lecun_normal(),
                            (d_inner, self.d_conv))
        conv_b = (self.param(f"conv1d{suffix}_bias", nn.initializers.zeros,
                             (d_inner,)) if self.conv_bias else None)
        x_dbl = None
        if self.seq_axis is not None and self.seq_mesh is not None:
            # self-contained SP island: the surrounding model is plain
            # GSPMD; only the order-sensitive conv enters manual mode
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            sharded = P(None, self.seq_axis, None)
            x_conv = shard_map(
                lambda x_, w_, b_: causal_conv1d_halo(
                    x_, w_, b_, activation="silu",
                    axis_name=self.seq_axis),
                mesh=self.seq_mesh,
                in_specs=(sharded, P(), P()),
                out_specs=sharded, check_vma=False,
            )(x_in, conv_w,
              conv_b if conv_b is not None else jnp.zeros((d_inner,)))
        elif self.seq_axis is not None:
            # L sharded over a mesh axis (inside shard_map): halo'd conv +
            # two-pass scan with the cross-shard state carried over ICI
            x_conv = causal_conv1d_halo(x_in, conv_w, conv_b,
                                        activation="silu",
                                        axis_name=self.seq_axis)
        elif conv_xproj_supported(x_in, np.zeros((1, r + 2 * d_state))):
            # fused conv+SiLU+x_proj Pallas kernel (DIMSUM_CONV_XPROJ=1):
            # x_conv round-trips HBM once instead of twice (conv_xproj.py)
            x_conv, x_dbl = _XProj(r + 2 * d_state, dtype=self.dtype,
                                   name=f"x_proj{suffix}")(
                x_in, conv_w, conv_b, reverse)
        else:
            from jax.ad_checkpoint import checkpoint_name

            # remat tag: remat_policy "save:...+conv_out" keeps the conv
            # prologue outputs resident in the backward replay
            x_conv = checkpoint_name(
                causal_conv1d(x_in, conv_w, conv_b, activation="silu",
                              reverse=reverse), "conv_out")

        if x_dbl is None:
            x_dbl = nn.Dense(r + 2 * d_state, use_bias=False,
                             dtype=self.dtype,
                             name=f"x_proj{suffix}")(x_conv)
        dt_low, Bm, Cm = jnp.split(x_dbl, [r, r + d_state], axis=-1)

        dt_kernel = self.param(
            f"dt_proj{suffix}_kernel",
            _dt_kernel_init(r, self.dt_scale, self.dt_init),
            (r, d_inner),
        )
        dt_bias = self.param(
            f"dt_proj{suffix}_bias",
            _dt_bias_init(self.dt_min, self.dt_max, self.dt_init_floor),
            (d_inner,),
        )
        dt_w = dt_kernel.astype(dt_low.dtype)
        # full (B, L, d_inner) dt is only materialized on the paths that
        # need it (h0 seeding, sequence parallelism); the default path folds
        # the expansion into the scan kernel (selective_scan_dtlow)
        dt = None

        A_log = self.param(f"A{suffix}_log",
                           _a_log_init(d_inner, d_state),
                           (d_inner, d_state))
        D = self.param(f"D{suffix}", nn.initializers.ones, (d_inner,))
        A = -jnp.exp(A_log.astype(jnp.float32))

        # remat tag: DiMConfig(remat_policy="scan"/"dots_scan") keeps these
        # outputs resident so the backward replay skips the scan kernels
        from jax.ad_checkpoint import checkpoint_name as _tag

        h0 = None
        if cond_emb is not None and self.use_cond_init:
            # opt-in extension: seed the scan state with the projected cond
            h0 = cond_emb[:, :, None] * jnp.ones((1, 1, d_state))
        if h0 is not None:
            if self.seq_axis is not None:
                # inside shard_map each shard would apply h0 locally with no
                # cross-shard carry -- silently wrong; refuse instead
                raise NotImplementedError(
                    "use_cond_init h0 seeding is not supported with "
                    "seq_axis (sequence parallelism): h0 must enter on "
                    "shard 0 only and be carried across shards")
            return _tag(selective_scan_xla(
                x_conv, jnp.einsum("blr,rd->bld", dt_low, dt_w),
                A, Bm, Cm, D, z=z, delta_bias=dt_bias,
                delta_softplus=True, h0=h0,
            ), "scan_out")
        if self.seq_axis is not None:
            dt = jnp.einsum("blr,rd->bld", dt_low, dt_w)
        if self.seq_axis is not None and self.seq_mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            sharded = P(None, self.seq_axis, None)
            return _tag(shard_map(
                lambda u_, dt_, A_, B_, C_, D_, z_, bias_:
                selective_scan_seq_parallel(
                    u_, dt_, A_, B_, C_, D_, z=z_, delta_bias=bias_,
                    delta_softplus=True, axis_name=self.seq_axis,
                    impl=self.scan_impl),
                mesh=self.seq_mesh,
                in_specs=(sharded, sharded, P(), sharded, sharded, P(),
                          sharded, P()),
                out_specs=sharded, check_vma=False,
            )(x_conv, dt, A, Bm, Cm, D, z, dt_bias), "scan_out")
        if self.seq_axis is not None:
            return _tag(selective_scan_seq_parallel(
                x_conv, dt, A, Bm, Cm, D, z=z, delta_bias=dt_bias,
                delta_softplus=True, axis_name=self.seq_axis,
                impl=self.scan_impl,
            ), "scan_out")
        return _tag(selective_scan_dtlow(
            x_conv, dt_low, dt_w, A, Bm, Cm, D, z=z, delta_bias=dt_bias,
            delta_softplus=True, impl=self.scan_impl, reverse=reverse,
        ), "scan_out")

    @nn.compact
    def __call__(self, x, cond_emb=None):
        """x: (B, L, d_model); cond_emb: (B, d_cond) or None."""
        xz = nn.Dense(2 * self.d_inner, use_bias=self.bias, dtype=self.dtype,
                      name="in_proj")(x)

        zig = self.scan_type.split("_")[0] in ("zigma", "sweep", "jpeg")
        if self.reverse_tokens and zig:
            raise NotImplementedError(
                "reverse_tokens composes with zigzag gathers only through "
                "explicit flips; apply the flip at the block level instead")
        if self.seq_axis is not None and (zig or self.scan_type == "v2"):
            raise NotImplementedError(
                "seq_axis supports scan_type='none' only: zigzag gathers "
                "and the v2 flip are global token permutations, which a "
                "sequence-sharded mixer cannot apply locally")
        if zig:
            perm = jnp.asarray(self.zigzag_paths)[self.layer_idx]
            xz = jnp.take(xz, perm, axis=1)

        x_in, z = jnp.split(xz, 2, axis=-1)

        cond = None
        if self.d_cond is not None:
            # Parameters exist for checkpoint parity; dead in the default
            # graph exactly as in the reference fast path (SURVEY.md 2.1).
            cond_proj = nn.Dense(self.d_inner, use_bias=True,
                                 dtype=self.dtype, name="cond_proj")
            if cond_emb is not None:
                cond = cond_proj(cond_emb)
                if not self.use_cond_init:
                    cond = None
            else:
                # ensure the params are created even if never conditioned
                _ = cond_proj(jnp.zeros((1, self.d_cond), self.dtype))

        if self.scan_type == "v2":
            # bidirectional: with reverse_tokens the roles swap -- branch ""
            # runs reverse-time, branch "_b" forward (equals the reference's
            # flip(mixer_v2(flip(x))) composition exactly)
            y_f = self._scan_branch(x_in, z, cond, "",
                                    reverse=self.reverse_tokens)
            y_b = self._scan_branch(x_in, z, cond, "_b",
                                    reverse=not self.reverse_tokens)
            y = y_f + y_b
        else:
            y = self._scan_branch(x_in, z, cond, "",
                                  reverse=self.reverse_tokens)

        out = nn.Dense(self.d_model, use_bias=self.bias, dtype=self.dtype,
                       name="out_proj")(y)
        if zig:
            perm_rev = jnp.asarray(self.zigzag_paths_reverse)[self.layer_idx]
            out = jnp.take(out, perm_rev, axis=1)
        return out


# The reference exposes CondMamba as a distinct class; here it's Mamba with
# d_cond set.  Alias for readability at call sites.
CondMamba = Mamba
