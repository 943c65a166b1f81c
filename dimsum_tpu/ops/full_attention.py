"""Full-block TPU attention kernel for the DiM 512-res shapes.

At the shapes where DiM uses attention with long sequences (L=1024,
Dh=64: the 512-res DiT blocks and CrossAttentionFusion, reference
`/root/reference/dimsum/models_dim.py:1540` / `attention_fusion.py:9-84`)
the stock Pallas flash kernel — even with full-sequence BlockSizes, the
r3 tuning — runs at only 34/24 TF/s (17%/12% of v5e MXU peak).  With
head_dim 64 the MXU ceiling is ~50% of peak (the contraction/output minor
dim half-fills the 128-lane systolic array), so there is ~3x headroom.

Flash attention exists to avoid materializing the (L, L) score matrix in
HBM.  At L=1024 the scores are 4 MB fp32 — they fit in VMEM (~16 MB)
whole.  So this kernel drops the entire online-softmax apparatus (running
max/sum carries, rescaling multiplies, multi-block loop bookkeeping) and
does the textbook computation in ONE VMEM-resident pass per (batch, head):

    S = Q K^T          (MXU, fp32 accum)
    P = exp(S - rowmax) (VPU)
    O = (P V) / rowsum  (MXU, fp32 accum; normalization folded into the
                         (L, Dh) output, not the (L, L) matrix)

Grid is (B*H,); Pallas double-buffers the next head's Q/K/V HBM loads
behind the current head's compute.  sm_scale is folded into Q by the
caller (an (L, Dh) multiply that XLA fuses into the preceding slice,
instead of an (L, L) multiply inside the kernel).

The backward pass recomputes through the XLA composition via custom_vjp:
one extra fwd's worth of FLOPs, no residuals saved besides q/k/v — the
standard remat trade, and the training path at these shapes is a side
lane (512-res) where attention is ~11% of the step.

Limits: L must be a multiple of 8 with L*L*4 bytes comfortably inside
VMEM (L <= 1536 or so); use flash for longer sequences.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

__all__ = ["full_block_attention"]

# S fp32 + exp(S) fp32 + P bf16 must fit VMEM (~16 MB) alongside the
# (L, Dh) operands: 1536^2 * (4 + 4 + 2) B = 22.5 MB is already too big
# with double buffering, so gate at 1024 where the total is ~10 MB.
_MAX_FULL_BLOCK_L = 1024


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]  # (L, Dh) — sm_scale already folded in
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_call(bh, L, Dh, dtype_name, interpret, qb=None):
    """qb: Q-row block.  None/L = one (L, L) score tile per head (maximal
    MXU work per grid step); smaller = a (qb, L) tile per step with K/V
    held across the row loop -- less VMEM residency, more grid steps to
    pipeline.  Softmax rows stay complete either way (K is always whole),
    so outputs are identical; pick by measurement (benchmarks/attn_micro)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qb = L if qb in (None, 0) else min(qb, L)
    assert L % qb == 0
    spec_q = pl.BlockSpec((1, qb, Dh), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    spec_kv = pl.BlockSpec((1, L, Dh), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _attn_kernel,
        grid=(bh, L // qb),
        in_specs=[spec_q, spec_kv, spec_kv],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((bh, L, Dh), jnp.dtype(dtype_name)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )


def _ref_attention(q, k, v, sm_scale):
    """XLA reference in the same (B, L, H, Dh) layout (bwd recompute)."""
    return jax.nn.dot_product_attention(q, k, v, scale=sm_scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def full_block_attention(q, k, v, sm_scale):
    """Softmax attention, (B, L, H, Dh) in and out (the module layout)."""
    B, L, H, Dh = q.shape
    qs = (q * jnp.asarray(sm_scale, q.dtype)).transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    call = _build_call(B * H, L, Dh, q.dtype.name,
                       os.environ.get("DIMSUM_ATTN_INTERPRET", "0") == "1",
                       qb=int(os.environ.get("DIMSUM_FULL_ATTN_QB", "0")))
    o = call(qs.reshape(B * H, L, Dh), kt.reshape(B * H, L, Dh),
             vt.reshape(B * H, L, Dh))
    return o.reshape(B, H, L, Dh).transpose(0, 2, 1, 3)


def _fwd(q, k, v, sm_scale):
    return full_block_attention(q, k, v, sm_scale), (q, k, v)


def _bwd(sm_scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(functools.partial(_ref_attention, sm_scale=sm_scale),
                     q, k, v)
    return vjp(g)


full_block_attention.defvjp(_fwd, _bwd)


def full_block_supported(L: int, Dh: int) -> bool:
    # L must be lane-aligned (128) so the (L, L) score tile maps onto the
    # MXU/VPU without padding copies — the same alignment _sdpa requires
    # before considering any Pallas kernel (models/attention.py).
    return L % 128 == 0 and L <= _MAX_FULL_BLOCK_L and Dh % 8 == 0
