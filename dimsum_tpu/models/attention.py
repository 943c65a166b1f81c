"""Attention modules: timm-style self-attention (DiT blocks) and the
bidirectional CrossAttentionFusion joining the spatial/frequency halves.

Reference: timm `Attention` (used at `/root/reference/dimsum/models_dim.py:1540`)
and `/root/reference/dimsum/attention_fusion.py:9-84`.

Uses `jax.nn.dot_product_attention` (bf16 QK^T with fp32 accumulation /
softmax on the MXU); sequence lengths here are <= 1024 so flash-style
chunking is unnecessary.  Everything stays in (B, L, H, Dh) layout -- the
attention op's native layout -- so no head transposes ever materialize
(they showed up as relayout copies in the v5e profile).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

_FLASH_IMPORT_WARNED = False


def _sdpa(q, k, v):
    """q/k/v: (B, L, H, Dh).  Default: XLA dot_product_attention for
    L < 1024, the Pallas TPU flash-attention kernel (no (L, L) score
    materialization) from L >= 1024 -- the measured v5e crossover: at the
    headline L=256 flash is 19% SLOWER end-to-end (0.742 vs 0.9125 img/s,
    launch/grid overhead dwarfs the score-HBM savings) while at L=1024
    (512-res forward) it wins by 2.3% (47.6 vs 48.7 ms).  Override with
    DIMSUM_FLASH_ATTN=1 (always) / =0 (never); fwd+grad parity vs XLA
    verified on-chip at bf16 tolerance."""
    mode = os.environ.get("DIMSUM_FLASH_ATTN", "auto")
    want = mode == "1" or (mode not in ("0", "1") and q.shape[1] >= 1024)
    use_flash = (want
                 and jax.default_backend() in ("tpu", "axon")
                 and q.shape[1] % 128 == 0 and q.shape[3] >= 64)
    if use_flash:
        # In the long-sequence regime prefer the full-block VMEM kernel
        # (ops/full_attention.py): at L=1024/Dh=64 the (L, L) scores fit
        # VMEM whole, so the online-softmax machinery flash pays for is
        # pure overhead.  Only auto-preferred: an explicit
        # DIMSUM_FLASH_ATTN=1 names the flash kernel and is honored as
        # such (so flash ablations keep measuring flash); DIMSUM_FULL_ATTN=1
        # forces full-block, =0 restores flash.
        from dimsum_tpu.ops.full_attention import (full_block_attention,
                                                   full_block_supported)
        full_mode = os.environ.get("DIMSUM_FULL_ATTN", "auto")
        prefer_full = (full_mode == "1"
                       or (full_mode != "0" and mode != "1"))
        if prefer_full and full_block_supported(q.shape[1], q.shape[3]):
            return full_block_attention(q, k, v, q.shape[-1] ** -0.5)
    if use_flash:
        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention)
        except ImportError:
            # warn once, loudly: the user explicitly requested flash and
            # would otherwise benchmark the XLA path believing it is flash
            global _FLASH_IMPORT_WARNED
            if not _FLASH_IMPORT_WARNED:
                import warnings

                warnings.warn(
                    "DIMSUM_FLASH_ATTN=1 requested but the Pallas "
                    "flash-attention module could not be imported; "
                    "falling back to XLA dot_product_attention",
                    RuntimeWarning, stacklevel=2)
                _FLASH_IMPORT_WARNED = True
        else:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes)

            # Full-sequence blocks: the kernel's defaults (128-sized
            # q/k tiles) leave the MXU 4x underutilized at L=1024 --
            # measured on v5e (benchmarks/attn_micro.py): flash default
            # 4.18/2.24 ms (DiT/cross shapes) vs bq=bk=1024 1.01/0.73 ms
            # (34/24 TF/s).  L <= ~2048 per-head tiles fit VMEM easily;
            # cap at 1024 so longer sequences still stream.
            L = q.shape[1]
            b = min(L, 1024)
            bs = BlockSizes(
                block_q=b, block_k_major=b, block_k=b, block_b=1,
                block_q_major_dkv=b, block_k_major_dkv=b,
                block_q_dkv=b, block_k_dkv=b,
                block_q_dq=b, block_k_dq=b, block_k_major_dq=b)
            bhld = lambda t: t.transpose(0, 2, 1, 3)
            out = flash_attention(bhld(q), bhld(k), bhld(v),
                                  sm_scale=q.shape[-1] ** -0.5,
                                  block_sizes=bs)
            return out.transpose(0, 2, 1, 3)
    return jax.nn.dot_product_attention(q, k, v)


class Attention(nn.Module):
    """timm.models.vision_transformer.Attention equivalent."""

    num_heads: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, L, D = x.shape
        head_dim = D // self.num_heads
        qkv = nn.Dense(3 * D, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        # q/k/v are contiguous D-channel blocks; minor-axis slices fuse into
        # the consumers, unlike the (B, L, 3, H, Dh) reshape+index which
        # materialized {1,4,3,0,2}-layout copies (r3 v5e trace)
        q, k, v = (qkv[..., i * D:(i + 1) * D].reshape(
            B, L, self.num_heads, head_dim) for i in range(3))
        from jax.ad_checkpoint import checkpoint_name

        # remat tag: remat_policy "save:...+attn_out" keeps the attention
        # outputs resident so the backward replay skips the O(L^2) softmax
        out = checkpoint_name(_sdpa(q, k, v), "attn_out")
        out = out.reshape(B, L, D)
        return nn.Dense(D, use_bias=True, dtype=self.dtype, name="proj")(out)


class CrossAttentionFusion(nn.Module):
    """Bidirectional cross-attention between the spatial (x1) and frequency
    (x2) half-channels (reference attention_fusion.py).

    dim is the FULL block width; each stream has dim//2 channels and
    head_dim = dim // 2 // num_heads.  Outputs are concatenated and projected
    back to the full width.
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    swap_k: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        B, N, C = x1.shape  # C = dim // 2
        head_dim = self.dim // 2 // self.num_heads

        def qkv_of(x, name):
            qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                           name=name)(x)
            return (qkv[..., i * C:(i + 1) * C].reshape(
                B, N, self.num_heads, head_dim) for i in range(3))

        q1, k1, v1 = qkv_of(x1, "qkv1")
        q2, k2, v2 = qkv_of(x2, "qkv2")

        from jax.ad_checkpoint import checkpoint_name

        sdpa = lambda *a: checkpoint_name(_sdpa(*a), "attn_out")  # noqa: E731
        if not self.swap_k:
            x12 = sdpa(q1, k2, v2)
            x21 = sdpa(q2, k1, v1)
        else:
            x12 = sdpa(q2, k1, v2)
            x21 = sdpa(q1, k2, v1)

        out = jnp.concatenate([x12.reshape(B, N, C), x21.reshape(B, N, C)],
                              axis=-1)
        return nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                        name="proj")(out)
