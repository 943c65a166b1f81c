"""Haar DWT/IDWT and the 2-level token packing used by the frequency branch.

Reference semantics: `/root/reference/dimsum/wavelet_layer.py` (grouped
stride-2 convs with pywt 'haar' filters) and the packing/unpacking in
`WaveDiMBlock._dwt_fast/_idwt_fast` (`/root/reference/dimsum/models_dim.py:572-604`).

On TPU, a 2x2 stride-2 Haar transform is just a block reshape plus butterfly
adds -- exact, cheap, and fully fused by XLA.  No convolutions are involved.

Filter conventions (pywt 'haar', h = 1/sqrt(2)):
  analysis (with the reference's filter reversal):
    ll = h^2 (a+b+c+d)   lh = h^2 (a+b-c-d)
    hl = h^2 (a-b+c-d)   hh = h^2 (a-b-c+d)
  where [[a, b], [c, d]] is each non-overlapping 2x2 block (row-major).
  synthesis is the transpose (orthogonal transform).

The 2-level pack reproduces the reference's exact (and idiosyncratic) channel
interleave: after two DWTs the 16 C-sized channel groups sit in (s2, s1, C)
order; the reference permutes groups with index i%4*4 + i//4 to (s1, s2, C)
and then reinterprets the 16*C channels as (C, 4, 4) in the einops rearrange
"b (c p1 p2) h w -> b (h p1 w p2) c" -- mixing channels and subbands.  The
inverse undoes it exactly, so we replicate it bit-for-bit for checkpoint
parity rather than "fixing" it.
"""

from __future__ import annotations

import jax.numpy as jnp
from einops import rearrange

__all__ = ["dwt2d", "idwt2d", "dwt_tokens", "idwt_tokens"]


def dwt2d(x):
    """x: (B, C, H, W) -> (B, 4C, H/2, W/2), subband-major [ll, lh, hl, hh]."""
    B, C, H, W = x.shape
    xb = x.reshape(B, C, H // 2, 2, W // 2, 2)
    a = xb[:, :, :, 0, :, 0]
    b = xb[:, :, :, 0, :, 1]
    c = xb[:, :, :, 1, :, 0]
    d = xb[:, :, :, 1, :, 1]
    ll = 0.5 * (a + b + c + d)
    lh = 0.5 * (a + b - c - d)
    hl = 0.5 * (a - b + c - d)
    hh = 0.5 * (a - b - c + d)
    return jnp.concatenate([ll, lh, hl, hh], axis=1)


def idwt2d(x):
    """x: (B, 4C, H, W) subband-major [ll, lh, hl, hh] -> (B, C, 2H, 2W)."""
    B, C4, H, W = x.shape
    C = C4 // 4
    ll, lh, hl, hh = jnp.split(x, 4, axis=1)
    a = 0.5 * (ll + lh + hl + hh)
    b = 0.5 * (ll + lh - hl - hh)
    c = 0.5 * (ll - lh + hl - hh)
    d = 0.5 * (ll - lh - hl + hh)
    out = jnp.stack(
        [jnp.stack([a, b], axis=-1), jnp.stack([c, d], axis=-1)], axis=-2
    )  # (B, C, H, W, 2(i), 2(j))
    out = out.transpose(0, 1, 2, 4, 3, 5).reshape(B, C, 2 * H, 2 * W)
    return out


def _group_perm(patch: int):
    return [i % 4 * patch + i // 4 for i in range(patch * patch)]


def dwt_tokens(x, num_lv: int = 2):
    """Token-grid DWT pack (reference `_dwt_fast`, models_dim.py:572-586).

    x: (B, L, C) with L = H*W square -> (B, L, C) of packed subband tokens.
    """
    B, L, C = x.shape
    side = int(round(L ** 0.5))
    xg = rearrange(x, "b (h w) c -> b c h w", h=side)
    sub = dwt2d(xg)
    scale = float(2 ** num_lv)
    patch = 2 ** num_lv
    if num_lv > 1:
        out = dwt2d(sub) / scale
        groups = jnp.split(out, patch * patch, axis=1)
        out = jnp.concatenate([groups[i] for i in _group_perm(patch)], axis=1)
    else:
        out = sub / scale
    return rearrange(out, "b (c p1 p2) h w -> b (h p1 w p2) c",
                     p1=patch, p2=patch)


def idwt_tokens(x, num_lv: int = 2):
    """Inverse of `dwt_tokens` (reference `_idwt_fast`, models_dim.py:588-604)."""
    B, L, C = x.shape
    scale = float(2 ** num_lv)
    patch = 2 ** num_lv
    lowest = int(round(L ** 0.5)) // patch
    sub = rearrange(x * scale, "b (h p1 w p2) c -> b (c p1 p2) h w",
                    p1=patch, p2=patch, h=lowest)
    groups = jnp.split(sub, patch * patch, axis=1)
    if num_lv > 1:
        sub = jnp.concatenate([groups[i] for i in _group_perm(patch)], axis=1)
        out = idwt2d(idwt2d(sub))
    else:
        out = idwt2d(jnp.concatenate(groups, axis=1))
    return rearrange(out, "b c h w -> b (h w) c")
