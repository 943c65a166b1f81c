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

import functools

import numpy as np
import jax.numpy as jnp
from einops import rearrange

__all__ = [
    "dwt2d", "idwt2d", "dwt_tokens", "idwt_tokens",
    "dwt_tokens_windowed", "idwt_tokens_windowed",
    "wavelet_pack_windowed", "wavelet_unpack_windowed",
    "dwt_tokens_cl", "idwt_tokens_cl",
]


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


def _dwt_pack_subbands(x, num_lv: int):
    """(B, L, C) tokens -> (B, (c p1 p2), h, w) group-interleaved subbands
    (the shared transform of dwt_tokens / dwt_tokens_windowed; only the
    final token rearrange differs between them)."""
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
    return out


def _idwt_unpack_subbands(sub, num_lv: int):
    """Inverse of `_dwt_pack_subbands` from the (B, (c p1 p2), h, w)
    layout back to (B, L, C) tokens."""
    patch = 2 ** num_lv
    groups = jnp.split(sub, patch * patch, axis=1)
    if num_lv > 1:
        sub = jnp.concatenate([groups[i] for i in _group_perm(patch)], axis=1)
        out = idwt2d(idwt2d(sub))
    else:
        out = idwt2d(jnp.concatenate(groups, axis=1))
    return rearrange(out, "b c h w -> b (h w) c")


def dwt_tokens(x, num_lv: int = 2):
    """Token-grid DWT pack (reference `_dwt_fast`, models_dim.py:572-586).

    x: (B, L, C) with L = H*W square -> (B, L, C) of packed subband tokens.
    """
    patch = 2 ** num_lv
    out = _dwt_pack_subbands(x, num_lv)
    return rearrange(out, "b (c p1 p2) h w -> b (h p1 w p2) c",
                     p1=patch, p2=patch)


def dwt_tokens_windowed(x, num_lv: int = 2, column_first: bool = False):
    """local_scan(dwt_tokens(x), w=side//patch, ...) as ONE rearrange.

    When side == patch**2 (the 256-res DiM configs: 16 = 4**2), local_scan's
    (Hg, wi, Wg, wj) window grouping coincides exactly with the dwt pack's
    (h, p1, w, p2) token structure, so the two back-to-back 6-D transposes
    (each a materialized ~2.4x-bandwidth copy on v5e, see BENCH.md layout
    row) compose into a single one.  Bitwise-equal to the composition (the
    butterfly arithmetic is untouched; only the rearrange composes)."""
    B, L, C = x.shape
    side = int(round(L ** 0.5))
    patch = 2 ** num_lv
    win = side // patch  # local_scan window width
    assert win == patch or (win > patch and win % patch == 0), \
        "windowed fusion requires side == patch^2 or window % patch == 0"
    out = _dwt_pack_subbands(x, num_lv)
    if win == patch:  # side == patch^2: windows ARE the dwt blocks
        if column_first:
            return rearrange(out, "b (c p1 p2) h w -> b (w h p2 p1) c",
                             p1=patch, p2=patch)
        return rearrange(out, "b (c p1 p2) h w -> b (h w p1 p2) c",
                         p1=patch, p2=patch)
    # win > patch (e.g. 512-res: side 32, patch 4, window 8): each window
    # row splits the lowest-grid axis as h = (h2: patch-many windows,
    # h1: win//patch blocks per window); within-window index = (h1, p1)
    f = win // patch
    if column_first:
        return rearrange(
            out, "b (c p1 p2) (h2 h1) (w2 w1) -> b (w2 h2 w1 p2 h1 p1) c",
            p1=patch, p2=patch, h1=f, w1=f)
    return rearrange(
        out, "b (c p1 p2) (h2 h1) (w2 w1) -> b (h2 w2 h1 p1 w1 p2) c",
        p1=patch, p2=patch, h1=f, w1=f)


def idwt_tokens_windowed(x, num_lv: int = 2, column_first: bool = False):
    """Inverse of `dwt_tokens_windowed` (= idwt_tokens(local_reverse(x)))."""
    B, L, C = x.shape
    scale = float(2 ** num_lv)
    patch = 2 ** num_lv
    side = int(round(L ** 0.5))
    # the local_scan window is definitionally side // patch here, which is
    # also the lowest-grid side; the h2=patch factors below rely on that
    win = side // patch
    assert win == patch or (win > patch and win % patch == 0)
    if win == patch:
        if column_first:
            sub = rearrange(x * scale, "b (w h p2 p1) c -> b (c p1 p2) h w",
                            p1=patch, p2=patch, h=win)
        else:
            sub = rearrange(x * scale, "b (h w p1 p2) c -> b (c p1 p2) h w",
                            p1=patch, p2=patch, h=win)
    else:
        f = win // patch
        if column_first:
            sub = rearrange(
                x * scale,
                "b (w2 h2 w1 p2 h1 p1) c -> b (c p1 p2) (h2 h1) (w2 w1)",
                p1=patch, p2=patch, h1=f, w1=f, h2=patch, w2=patch)
        else:
            sub = rearrange(
                x * scale,
                "b (h2 w2 h1 p1 w1 p2) c -> b (c p1 p2) (h2 h1) (w2 w1)",
                p1=patch, p2=patch, h1=f, w1=f, h2=patch, w2=patch)
    return _idwt_unpack_subbands(sub, num_lv)


def idwt_tokens(x, num_lv: int = 2):
    """Inverse of `dwt_tokens` (reference `_idwt_fast`, models_dim.py:588-604)."""
    B, L, C = x.shape
    scale = float(2 ** num_lv)
    patch = 2 ** num_lv
    lowest = int(round(L ** 0.5)) // patch
    sub = rearrange(x * scale, "b (h p1 w p2) c -> b (c p1 p2) h w",
                    p1=patch, p2=patch, h=lowest)
    return _idwt_unpack_subbands(sub, num_lv)


# ---------------------------------------------------------------------------
# Channel-last wavelet pack: lane-aligned butterflies + ONE final transpose.
#
# The 512-res trace pins the layout bucket to two per-block copy families
# born in the channel-MAJOR pipeline above: dwt2d's (B, n*C, h, w) subband
# tensor draws a layout-assignment copy (bf16[8,8192,8,8] {1,0,3,2}->
# {3,2,1,0}, spatial dims minor = 3-6% lane utilization), and the final
# token rearrange materializes the 6-D transpose (bf16[8,8,4,8,4,512]).
#
# Key identity (verified bitwise vs the reference pipeline): because the
# DiMSUM configs all have C % (2^lv)^2 == 0, the reference's channel/subband
# mixing "(s1 s2 ch) -> (c2 p1 p2)" decomposes as
#     within-block token (p1, p2) = ch % n          (low bits of the INPUT
#                                                    channel index)
#     output channel     c2       = (s1, s2, ch//n) (subbands become the
#                                                    high output-channel bits)
# so the whole pack is: channel-LAST butterflies over (B, H, W, C) slices
# (every add lane-aligned, C minor throughout, no channel-major tensor ever
# exists) followed by a single transpose whose output has the full C
# contiguous minor.  Bitwise-equal to dwt_tokens / dwt_tokens_windowed /
# dwt_tokens+_transpose_tokens (the butterfly sums are the same expression
# tree; scales are powers of two).  Opt-in via DIMSUM_DWT_CL=1 in
# WaveDiMBlock pending end-to-end measurement (see BENCH.md).
# ---------------------------------------------------------------------------


def _quads_cl(x):
    """x: (B, H, W, C) -> the four 2x2-block corners, each (B, H/2, W/2, C)."""
    B, H, W, C = x.shape
    xb = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return (xb[:, :, 0, :, 0], xb[:, :, 0, :, 1],
            xb[:, :, 1, :, 0], xb[:, :, 1, :, 1])


def _butterfly_cl(x, scale):
    """Analysis butterflies on channel-last x; returns [ll, lh, hl, hh]."""
    a, b, c, d = _quads_cl(x)
    return [scale * (a + b + c + d), scale * (a + b - c - d),
            scale * (a - b + c - d), scale * (a - b - c + d)]


def _ibutterfly_cl(ll, lh, hl, hh, scale):
    """Synthesis butterflies, channel-last: 4 x (B, H, W, C) -> (B, 2H, 2W, C)."""
    a = scale * (ll + lh + hl + hh)
    b = scale * (ll + lh - hl - hh)
    c = scale * (ll - lh + hl - hh)
    d = scale * (ll - lh - hl + hh)
    B, H, W, C = a.shape
    y = jnp.stack([a, b, c, d], axis=3).reshape(B, H, W, 2, 2, C)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, C)


def _cl_axis_order(mode, column_first, two_level_grid):
    """Output axis order for the single final transpose of dwt_tokens_cl.

    Input axes: (b, h, w, s, hi, p1, p2) or, when the window is coarser than
    the dwt block (two_level_grid), (b, h2, h1, w2, w1, s, hi, p1, p2).
    The output token/channel orders mirror dwt_tokens ("(h p1 w p2)"),
    _transpose_tokens of it ("(w p2 h p1)"), and dwt_tokens_windowed's
    row/column orders; channels are always (s, hi) = the reference's c2."""
    if two_level_grid:  # window_scan with win > patch (e.g. 512-res)
        if column_first:
            return (0, 3, 1, 4, 8, 2, 7, 5, 6)  # b (w2 h2 w1 p2 h1 p1) c
        return (0, 1, 3, 2, 7, 4, 8, 5, 6)      # b (h2 w2 h1 p1 w1 p2) c
    orders = {
        "plain": (0, 1, 5, 2, 6, 3, 4),         # b (h p1 w p2) c
        "grid_t": (0, 2, 6, 1, 5, 3, 4),        # b (w p2 h p1) c
        "win_row": (0, 1, 2, 5, 6, 3, 4),       # b (h w p1 p2) c
        "win_col": (0, 2, 1, 6, 5, 3, 4),       # b (w h p2 p1) c
    }
    return orders[mode]


def _cl_mode(window_scan, grid_transpose, column_first, win, patch):
    if window_scan:
        if win == patch:
            return ("win_col" if column_first else "win_row"), False
        if win % patch:
            raise ValueError("channel-last pack needs window % patch == 0")
        return None, True
    return ("grid_t" if grid_transpose else "plain"), False


def dwt_tokens_cl(x, num_lv: int = 2, *, window_scan: bool = False,
                  grid_transpose: bool = False, column_first: bool = False):
    """Channel-last twin of dwt_tokens [+ local_scan | + _transpose_tokens].

    window_scan=True  -> == local_scan(dwt_tokens(x), w=side//patch, ...)
    grid_transpose    -> == transpose_tokens(dwt_tokens(x)) (packed grid
                         transpose; only valid with window_scan=False)
    else              -> == dwt_tokens(x)
    """
    B, L, C = x.shape
    side = int(round(L ** 0.5))
    patch = 2 ** num_lv
    n = patch * patch
    if C % n or side % patch:
        raise ValueError(
            f"channel-last pack needs C % {n} == 0 and side % {patch} == 0 "
            f"(got C={C}, side={side})")
    if num_lv not in (1, 2):
        raise ValueError("dwt_tokens_cl supports num_lv in (1, 2)")
    hi = C // n
    Hb = side // patch
    xg = x.reshape(B, side, side, C)
    if num_lv == 1:
        subs = _butterfly_cl(xg, jnp.asarray(0.25, x.dtype))
    else:
        lvl1 = _butterfly_cl(xg, jnp.asarray(0.5, x.dtype))
        subs = []
        for t in lvl1:
            subs.extend(_butterfly_cl(t, jnp.asarray(0.125, x.dtype)))
    S = jnp.stack(subs, axis=3)                      # (B, Hb, Wb, s, C)
    S = S.reshape(B, Hb, Hb, n, hi, patch, patch)    # (b,h,w,s,hi,p1,p2)
    win = side // patch
    mode, two_level = _cl_mode(window_scan, grid_transpose, column_first,
                               win, patch)
    if two_level:
        f = win // patch
        S = S.reshape(B, patch, f, patch, f, n, hi, patch, patch)
    out = S.transpose(*_cl_axis_order(mode, column_first, two_level))
    return out.reshape(B, L, C)


def idwt_tokens_cl(y, num_lv: int = 2, *, window_scan: bool = False,
                   grid_transpose: bool = False, column_first: bool = False):
    """Inverse of `dwt_tokens_cl` (same mode flags)."""
    B, L, C = y.shape
    side = int(round(L ** 0.5))
    patch = 2 ** num_lv
    n = patch * patch
    if C % n or side % patch:
        raise ValueError(
            f"channel-last unpack needs C % {n} == 0 and side % {patch} == 0 "
            f"(got C={C}, side={side})")
    if num_lv not in (1, 2):
        raise ValueError("idwt_tokens_cl supports num_lv in (1, 2)")
    hi = C // n
    Hb = side // patch
    win = side // patch
    mode, two_level = _cl_mode(window_scan, grid_transpose, column_first,
                               win, patch)
    order = _cl_axis_order(mode, column_first, two_level)
    if two_level:
        f = win // patch
        shp = [B, patch, f, patch, f, n, hi, patch, patch]
    else:
        shp = [B, Hb, Hb, n, hi, patch, patch]
    inv = np.argsort(order)
    yb = y.reshape([shp[ax] for ax in order]).transpose(*inv)
    S = yb.reshape(B, Hb, Hb, n, C) * jnp.asarray(2 ** num_lv, y.dtype)
    subs = [S[:, :, :, i] for i in range(n)]
    half = jnp.asarray(0.5, y.dtype)
    if num_lv == 1:
        return _ibutterfly_cl(*subs, half).reshape(B, L, C)
    lvl1 = [_ibutterfly_cl(*subs[4 * s1:4 * s1 + 4], half) for s1 in range(4)]
    return _ibutterfly_cl(*lvl1, half).reshape(B, L, C)


# ---------------------------------------------------------------------------
# Fused windowed wavelet pack: local_scan(dwt_tokens(x)) as one basis einsum
# + one lane-aligned transpose.
#
# The straight composition is the v5e profile's single largest relayout cost
# (~2.6 ms/forward): dwt2d works in (B, C, H, W) with the 4-8 wide spatial
# dims minor (3-6% lane utilization), and the pack/local_scan pair moves the
# data twice more.  The whole pipeline is LINEAR and 4x4-block-local over
# the token grid, but NOT channel-separable: the reference's rearrange
# "(c p1 p2) h w -> (h p1 w p2) c" reinterprets the (subband, channel)
# axis as (channel, token), so (for C = G*16 channels) output channel
# c2 = q*G + g at within-block token r = p1*4+p2 holds subband q of INPUT
# channel g*16 + r.  Fused form: split channels (g, r), contract the 16
# block tokens k with the constant packet basis M0[q, k] (probed through
# the numpy twin of the reference pipeline, so the group interleave is
# captured by construction), and emit (tokens: h, w, r) x (channels: q, g)
# -- which for window == 4 IS local_scan order, no further relayout.
# Exact up to fp reassociation; parity asserted in
# tests/test_ops.py::test_wavelet_pack_windowed_matches_composition.
# ---------------------------------------------------------------------------


def _np_dwt2d(x):
    B, C, H, W = x.shape
    xb = x.reshape(B, C, H // 2, 2, W // 2, 2)
    a, b = xb[:, :, :, 0, :, 0], xb[:, :, :, 0, :, 1]
    c, d = xb[:, :, :, 1, :, 0], xb[:, :, :, 1, :, 1]
    return np.concatenate([0.5 * (a + b + c + d), 0.5 * (a + b - c - d),
                           0.5 * (a - b + c - d), 0.5 * (a - b - c + d)],
                          axis=1)


def _np_idwt2d(x):
    B, C4, H, W = x.shape
    ll, lh, hl, hh = np.split(x, 4, axis=1)
    a = 0.5 * (ll + lh + hl + hh)
    b = 0.5 * (ll + lh - hl - hh)
    c = 0.5 * (ll - lh + hl - hh)
    d = 0.5 * (ll - lh - hl + hh)
    out = np.stack([np.stack([a, b], axis=-1),
                    np.stack([c, d], axis=-1)], axis=-2)
    return out.transpose(0, 1, 2, 4, 3, 5).reshape(B, C4 // 4, 2 * H, 2 * W)


def _np_dwt_tokens(x, num_lv):
    B, L, C = x.shape
    side = int(round(L ** 0.5))
    xg = x.reshape(B, side, side, C).transpose(0, 3, 1, 2)
    sub = _np_dwt2d(xg)
    scale = float(2 ** num_lv)
    patch = 2 ** num_lv
    if num_lv > 1:
        out = _np_dwt2d(sub) / scale
        groups = np.split(out, patch * patch, axis=1)
        out = np.concatenate([groups[i] for i in _group_perm(patch)], axis=1)
    else:
        out = sub / scale
    # "b (c p1 p2) h w -> b (h p1 w p2) c"
    Bn, CP, Hs, Ws = out.shape
    out = out.reshape(B, C, patch, patch, Hs, Ws)
    out = out.transpose(0, 4, 2, 5, 3, 1).reshape(B, L, C)
    return out


def _np_idwt_tokens(x, num_lv):
    B, L, C = x.shape
    scale = float(2 ** num_lv)
    patch = 2 ** num_lv
    lowest = int(round(L ** 0.5)) // patch
    xs = (x * scale).reshape(B, lowest, patch, lowest, patch, C)
    sub = xs.transpose(0, 5, 2, 4, 1, 3).reshape(B, C * patch * patch,
                                                 lowest, lowest)
    groups = np.split(sub, patch * patch, axis=1)
    if num_lv > 1:
        sub = np.concatenate([groups[i] for i in _group_perm(patch)], axis=1)
        out = _np_idwt2d(_np_idwt2d(sub))
    else:
        out = _np_idwt2d(np.concatenate(groups, axis=1))
    return out.transpose(0, 2, 3, 1).reshape(B, L, C)


@functools.lru_cache(maxsize=None)
def _packet_basis(num_lv: int):
    """(M0, M0inv): M0[q, k] maps the 16 row-major tokens k of one block to
    packet coefficient q (in the reference's post-group-interleave order);
    M0inv is the exact inverse.  Probed with a SINGLE channel (C=1), where
    the reference rearrange is channel-separable, through the numpy twin of
    the reference pipeline."""
    p = 2 ** num_lv
    n = p * p
    cols = []
    for k in range(n):
        e = np.zeros((1, n, 1))
        e[0, k, 0] = 1.0
        cols.append(_np_dwt_tokens(e, num_lv)[0][:, 0])
    M0 = np.stack(cols, axis=1)  # out[q] = sum_k M0[q, k] in[k]
    cols = []
    for q in range(n):
        e = np.zeros((1, n, 1))
        e[0, q, 0] = 1.0
        cols.append(_np_idwt_tokens(e, num_lv)[0][:, 0])
    M0inv = np.stack(cols, axis=1)
    assert np.allclose(M0 @ M0inv, np.eye(n)), "packet basis not inverse"
    return (np.asarray(M0, np.float32), np.asarray(M0inv, np.float32))


@functools.lru_cache(maxsize=None)
def _pack_perm(side: int, num_lv: int, window: int, column_first: bool):
    """Permutation taking the block-major einsum layout (h, w, p1, p2) to
    local_scan token order over the packed (side x side) grid; None when the
    layouts coincide up to a cheap transpose handled by the caller."""
    p = 2 ** num_lv
    Hb = side // p
    f = np.arange(side * side).reshape(Hb, Hb, p, p)  # (h, w, p1, p2)
    F = f.transpose(0, 2, 1, 3).reshape(side, side)    # packed grid (R, C')
    Hg, wz = side // window, window
    G = F.reshape(Hg, wz, Hg, wz)
    if column_first:
        order = G.transpose(2, 0, 3, 1)  # (Wg, Hg, wj, wi)
    else:
        order = G.transpose(0, 2, 1, 3)  # (Hg, Wg, wi, wj)
    return np.asarray(order.reshape(-1), np.int32)


def wavelet_pack_windowed(x, num_lv: int = 2, window: int | None = None,
                          column_first: bool = False):
    """== local_scan(dwt_tokens(x, num_lv), w=window, H, W, column_first)
    with window defaulting to side // 2**num_lv (the WaveDiMBlock wiring).
    Requires C % (2**num_lv)**2 == 0 (all DiMSUM configs; callers fall back
    to the composition otherwise)."""
    B, L, C = x.shape
    side = int(round(L ** 0.5))
    p = 2 ** num_lv
    n = p * p
    window = side // p if window is None else window
    Hb = side // p
    if C % n or side % p:
        raise ValueError(
            f"fused wavelet pack needs C % {n} == 0 and side % {p} == 0 "
            f"(got C={C}, side={side}); use local_scan(dwt_tokens(x))")
    G = C // n
    M0, _ = _packet_basis(num_lv)

    # (B, h, i, w, j, C) -> (B, h, w, k=(i,j), g, r) with channels split as
    # c = g*n + r
    xb = x.reshape(B, Hb, p, Hb, p, G, n).transpose(0, 1, 3, 2, 4, 5, 6)
    xb = xb.reshape(B, Hb * Hb, n, G, n)
    # tokens out: (h, w, r); channels out: c2 = q*G + g.  Basis entries are
    # signed powers of two, exact in bf16: matching x.dtype keeps the MXU
    # on the fast path (products exact, fp32 accumulation) -- forcing fp32
    # here cost 7% END-TO-END (measured r3, 0.9125 -> 0.8483 img/s).
    y = jnp.einsum("bnkgr,qk->bnrqg", xb, jnp.asarray(M0, x.dtype))
    y = y.reshape(B, L, C)
    if window == p and not column_first:
        return y
    if window == p:
        # (h, w, p1, p2) -> (w, h, p2, p1) token order
        y = y.reshape(B, Hb, Hb, p, p, C).transpose(0, 2, 1, 4, 3, 5)
        return y.reshape(B, L, C)
    perm = jnp.asarray(_pack_perm(side, num_lv, window, column_first))
    return jnp.take(y, perm, axis=1)


def wavelet_unpack_windowed(x, num_lv: int = 2, window: int | None = None,
                            column_first: bool = False):
    """Inverse of `wavelet_pack_windowed`:
    == idwt_tokens(local_reverse(x, ...), num_lv)."""
    B, L, C = x.shape
    side = int(round(L ** 0.5))
    p = 2 ** num_lv
    n = p * p
    window = side // p if window is None else window
    Hb = side // p
    if C % n or side % p:
        raise ValueError(
            f"fused wavelet unpack needs C % {n} == 0 and side % {p} == 0 "
            f"(got C={C}, side={side})")
    G = C // n
    _, M0inv = _packet_basis(num_lv)

    if window == p and column_first:
        y = x.reshape(B, Hb, Hb, p, p, C).transpose(0, 2, 1, 4, 3, 5)
        y = y.reshape(B, L, C)
    elif window != p:
        perm = _pack_perm(side, num_lv, window, column_first)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(L, dtype=np.int32)
        y = jnp.take(x, jnp.asarray(inv), axis=1)
    else:
        y = x
    yb = y.reshape(B, Hb * Hb, n, n, G)  # (b, blk, r, q, g): c2 = q*G + g
    # invert: x[b, blk, k, g*n + r] = sum_q M0inv[k, q] y[b, blk, r, q, g]
    out = jnp.einsum("bnrqg,kq->bnkgr", yb, jnp.asarray(M0inv, x.dtype))
    out = out.reshape(B, Hb, Hb, p, p, G, n)
    out = out.transpose(0, 1, 3, 2, 4, 5, 6)  # (B, h, i, w, j, G, n)
    return out.reshape(B, L, C)
