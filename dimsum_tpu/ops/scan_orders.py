"""Scan-order permutation zoo: sweep / zigma (serpentine) / jpeg (zigzag).

Reference semantics: `/root/reference/dimsum/scanning_orders.py` (SCAN_ZOO
:419-423, path generators :6-245, `reverse_permut_np` :248, windowed
`local_scan`/`local_reverse` :347-416).

Each generator returns 8 directional variants: 4 corners (top-left, top-right,
bottom-left, bottom-right) x {row-major "lr", column-major "tb"}.  Paths are
int32 index arrays applied with `jnp.take` along the token axis; inside jit
they are constants, so XLA folds the gather indices.

`local_scan`/`local_reverse` are pure reshapes/transposes (LocalMamba windowed
ordering) -- free on TPU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "sweep_path", "zigma_path", "jpeg_zigzag", "SCAN_ZOO",
    "reverse_permut_np", "local_scan", "local_reverse",
    "apply_permutation", "build_layer_paths",
]

def _corners(N):
    return [
        (0, 0, 1, 1),
        (0, N - 1, 1, -1),
        (N - 1, 0, -1, 1),
        (N - 1, N - 1, -1, -1),
    ]


def _apply_corner(cells_vh, N, sr, sc, dr, dc):
    v, h = cells_vh
    return (sr + dr * v) * N + sc + dc * h


def _eight_variants(N, base_vh):
    """base_vh: (v_idx, h_idx) arrays for the canonical top-left corner.
    The 'tb' (column-first) variant is the transpose (v <-> h swap)."""
    v, h = base_vh
    paths = []
    for sr, sc, dr, dc in _corners(N):
        paths.append(_apply_corner((v, h), N, sr, sc, dr, dc))
        paths.append(_apply_corner((h, v), N, sr, sc, dr, dc))
    return [p.astype(np.int64) for p in paths]


def sweep_path(N):
    """Plain raster sweep (reference scanning_orders.py:6-40)."""
    i = np.repeat(np.arange(N), N)
    j = np.tile(np.arange(N), N)
    return _eight_variants(N, (i, j))


def zigma_path(N):
    """Serpentine (ZigMa continuity) scan (reference :43-78)."""
    i = np.repeat(np.arange(N), N)
    j = np.tile(np.arange(N), N)
    j = np.where(i % 2 == 0, j, N - 1 - j)
    return _eight_variants(N, (i, j))


def jpeg_zigzag(N):
    """JPEG anti-diagonal zigzag (reference :81-245).

    Diagonal s = v + h is traversed with v descending when s is even
    (moving up-right) and ascending when odd.
    """
    vs, hs = [], []
    for s in range(2 * N - 1):
        lo, hi = max(0, s - N + 1), min(s, N - 1)
        v = np.arange(lo, hi + 1)
        if s % 2 == 0:
            v = v[::-1]
        vs.append(v)
        hs.append(s - v)
    v = np.concatenate(vs)
    h = np.concatenate(hs)
    return _eight_variants(N, (v, h))


SCAN_ZOO = {
    "sweep": sweep_path,
    "zigma": zigma_path,
    "jpeg": jpeg_zigzag,
}


def reverse_permut_np(permutation):
    """Inverse permutation: out[perm[i]] = i (reference :248-253)."""
    perm = np.asarray(permutation)
    reverse = np.empty_like(perm)
    reverse[perm] = np.arange(len(perm))
    return reverse


def build_layer_paths(grid_size: int, scan_type: str, depth: int):
    """Build per-layer (paths, inverse_paths) int32 arrays of shape (depth, L).

    Mirrors DiM.gen_paths (reference models_dim.py:1640-1658): scan_type is
    "<zoo>_<num_paths>"; the first num_paths variants are tiled across depth.
    """
    zoo_name, num = scan_type.split("_")
    paths = SCAN_ZOO[zoo_name](grid_size)[: int(num)]
    revs = [reverse_permut_np(p) for p in paths]
    # Reference: torch.cat(zz_paths * depth) => the path list repeated depth
    # times; layer i indexes row i, i.e. uses zz_paths[i % num_paths].
    rows = depth * len(paths)
    fwd = np.stack([paths[i % len(paths)] for i in range(rows)])
    bwd = np.stack([revs[i % len(revs)] for i in range(rows)])
    return jnp.asarray(fwd, jnp.int32), jnp.asarray(bwd, jnp.int32)


def apply_permutation(x, perm):
    """Gather tokens along the L axis: x (B, L, D), perm (L,) -> x[:, perm, :]."""
    return jnp.take(x, perm, axis=1)


def local_scan(x, w: int = 7, H: int = 14, W: int = 14, flip: bool = False,
               column_first: bool = False):
    """Windowed (LocalMamba) token ordering (reference :347-371).

    x: (B, L, C).  Requires H % w == 0 and W % w == 0 (always true for the
    DiMSUM configs; the reference pads otherwise but its unpad path is dead).
    """
    assert H % w == 0 and W % w == 0, "local_scan requires divisible grid"
    B, L, C = x.shape
    xg = x.reshape(B, H // w, w, W // w, w, C)
    if column_first:
        xg = xg.transpose(0, 3, 1, 4, 2, 5)  # (B, Wg, Hg, wj, wi, C)
    else:
        xg = xg.transpose(0, 1, 3, 2, 4, 5)  # (B, Hg, Wg, wi, wj, C)
    out = xg.reshape(B, L, C)
    if flip:
        out = out[:, ::-1]
    return out


def local_reverse(x, w: int = 7, H: int = 14, W: int = 14, flip: bool = False,
                  column_first: bool = False):
    """Inverse of `local_scan` (reference :392-416)."""
    assert H % w == 0 and W % w == 0
    B, L, C = x.shape
    if flip:
        x = x[:, ::-1]
    if column_first:
        xg = x.reshape(B, W // w, H // w, w, w, C)
        xg = xg.transpose(0, 2, 4, 1, 3, 5)  # (B, Hg, wi, Wg, wj, C)
    else:
        xg = x.reshape(B, H // w, W // w, w, w, C)
        xg = xg.transpose(0, 1, 3, 2, 4, 5)
    return xg.reshape(B, L, C)
