"""DCT-II / inverse DCT as frozen-basis matmuls (MXU-friendly).

Two consumers:

1. The DCTBlock frequency branch (reference `/root/reference/dimsum/dct_layer.py`):
   a strided grouped conv with a frozen DCT basis over non-overlapping
   ksize x ksize patches, keeping the rsize x rsize low-frequency corner, and
   the 1x1-conv + PixelShuffle inverse.  On TPU a frozen-basis strided conv is
   exactly a block reshape + two small matmuls, which map straight onto the
   MXU -- so that's how we implement it.

2. The blurring interpolant (reference `/root/reference/dimsum/transport/blurring.py`,
   a torch-dct FFT port): patchwise orthonormal 2-D DCT.  The FFT trick is a
   GPU-ism; for the tiny patch sizes used (blur_upscale=4) a basis matmul is
   both exact and faster, and the 'ortho' normalization is identical to the
   separable basis below.

Basis: M[k, n] = sqrt(2/N) * c_k * cos((2n+1) k pi / (2N)), c_0 = 1/sqrt(2),
so dct1d(x) = M @ x and idct1d(X) = M.T @ X (orthonormal).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

__all__ = [
    "dct_basis", "dct_patch", "idct_patch", "dct_2d", "idct_2d", "dct_1d",
    "idct_1d",
]


@functools.lru_cache(maxsize=None)
def _basis_np(n: int) -> np.ndarray:
    k = np.arange(n)[:, None].astype(np.float64)
    x = np.arange(n)[None, :].astype(np.float64)
    m = np.sqrt(2.0 / n) * np.cos((2 * x + 1) * k * np.pi / (2 * n))
    m[0] /= np.sqrt(2.0)
    return m.astype(np.float32)


def dct_basis(n: int) -> jnp.ndarray:
    """Orthonormal DCT-II basis matrix (n, n)."""
    return jnp.asarray(_basis_np(n))


def dct_1d(x, norm: str = "ortho"):
    """DCT-II over the last axis."""
    n = x.shape[-1]
    m = dct_basis(n)
    y = jnp.einsum("...n,kn->...k", x, m, precision="highest")
    if norm != "ortho":  # match torch-dct's unnormalized variant
        scale = jnp.full((n,), np.sqrt(2.0 * n), np.float32)
        scale = scale.at[0].set(np.sqrt(4.0 * n) / np.sqrt(2.0))
        y = y * scale
    return y


def idct_1d(x, norm: str = "ortho"):
    n = x.shape[-1]
    m = dct_basis(n)
    if norm != "ortho":
        scale = jnp.full((n,), np.sqrt(2.0 * n), np.float32)
        scale = scale.at[0].set(np.sqrt(4.0 * n) / np.sqrt(2.0))
        x = x / scale
    return jnp.einsum("...k,kn->...n", x, m, precision="highest")


def dct_patch(x, ksize: int, rsize: int | None = None):
    """Patchwise 2-D DCT (reference init_dct_kernel conv, dct_layer.py:6-43).

    x: (B, C, H, W) -> (B, C * rsize^2, H/k, W/k), channel order (c, v, u)
    with c slowest (matching the grouped-conv output layout).
    """
    rsize = ksize if rsize is None else rsize
    B, C, H, W = x.shape
    k = ksize
    m = dct_basis(k)[:rsize]  # (r, k)
    blk = x.reshape(B, C, H // k, k, W // k, k)
    # out[b, c, v, u, h, w] = sum_{y,x} M[v,y] M[u,x] blk[b,c,h,y,w,x]
    out = jnp.einsum("bchywx,vy,ux->bcvuhw", blk, m, m, precision="highest")
    return out.reshape(B, C * rsize * rsize, H // k, W // k)


def idct_patch(x, ksize: int, rsize: int | None = None, out_channels: int | None = None):
    """Inverse of `dct_patch` (reference init_idct_kernel + PixelShuffle,
    dct_layer.py:46-84)."""
    rsize = ksize if rsize is None else rsize
    B, CR, H, W = x.shape
    C = CR // (rsize * rsize)
    k = ksize
    m = dct_basis(k)[:rsize]
    coef = x.reshape(B, C, rsize, rsize, H, W)
    blk = jnp.einsum("bcvuhw,vy,ux->bchywx", coef, m, m, precision="highest")
    return blk.reshape(B, C, H * k, W * k)


def _to_patches(x, size: int):
    B, C, H, W = x.shape
    return (
        x.reshape(B, C, H // size, size, W // size, size)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(-1, C, size, size)
    )


def _from_patches(x, image_size: int):
    _, C, _, size = x.shape
    g = image_size // size
    return (
        x.reshape(-1, g, g, C, size, size)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(-1, C, image_size, image_size)
    )


def dct_2d(x, size: int, norm: str = "ortho", keeps_size: bool = True):
    """Patchwise 2-D DCT over the last two axes (reference blurring.dct_2d)."""
    origin = x.shape[-1]
    xp = _to_patches(x, size) if origin > size else x
    y = dct_1d(xp, norm)
    y = jnp.swapaxes(dct_1d(jnp.swapaxes(y, -1, -2), norm), -1, -2)
    if keeps_size and origin > size:
        y = _from_patches(y, origin)
    return y


def idct_2d(x, size: int, norm: str = "ortho"):
    origin = x.shape[-1]
    xp = _to_patches(x, size) if origin > size else x
    y = idct_1d(xp, norm)
    y = jnp.swapaxes(idct_1d(jnp.swapaxes(y, -1, -2), norm), -1, -2)
    if origin > size:
        y = _from_patches(y, origin)
    return y
