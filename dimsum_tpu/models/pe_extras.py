"""Positional-encoding extras from the reference's unused-but-present zoo.

Reference: `/root/reference/dimsum/rope.py` (EVA-02 VisionRotaryEmbedding),
`pe/rotary.py`, `pe/sinusoidal.py`.  The main DiM paths use ape / the 2-D
rotary in embedders.py / cpe; these complete the PE inventory.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp


def vision_rotary_freqs(dim: int, pt_seq_len: int = 16,
                        ft_seq_len: Optional[int] = None,
                        theta: float = 10000.0):
    """EVA-02 style 2-D axial rotary tables (reference rope.py
    VisionRotaryEmbeddingFast): returns (freqs_cos, freqs_sin) of shape
    (ft_seq_len**2, dim) where dim covers BOTH axes (dim//2 per axis,
    each frequency repeated twice)."""
    ft_seq_len = pt_seq_len if ft_seq_len is None else ft_seq_len
    half = dim // 2
    freqs = 1.0 / (theta ** (np.arange(0, half, 2, dtype=np.float64) / half))
    t = np.arange(ft_seq_len, dtype=np.float64) / ft_seq_len * pt_seq_len
    f = np.einsum("i,j->ij", t, freqs)            # (L, half/2)
    f = np.repeat(f, 2, axis=-1)                  # (L, half)
    # broadcast over the 2-D grid: axis-0 freqs vary with rows, axis-1 cols
    fy = np.broadcast_to(f[:, None, :], (ft_seq_len, ft_seq_len, half))
    fx = np.broadcast_to(f[None, :, :], (ft_seq_len, ft_seq_len, half))
    full = np.concatenate([fy, fx], axis=-1).reshape(-1, 2 * half)
    return (jnp.asarray(np.cos(full), jnp.float32),
            jnp.asarray(np.sin(full), jnp.float32))


def rotate_half_interleaved(x):
    x_even = x[..., 0::2]
    x_odd = x[..., 1::2]
    return jnp.stack([-x_odd, x_even], axis=-1).reshape(x.shape)


def apply_vision_rotary(x, freqs_cos, freqs_sin):
    """x: (..., L, dim) with tables from `vision_rotary_freqs`."""
    return x * freqs_cos + rotate_half_interleaved(x) * freqs_sin


def sinusoidal_pos_embed_1d(num_positions: int, dim: int,
                            max_period: float = 10000.0):
    """Plain 1-D sin/cos table (reference pe/sinusoidal.py)."""
    pos = np.arange(num_positions, dtype=np.float64)[:, None]
    idx = np.arange(dim // 2, dtype=np.float64)[None, :]
    angle = pos / np.power(max_period, 2 * idx / dim)
    out = np.zeros((num_positions, dim), np.float32)
    out[:, 0::2] = np.sin(angle)
    out[:, 1::2] = np.cos(angle)
    return jnp.asarray(out)
