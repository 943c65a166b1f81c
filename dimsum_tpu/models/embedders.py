"""Patch/timestep/label embedders, positional encodings, final layer.

Reference: `/root/reference/dimsum/models_dim.py` (TimestepEmbedder :129-167,
LabelEmbedder :170-202, FinalLayer :205-220, sin-cos pos embed :44-91),
timm PatchEmbed (used at :1620), 2-D rotary `pe/my_rotary.py`, and the
conditional PosCNN `pe/cpe.py:29-51`.

PatchEmbed is implemented as patch-extract + one MXU matmul rather than a
strided conv -- identical math (the converter folds the torch conv weight
into the dense kernel), better TPU mapping.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from dimsum_tpu.ops.norms import layer_norm, modulate, norm_modulate


# --------------------------------------------------------------------------
# Frozen sin-cos position tables (numpy; computed once at model build)
# --------------------------------------------------------------------------


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray):
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int):
    """(grid_size**2, embed_dim); matches reference models_dim.py:44-91."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w first
    grid = grid.reshape([2, 1, grid_size, grid_size])
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


def get_2d_sincos_rotary_embed(embed_dim: int, grid_size: int):
    """Returns (emb_sin, emb_cos) of shape (grid**2, embed_dim)
    (reference pe/my_rotary.py:11-41): half the dims encode each axis, each
    frequency repeated twice for the rotate-half pairing."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0).reshape(
        [2, 1, grid_size, grid_size]
    )

    def one_axis(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.sin(out), np.cos(out)

    sin_h, cos_h = one_axis(embed_dim // 2, grid[0])
    sin_w, cos_w = one_axis(embed_dim // 2, grid[1])
    emb_sin = np.concatenate([sin_h, sin_w], axis=1).repeat(2, axis=1)
    emb_cos = np.concatenate([cos_h, cos_w], axis=1).repeat(2, axis=1)
    return emb_sin.astype(np.float32), emb_cos.astype(np.float32)


def rotate_half(x):
    """Interleaved rotate-half (reference pe/my_rotary.py:65-70)."""
    x_even = x[..., 0::2]
    x_odd = x[..., 1::2]
    return jnp.stack([-x_odd, x_even], axis=-1).reshape(x.shape)


def apply_rotary(x, emb_sin, emb_cos):
    return x * emb_cos + rotate_half(x) * emb_sin


# --------------------------------------------------------------------------
# Modules
# --------------------------------------------------------------------------


class PatchEmbed(nn.Module):
    """Patchify (B, C, H, W) -> (B, L, D) via reshape + matmul.

    Equivalent to timm's Conv2d(k=p, s=p): the dense kernel equals the conv
    weight reshaped to (C*p*p, D) with (C, p, p) input ordering.
    """

    patch_size: int
    hidden_size: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, C, H, W = x.shape
        p = self.patch_size
        h, w = H // p, W // p
        x = x.reshape(B, C, h, p, w, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, h * w, C * p * p)
        return nn.Dense(self.hidden_size, use_bias=self.use_bias,
                        dtype=self.dtype, name="proj")(x)


class TimestepEmbedder(nn.Module):
    """Sinusoidal timestep embedding -> MLP (reference :129-167).
    Frequency embedding is cat([cos, sin]) -- cos first."""

    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: Any = jnp.float32

    @staticmethod
    def timestep_embedding(t, dim, max_period=10000):
        half = dim // 2
        freqs = jnp.exp(
            -math.log(max_period)
            * jnp.arange(half, dtype=jnp.float32) / half
        )
        args = t[:, None].astype(jnp.float32) * freqs[None]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        if dim % 2:
            emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
        return emb

    @nn.compact
    def __call__(self, t):
        t_freq = self.timestep_embedding(t, self.frequency_embedding_size)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_0")(t_freq)
        h = jax.nn.silu(h)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_2")(h)


class LabelEmbedder(nn.Module):
    """Class-label embedding with CFG token dropout (reference :170-202)."""

    num_classes: int
    hidden_size: int
    dropout_prob: float

    @property
    def in_channels(self):
        return self.num_classes + int(self.dropout_prob > 0)

    @nn.compact
    def __call__(self, labels, train: bool = False, force_drop_ids=None):
        table = nn.Embed(self.in_channels, self.hidden_size,
                         embedding_init=nn.initializers.normal(0.02),
                         name="embedding_table")
        use_dropout = self.dropout_prob > 0
        if (train and use_dropout) or (force_drop_ids is not None):
            if force_drop_ids is None:
                rng = self.make_rng("label_dropout")
                drop = jax.random.uniform(rng, labels.shape) < self.dropout_prob
            else:
                drop = force_drop_ids == 1
            labels = jnp.where(drop, self.num_classes, labels)
        return table(labels)


class FinalLayer(nn.Module):
    """adaLN-modulated projection head (reference :205-220)."""

    patch_size: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        D = x.shape[-1]
        mod = nn.Dense(2 * D, dtype=self.dtype, name="adaLN_modulation_fc",
                       kernel_init=nn.initializers.zeros)(jax.nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x, _ = norm_modulate(x, None, shift=shift, scale=scale, eps=1e-6,
                             is_rms=False)
        return nn.Dense(
            self.patch_size * self.patch_size * self.out_channels,
            dtype=self.dtype, name="linear",
            kernel_init=nn.initializers.zeros,
        )(x)


class AdaInPosCNN(nn.Module):
    """Conditional positional encoding (reference pe/cpe.py:29-51):
    depthwise 3x3 conv + residual, then adaLN-modulated LayerNorm."""

    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c, H: int, W: int):
        B, N, C = x.shape
        feat = x.reshape(B, H, W, C)
        conv = nn.Conv(self.embed_dim, (3, 3), padding=1,
                       feature_group_count=self.embed_dim,
                       dtype=self.dtype, name="proj")(feat)
        x = (conv + feat).reshape(B, N, C)
        mod = nn.Dense(2 * self.embed_dim, dtype=self.dtype,
                       name="adaLN_modulation_fc")(jax.nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        w = self.param("norm_scale", nn.initializers.ones, (self.embed_dim,))
        b = self.param("norm_bias", nn.initializers.zeros, (self.embed_dim,))
        return modulate(layer_norm(x, w, b, eps=1e-5), shift, scale)


def unpatchify(x, patch_size: int, out_channels: int):
    """(N, T, p*p*C) -> (N, C, H, W) (reference models_dim.py:1781-1794)."""
    N, T, _ = x.shape
    p = patch_size
    h = w = int(round(T ** 0.5))
    x = x.reshape(N, h, w, p, p, out_channels)
    x = jnp.einsum("nhwpqc->nchpwq", x)
    return x.reshape(N, out_channels, h * p, w * p)
