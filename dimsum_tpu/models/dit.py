"""Vanilla DiT baseline (adaLN-Zero) for comparison runs.

Reference: `/root/reference/dimsum/models_dit.py` (DiT :152-297, zoo :397-415).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from dimsum_tpu.models.blocks import DiTBlock
from dimsum_tpu.models.embedders import (
    FinalLayer,
    LabelEmbedder,
    PatchEmbed,
    TimestepEmbedder,
    get_2d_sincos_pos_embed,
    unpatchify,
)


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    img_resolution: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    label_dropout: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = False
    dtype: Any = jnp.float32
    grad_checkpoint: bool = False  # reference set_gradient_checkpointing

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @property
    def grid_size(self) -> int:
        return self.img_resolution // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2


class DiT(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, t, y=None, train: bool = False,
                 force_drop_ids=None):
        cfg = self.cfg
        N = x.shape[0]
        y_embedder = LabelEmbedder(cfg.num_classes, cfg.hidden_size,
                                   cfg.label_dropout, name="y_embedder")
        if y is None:
            y = jnp.full((N,), y_embedder.in_channels - 1, jnp.int32)
        t_emb = TimestepEmbedder(cfg.hidden_size, dtype=cfg.dtype,
                                 name="t_embedder")(t)
        y_emb = y_embedder(y, train=train, force_drop_ids=force_drop_ids)
        c = (t_emb + y_emb).astype(cfg.dtype)

        x = PatchEmbed(cfg.patch_size, cfg.hidden_size, dtype=cfg.dtype,
                       name="x_embedder")(x.astype(cfg.dtype))
        pe_init = get_2d_sincos_pos_embed(cfg.hidden_size, cfg.grid_size)[None]
        pos_embed = self.param("pos_embed",
                               lambda key, shape: jnp.asarray(pe_init),
                               (1, cfg.num_patches, cfg.hidden_size))
        x = x + jax.lax.stop_gradient(pos_embed).astype(cfg.dtype)

        for i in range(cfg.depth):
            # Plain DiT uses a non-gated MLP (timm Mlp), see models_dit.py:127
            block = DiTBlock(cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio,
                             use_gated_mlp=False, dtype=cfg.dtype,
                             name=f"blocks_{i}")
            if cfg.grad_checkpoint:
                x = nn.remat(lambda mdl, *a: mdl(*a))(block, x, c)
            else:
                x = block(x, c)

        x = FinalLayer(cfg.patch_size, cfg.out_channels, dtype=cfg.dtype,
                       name="final_layer")(x, c)
        return unpatchify(x.astype(jnp.float32), cfg.patch_size,
                          cfg.out_channels)


def _zoo(depth, hidden, patch, heads, **kw) -> DiTConfig:
    return DiTConfig(depth=depth, hidden_size=hidden, patch_size=patch,
                     num_heads=heads, **kw)


DiT_models = {
    "DiT-XL/2": lambda **kw: _zoo(28, 1152, 2, 16, **kw),
    "DiT-XL/4": lambda **kw: _zoo(28, 1152, 4, 16, **kw),
    "DiT-XL/8": lambda **kw: _zoo(28, 1152, 8, 16, **kw),
    "DiT-L/2": lambda **kw: _zoo(24, 1024, 2, 16, **kw),
    "DiT-L/4": lambda **kw: _zoo(24, 1024, 4, 16, **kw),
    "DiT-L/8": lambda **kw: _zoo(24, 1024, 8, 16, **kw),
    "DiT-B/2": lambda **kw: _zoo(12, 768, 2, 12, **kw),
    "DiT-B/4": lambda **kw: _zoo(12, 768, 4, 12, **kw),
    "DiT-B/8": lambda **kw: _zoo(12, 768, 8, 12, **kw),
    "DiT-S/2": lambda **kw: _zoo(12, 384, 2, 6, **kw),
    "DiT-S/4": lambda **kw: _zoo(12, 384, 4, 6, **kw),
    "DiT-S/8": lambda **kw: _zoo(12, 384, 8, 6, **kw),
}
