"""Feed-forward variants: GatedMLP (GLU), plain Mlp, and the MoE expert MLP.

Reference: `/root/reference/dimsum/mlp.py` (GatedMLP :49-70, expert MLP :7-46)
and timm's Mlp used by DiT blocks.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


class GatedMLP(nn.Module):
    """w3(act(x1) * x2) with w12 producing [x1; x2] (reference mlp.py:49-70)."""

    hidden_features: int
    out_features: Optional[int] = None
    act: Callable = gelu_tanh
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_features = self.out_features or x.shape[-1]
        x12 = nn.Dense(2 * self.hidden_features, use_bias=self.use_bias,
                       dtype=self.dtype, name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(out_features, use_bias=self.use_bias,
                        dtype=self.dtype, name="w3")(self.act(x1) * x2)


class Mlp(nn.Module):
    """timm-style two-layer MLP (fc1 -> act -> fc2)."""

    hidden_features: int
    out_features: Optional[int] = None
    act: Callable = gelu_tanh
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_features = self.out_features or x.shape[-1]
        x = nn.Dense(self.hidden_features, use_bias=self.use_bias,
                     dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        return nn.Dense(out_features, use_bias=self.use_bias,
                        dtype=self.dtype, name="fc2")(x)


class ExpertMLP(nn.Module):
    """MoE expert FFN with optional GLU (reference mlp.py:7-46):
    linear_fc1 -> (glu | gelu) -> linear_fc2, hidden = 4*dim."""

    dim: int
    add_bias_linear: bool = False
    gated_linear_unit: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = 4 * self.dim
        fc1_out = hidden * 2 if self.gated_linear_unit else hidden
        h = nn.Dense(fc1_out, use_bias=self.add_bias_linear,
                     dtype=self.dtype, name="linear_fc1")(x)
        if self.gated_linear_unit:
            a, b = jnp.split(h, 2, axis=-1)
            h = jax.nn.gelu(a, approximate=False) * b
        else:
            h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, use_bias=self.add_bias_linear,
                        dtype=self.dtype, name="linear_fc2")(h)
