"""StyleGAN-ADA image ops: upfirdn2d and bias_act, XLA-native.

Reference: `/root/reference/eval_toolbox/torch_utils/ops/upfirdn2d.{py,cu}`
and `bias_act.{py,cu}` -- JIT-compiled CUDA plugins the reference needs only
to run legacy StyleGAN pickles for the PPL metric.  Here they are plain XLA
(pad -> FIR conv -> downsample fuses fine); PPL itself additionally requires
unpickling a torch generator, which is out of scope for the TPU runtime --
these ops exist so a JAX port of such a generator has its primitives.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_ACTS = {
    "linear": (lambda x, alpha: x, 1.0),
    "relu": (lambda x, alpha: jnp.maximum(x, 0), np.sqrt(2.0)),
    "lrelu": (lambda x, alpha: jnp.where(x >= 0, x, x * alpha),
              np.sqrt(2.0)),
    "tanh": (lambda x, alpha: jnp.tanh(x), 1.0),
    "sigmoid": (lambda x, alpha: jax.nn.sigmoid(x), 1.0),
    "elu": (lambda x, alpha: jax.nn.elu(x), 1.0),
    "selu": (lambda x, alpha: jax.nn.selu(x), 1.0),
    "softplus": (lambda x, alpha: jax.nn.softplus(x), 1.0),
    "swish": (lambda x, alpha: x * jax.nn.sigmoid(x), np.sqrt(2.0)),
}


def bias_act(x, b=None, dim: int = 1, act: str = "linear",
             alpha: float = 0.2, gain: float | None = None,
             clamp: float | None = None):
    """Fused bias + activation + gain + clamp (reference bias_act.py)."""
    fn, def_gain = _ACTS[act]
    gain = def_gain if gain is None else gain
    if b is not None:
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.reshape(shape)
    x = fn(x, alpha)
    if gain != 1:
        x = x * gain
    if clamp is not None and clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x


def setup_filter(f, normalize: bool = True, gain: float = 1.0,
                 separable=None):
    """FIR filter setup (reference upfirdn2d.setup_filter)."""
    f = jnp.asarray(f, jnp.float32)
    if f.ndim == 0:
        f = f[None]
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = jnp.outer(f, f)
    if normalize:
        f = f / jnp.sum(f)
    return f * (gain ** (f.ndim / 2))


def upfirdn2d(x, f, up: int = 1, down: int = 1, padding=0,
              gain: float = 1.0):
    """Upsample -> FIR filter -> downsample (reference upfirdn2d.py).

    x: (B, C, H, W); f: 2-D (or 1-D separable) filter.
    """
    B, C, H, W = x.shape
    if isinstance(padding, int):
        padx0 = padx1 = pady0 = pady1 = padding
    else:
        padx0, padx1, pady0, pady1 = padding
    f = jnp.asarray(f, jnp.float32)
    if f.ndim == 1:
        f = jnp.outer(f, f)

    # upsample by zero-insertion
    if up > 1:
        xz = jnp.zeros((B, C, H, up, W, up), x.dtype)
        xz = xz.at[:, :, :, 0, :, 0].set(x)
        x = xz.reshape(B, C, H * up, W * up)
    # pad (may be negative = crop)
    x = jnp.pad(x, ((0, 0), (0, 0),
                    (max(pady0, 0), max(pady1, 0)),
                    (max(padx0, 0), max(padx1, 0))))
    x = x[:, :,
          max(-pady0, 0): x.shape[2] - max(-pady1, 0),
          max(-padx0, 0): x.shape[3] - max(-padx1, 0)]
    # FIR convolve (correlate with flipped filter, per upfirdn convention)
    fh, fw = f.shape
    kernel = jnp.flip(f, (0, 1)) * (gain * (up ** 2))
    kernel = jnp.tile(kernel[None, None], (C, 1, 1, 1))
    x = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="VALID",
        feature_group_count=C,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if down > 1:
        x = x[:, :, ::down, ::down]
    return x


def upsample2d(x, f, up: int = 2, gain: float = 1.0):
    fh = f.shape[-1]
    p = fh - up
    return upfirdn2d(x, f, up=up,
                     padding=((p + 1) // 2 + up - 1, p // 2,
                              (p + 1) // 2 + up - 1, p // 2), gain=gain)


def downsample2d(x, f, down: int = 2, gain: float = 1.0):
    fh = f.shape[-1]
    p = fh - down
    return upfirdn2d(x, f, down=down,
                     padding=((p + 1) // 2, p // 2, (p + 1) // 2, p // 2),
                     gain=gain)
