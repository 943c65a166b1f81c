"""Training-time image augmentation + fused-gelu helpers.

Reference: `/root/reference/dimsum/augment.py` (DeiT "3-Augment":
gray / solarize / blur one-of-three, plus color jitter and hflip) and
`bias_gelu.py` (Megatron fused bias+gelu -- on TPU, XLA fuses `gelu(x + b)`
automatically, the functions exist for API parity).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# --------------------------- fused bias-gelu --------------------------------


def bias_gelu(bias, y):
    """tanh-approx gelu(y + bias) (reference bias_gelu.py); XLA fuses it."""
    x = y + bias
    return x * 0.5 * (1.0 + jnp.tanh(0.79788456 * x * (1 + 0.044715 * x * x)))


def gelu_back(g, bias, y):
    """Hand gradient kept for parity with the reference's autograd fn."""
    x = y + bias
    t = jnp.tanh(0.79788456 * x * (1 + 0.044715 * x * x))
    ff = 0.5 * x * ((1 - t * t) * (0.79788456 + 0.1070322243 * x * x)) \
        + 0.5 * (1 + t)
    return ff * g


# ------------------------------ 3-Augment ----------------------------------


def _to_float(img):
    return img.astype(np.float32)


def gray_scale(img: np.ndarray) -> np.ndarray:
    """img: (H, W, 3) uint8."""
    g = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
    return np.repeat(g[..., None], 3, axis=-1).astype(img.dtype)


def solarize(img: np.ndarray, threshold: int = 128) -> np.ndarray:
    return np.where(img >= threshold, 255 - img, img).astype(img.dtype)


def gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    radius = max(int(3 * sigma), 1)
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    k /= k.sum()
    out = _to_float(img)
    for axis in (0, 1):
        out = np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="same"), axis, out)
    return np.clip(out, 0, 255).astype(img.dtype)


def three_augment(img: np.ndarray, rng: np.random.Generator,
                  blur_sigma=(0.1, 2.0), jitter: float = 0.3,
                  hflip_p: float = 0.5) -> np.ndarray:
    """One-of {grayscale, solarize, blur} + brightness jitter + hflip
    (reference augment.py).  img: (H, W, 3) uint8 -> uint8."""
    choice = rng.integers(0, 3)
    if choice == 0:
        img = gray_scale(img)
    elif choice == 1:
        img = solarize(img)
    else:
        img = gaussian_blur(img, rng.uniform(*blur_sigma))
    if jitter > 0:
        factor = 1.0 + rng.uniform(-jitter, jitter)
        img = np.clip(_to_float(img) * factor, 0, 255).astype(np.uint8)
    if rng.random() < hflip_p:
        img = img[:, ::-1]
    return np.ascontiguousarray(img)


def block_noise(rng_key, shape, block_size: int = 1):
    """Block-correlated Gaussian noise (reference transport/blurring.py
    block_noise :152-167): sum of rolled copies, std-normalized."""
    g = jax.random.normal(rng_key, shape)
    if block_size == 1:
        return g
    out = jnp.zeros(shape)
    for px in range(block_size):
        for py in range(block_size):
            out = out + jnp.roll(g, shift=(px, py), axis=(-2, -1))
    return out / block_size
