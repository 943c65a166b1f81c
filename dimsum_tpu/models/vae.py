"""Stable-Diffusion VAE (AutoencoderKL, f8, 4-ch latents) in flax.

The reference uses `diffusers.AutoencoderKL.from_pretrained(
"stabilityai/sd-vae-ft-{ema,mse}")` (`/root/reference/dimsum/train.py:196`,
`sample.py:102`) for latent encode/decode with scale factor 0.18215.  This is
a from-scratch flax implementation of that architecture plus a converter from
the diffusers torch state dict (load the weights from a local
`diffusion_pytorch_model.bin` / safetensors file -- this build environment has
no network egress, so weights must be provided on disk).

TPU notes: convs run in NHWC (XLA's native TPU conv layout); the public API
is NCHW to match the reference's tensor conventions.  Decode defaults to
fp32 -- bf16 VAE decode visibly shifts FID (SURVEY.md 7 hard parts).
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

SD_SCALE_FACTOR = 0.18215


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(32, epsilon=1e-6, name="norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, name="norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(32, epsilon=1e-6, name="group_norm")(x)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        q = q.reshape(B, H * W, C)
        k = k.reshape(B, H * W, C)
        v = v.reshape(B, H * W, C)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(C).astype(q.dtype),
            axis=-1)
        h = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(B, H, W, C)
        h = nn.Dense(C, dtype=self.dtype, name="to_out")(h)
        return x + h


class Downsample(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # SD uses asymmetric padding (0,1) each spatial dim, stride 2
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3, 3), strides=2, padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
        return nn.Conv(C, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    z_ch: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        for i, mult in enumerate(self.ch_mult):
            out_ch = self.ch * mult
            for j in range(2):
                h = ResnetBlock(out_ch, dtype=self.dtype,
                                name=f"down_{i}_res_{j}")(h)
            if i < len(self.ch_mult) - 1:
                h = Downsample(dtype=self.dtype, name=f"down_{i}_ds")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_res_0")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_res_1")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, name="conv_norm_out")(h)
        h = jax.nn.silu(h)
        return nn.Conv(2 * self.z_ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    out_ch: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        h = nn.Conv(self.ch * self.ch_mult[-1], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_res_0")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_res_1")(h)
        for i, mult in enumerate(reversed(self.ch_mult)):
            out_ch = self.ch * mult
            for j in range(3):
                h = ResnetBlock(out_ch, dtype=self.dtype,
                                name=f"up_{i}_res_{j}")(h)
            if i < len(self.ch_mult) - 1:
                h = Upsample(dtype=self.dtype, name=f"up_{i}_us")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, name="conv_norm_out")(h)
        h = jax.nn.silu(h)
        return nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    z_ch: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.ch, self.ch_mult, self.z_ch,
                               dtype=self.dtype)
        self.decoder = Decoder(self.ch, self.ch_mult, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.z_ch, (1, 1), dtype=self.dtype,
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.z_ch, (1, 1), dtype=self.dtype,
                                       name="post_quant_conv")

    def encode_moments(self, x_nchw):
        """x in [-1,1], NCHW -> (mean, logvar) each (B, z, H/8, W/8)."""
        h = self.encoder(jnp.transpose(x_nchw, (0, 2, 3, 1)))
        moments = self.quant_conv(h)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        to_nchw = lambda a: jnp.transpose(a, (0, 3, 1, 2))
        return to_nchw(mean), to_nchw(jnp.clip(logvar, -30.0, 20.0))

    def encode(self, x_nchw, rng):
        """Sample from the latent posterior, scaled by 0.18215 like the
        reference's `.latent_dist.sample().mul_(0.18215)`."""
        mean, logvar = self.encode_moments(x_nchw)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return z * SD_SCALE_FACTOR

    def decode(self, z_nchw):
        """z is the SCALED latent; returns images in [-1,1], NCHW."""
        z = z_nchw / SD_SCALE_FACTOR
        z = jnp.transpose(z, (0, 2, 3, 1))
        z = self.post_quant_conv(z)
        img = self.decoder(z)
        return jnp.transpose(img, (0, 3, 1, 2))

    def __call__(self, x_nchw, rng):
        z = self.encode(x_nchw, rng)
        return self.decode(z)


# ---------------------------------------------------------------------------
# diffusers state-dict conversion
# ---------------------------------------------------------------------------


def _conv_w(arr):
    """torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.transpose(arr, (2, 3, 1, 0))


def convert_diffusers_vae(sd) -> dict:
    """Map a diffusers AutoencoderKL state dict to this module's params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    out: dict = {"encoder": {}, "decoder": {}}

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(val)

    def conv(dst_tree, dst, src):
        put(dst_tree, dst + ("kernel",), _conv_w(sd[src + ".weight"]))
        put(dst_tree, dst + ("bias",), sd[src + ".bias"])

    def norm(dst_tree, dst, src):
        put(dst_tree, dst + ("scale",), sd[src + ".weight"])
        put(dst_tree, dst + ("bias",), sd[src + ".bias"])

    def resnet(dst_tree, dst, src):
        norm(dst_tree, dst + ("norm1",), src + ".norm1")
        conv(dst_tree, dst + ("conv1",), src + ".conv1")
        norm(dst_tree, dst + ("norm2",), src + ".norm2")
        conv(dst_tree, dst + ("conv2",), src + ".conv2")
        if src + ".conv_shortcut.weight" in sd:
            conv(dst_tree, dst + ("conv_shortcut",), src + ".conv_shortcut")

    def attn(dst_tree, dst, src):
        norm(dst_tree, dst + ("group_norm",), src + ".group_norm")
        for name, tsrc in (("to_q", "to_q"), ("to_k", "to_k"),
                           ("to_v", "to_v"), ("to_out", "to_out.0")):
            w = sd[f"{src}.{tsrc}.weight"]
            if w.ndim == 4:  # older checkpoints use 1x1 convs
                w = w[:, :, 0, 0]
            put(dst_tree, dst + (name, "kernel"), w.T)
            put(dst_tree, dst + (name, "bias"), sd[f"{src}.{tsrc}.bias"])

    enc, dec = out["encoder"], out["decoder"]
    conv(enc, ("conv_in",), "encoder.conv_in")
    for i in range(4):
        for j in range(2):
            resnet(enc, (f"down_{i}_res_{j}",),
                   f"encoder.down_blocks.{i}.resnets.{j}")
        if i < 3:
            conv(enc, (f"down_{i}_ds", "conv"),
                 f"encoder.down_blocks.{i}.downsamplers.0.conv")
    resnet(enc, ("mid_res_0",), "encoder.mid_block.resnets.0")
    attn(enc, ("mid_attn",), "encoder.mid_block.attentions.0")
    resnet(enc, ("mid_res_1",), "encoder.mid_block.resnets.1")
    norm(enc, ("conv_norm_out",), "encoder.conv_norm_out")
    conv(enc, ("conv_out",), "encoder.conv_out")

    conv(dec, ("conv_in",), "decoder.conv_in")
    resnet(dec, ("mid_res_0",), "decoder.mid_block.resnets.0")
    attn(dec, ("mid_attn",), "decoder.mid_block.attentions.0")
    resnet(dec, ("mid_res_1",), "decoder.mid_block.resnets.1")
    for i in range(4):
        for j in range(3):
            resnet(dec, (f"up_{i}_res_{j}",),
                   f"decoder.up_blocks.{i}.resnets.{j}")
        if i < 3:
            conv(dec, (f"up_{i}_us", "conv"),
                 f"decoder.up_blocks.{i}.upsamplers.0.conv")
    norm(dec, ("conv_norm_out",), "decoder.conv_norm_out")
    conv(dec, ("conv_out",), "decoder.conv_out")

    conv(out, ("quant_conv",), "quant_conv")
    conv(out, ("post_quant_conv",), "post_quant_conv")
    return out


def load_vae(path: str):
    """Load diffusers VAE weights from a local .bin/.pt/.safetensors file.
    Returns (module, params).

    `path="random"` (or "random:<seed>") returns the same architecture with
    seeded random weights -- a fixed, deterministic latent<->pixel mapping
    for exercising the full train/sample/FID pipelines in this zero-egress
    environment (no SD-VAE weights downloadable); drop in the real
    diffusers file to reproduce reference pixels."""
    if path == "random" or path.startswith("random:"):
        import jax
        import jax.numpy as jnp

        seed = int(path.split(":", 1)[1]) if ":" in path else 0
        module = AutoencoderKL()
        x = jnp.zeros((1, 3, 64, 64), jnp.float32)
        params = jax.jit(module.init)(jax.random.PRNGKey(seed), x,
                                      jax.random.PRNGKey(seed + 1))
        return module, params
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = {k: v.float().numpy() for k, v in
              torch.load(path, map_location="cpu", weights_only=False).items()}
    module = AutoencoderKL()
    return module, {"params": convert_diffusers_vae(sd)}
