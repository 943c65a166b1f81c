"""Synthesize a class-conditional latent-memmap dataset (+ optional decoded
"real" reference images) for end-to-end train/FID pipeline runs in
environments without ImageNet or SD-VAE weights.

Latents: per-class smooth random pattern + per-sample low-frequency jitter +
noise, scaled to the SD latent statistics (std ~1 after the 0.18215 scale).
Format matches preprocess.py / LatentMemmapDataset: latents.dat
(N, C, H, W) fp32 memmap + labels.dat (N,) int64.

Usage:
  python tools/make_synthetic_latents.py --out /tmp/synth --n 4096 \
      --classes 8 --image-size 256 [--decode-real random --n-real 512]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def smooth_noise(rng, shape, up):
    """Low-frequency noise: small grid upsampled bilinearly."""
    c, h, w = shape
    small = rng.standard_normal((c, max(h // up, 1), max(w // up, 1)))
    # bilinear upsample via np (no scipy): repeat then box-blur twice
    big = small.repeat(up, axis=1).repeat(up, axis=2)[:, :h, :w]
    k = np.ones(up, np.float32) / up
    for ax in (1, 2):
        big = np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="same"), ax, big)
    return big


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--channels", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--decode-real", type=str, default=None,
                    help="VAE spec (e.g. 'random') to decode the first "
                         "--n-real latents into PNGs under <out>/real_png")
    ap.add_argument("--n-real", type=int, default=512)
    args = ap.parse_args()

    latent = args.image_size // 8
    shape = (args.channels, latent, latent)
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    patterns = np.stack([smooth_noise(rng, shape, up=8)
                         for _ in range(args.classes)]).astype(np.float32)
    patterns *= 1.2 / (np.abs(patterns).mean() + 1e-8) * 0.5

    feats = np.memmap(os.path.join(args.out, "latents.dat"), np.float32,
                      mode="w+", shape=(args.n, *shape))
    labels = np.memmap(os.path.join(args.out, "labels.dat"), np.int64,
                       mode="w+", shape=(args.n,))
    for i in range(args.n):
        y = int(rng.integers(args.classes))
        jit = smooth_noise(rng, shape, up=4).astype(np.float32) * 0.45
        eps = rng.standard_normal(shape).astype(np.float32) * 0.25
        feats[i] = patterns[y] + jit + eps
        labels[i] = y
    feats.flush(); labels.flush()
    print(f"wrote {args.n} latents {shape} + labels to {args.out}")

    if args.decode_real:
        import jax
        import numpy as onp
        from PIL import Image

        from dimsum_tpu.models.vae import load_vae

        vae, vae_params = load_vae(args.decode_real)
        decode = jax.jit(lambda z: vae.apply(vae_params, z,
                                             method=vae.decode))
        outdir = os.path.join(args.out, "real_png")
        os.makedirs(outdir, exist_ok=True)
        bs = 16
        n = min(args.n_real, args.n)
        for i in range(0, n, bs):
            z = onp.asarray(feats[i:i + bs], onp.float32)
            imgs = onp.asarray(decode(z))
            imgs = onp.clip((imgs + 1) * 127.5, 0, 255).astype(onp.uint8)
            for j, im in enumerate(imgs):
                Image.fromarray(im.transpose(1, 2, 0)).save(
                    os.path.join(outdir, f"{i + j:06d}.png"))
        print(f"decoded {n} reference images to {outdir}")


if __name__ == "__main__":
    main()
