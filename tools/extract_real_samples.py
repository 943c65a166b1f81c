"""Dump a training dataset to a folder of images (FID reference set).

Equivalent of `/root/reference/eval_toolbox/resize_lmdb.py`: iterate the
dataset with the train-time transform (resize + center-crop) and save each
image as `<save_dir>/<dataset>/<index>.jpg`.  Works for any dataset name
`dimsum_tpu.data.get_dataset` knows (lsun/celeba LMDB, image folders,
latent sets are rejected -- they are not images).

Usage:
    python tools/extract_real_samples.py --dataset celeba_256 \
        --datadir data/celeba --save_dir real_samples --image_size 256
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser("Extract dataset")
    p.add_argument("--dataset", default="cifar10")
    p.add_argument("--datadir", default="./data")
    p.add_argument("--save_dir", default="real_samples/")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--max_images", type=int, default=None,
                   help="cap (reference caps lsun_church at 120k)")
    args = p.parse_args(argv)

    if "latent" in args.dataset:
        raise SystemExit("latent datasets hold VAE codes, not images")

    from PIL import Image

    from dimsum_tpu.data import get_dataset

    ns = argparse.Namespace(dataset=args.dataset, datadir=args.datadir,
                            image_size=args.image_size)
    dataset = get_dataset(ns)
    n = len(dataset)
    if args.dataset == "lsun_church":
        n = min(n, 120_000)  # reference resize_lmdb.py:39 subset
    if args.max_images:
        n = min(n, args.max_images)

    save_dir = os.path.join(args.save_dir, args.dataset)
    os.makedirs(save_dir, exist_ok=True)
    for i in range(n):
        x, _ = dataset[i]
        # CHW [-1, 1] -> HWC uint8
        img = np.clip((np.asarray(x) + 1.0) * 127.5, 0, 255).astype(np.uint8)
        Image.fromarray(img.transpose(1, 2, 0)).save(
            os.path.join(save_dir, f"{i}.jpg"))
        if (i + 1) % 1000 == 0:
            print(f"{i + 1}/{n}")
    print(f"saved {n} images in {save_dir}")


if __name__ == "__main__":
    main()
