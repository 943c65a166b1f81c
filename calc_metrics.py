"""Standalone metric CLI over two image folders.

Reference: `/root/reference/eval_toolbox/calc_metrics.py` (click CLI spawning
per-GPU ranks :97-210).  Single process here; the detector batches stream
through numpy/torch on host while any TPU work stays in the generator that
produced the folder.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--metrics", type=str, default="fid50k_full",
                   help="comma-separated registered metrics")
    p.add_argument("--real-dir", type=str, required=True)
    p.add_argument("--gen-dir", type=str, required=True)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--detector", type=str, default=None,
                   help='detector spec: TorchScript .pt path (bit-parity, host CPU), "jax:<pth>" = flax InceptionV3 with converted torch weights (runs on TPU), "jax-random" = flax InceptionV3 with random params (relative trends, no weights needed), default random-projection (smoke only)')
    p.add_argument("--cache-dir", type=str, default="stats-cache")
    p.add_argument("--run-dir", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--mirror", action="store_true",
                   help="xflip-double the real dataset (StyleGAN-ADA "
                        "convention for *_full metrics)")
    args = p.parse_args()

    from dimsum_tpu.data import ImageFolderDataset
    from dimsum_tpu.eval import (
        calc_metric, is_valid_metric, list_valid_metrics, report_metric,
    )

    for m in args.metrics.split(","):
        if not is_valid_metric(m.strip()):
            raise SystemExit(
                f"unknown metric {m!r}; valid: {list_valid_metrics()}")

    from dimsum_tpu.eval.features import detector_id, make_detector

    detector = make_detector(args.detector)
    real = ImageFolderDataset(args.real_dir, args.image_size,
                              raw_uint8=True, xflip=args.mirror)
    gen = ImageFolderDataset(args.gen_dir, args.image_size, raw_uint8=True)

    def gen_batches():
        for i in range(0, len(gen), args.batch_size):
            yield np.stack(
                [gen[j][0]
                 for j in range(i, min(i + args.batch_size, len(gen)))])

    for metric in args.metrics.split(","):
        result = calc_metric(
            metric.strip(), real_dataset=real, gen_batches=gen_batches,
            detector=detector, batch_size=args.batch_size,
            cache_dir=args.cache_dir, dataset_id=args.real_dir,
            detector_id=detector_id(args.detector))
        report_metric(result, run_dir=args.run_dir)


if __name__ == "__main__":
    main()
