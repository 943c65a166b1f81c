"""Standalone metric CLI over two image folders.

Reference: `/root/reference/eval_toolbox/calc_metrics.py` (click CLI spawning
per-GPU ranks :97-210).  Multi-process: launch one process per host with
--num-processes/--process-id/--coordinator (the train.py convention);
feature extraction shards over processes on BOTH sides (contiguous folder
slices), the partial stats allgather (eval/dist_stats.py), and rank 0
computes + reports the metrics -- the reference's per-rank spawning +
feature broadcast without the interleave bookkeeping.
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
    # multi-host rank sharding (reference calc_metrics.py:205-210 spawns
    # one rank per GPU; here one process per host, chips within a host are
    # driven by the detector batch)
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--coordinator", type=str, default="localhost:29514")
    args = p.parse_args()

    from dimsum_tpu.data import ImageFolderDataset
    from dimsum_tpu.eval import (
        calc_metrics_multiprocess, is_valid_metric, list_valid_metrics,
        report_metric,
    )
    from dimsum_tpu.parallel import init_distributed

    for m in args.metrics.split(","):
        if not is_valid_metric(m.strip()):
            raise SystemExit(
                f"unknown metric {m!r}; valid: {list_valid_metrics()}")

    from dimsum_tpu.eval.features import detector_id, make_detector

    init_distributed(args.coordinator, args.num_processes, args.process_id)
    import jax

    rank, world = jax.process_index(), jax.process_count()

    detector = make_detector(args.detector)
    real = ImageFolderDataset(args.real_dir, args.image_size,
                              raw_uint8=True, xflip=args.mirror)
    gen = ImageFolderDataset(args.gen_dir, args.image_size, raw_uint8=True)

    # this process's contiguous slice of the generated folder; slices
    # reassemble in rank order inside combine_feature_stats
    lo, hi = rank * len(gen) // world, (rank + 1) * len(gen) // world

    def gen_batches():
        for i in range(lo, hi, args.batch_size):
            yield np.stack(
                [gen[j][0]
                 for j in range(i, min(i + args.batch_size, hi))])

    results = calc_metrics_multiprocess(
        args.metrics.split(","), real_dataset=real, detector=detector,
        gen_batches=gen_batches, batch_size=args.batch_size,
        cache_dir=args.cache_dir, dataset_id=args.real_dir,
        detector_id=detector_id(args.detector))
    for result in results:
        report_metric(result, run_dir=args.run_dir)
    if world > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("calc_metrics_done")


if __name__ == "__main__":
    main()
