"""Host input-pipeline throughput at flagship rate (VERDICT r4 item 7).

Builds a >=100k-row synthetic latent memmap (the ImageNet-256 shape:
4x32x32 fp32 latents + int64 labels, reference
`/root/reference/dimsum/datasets_prep/latent_datasets.py:31-51`), then
measures sustained img/s of `data/loader.py::Loader` (shuffle + threaded
prefetch + the native C++ batch gather when built) draining as fast as the
host allows.  The flagship training consumption is 98.9 img/s/chip x 8 =
791 img/s global; a single-host loader must beat the PER-HOST share (and
ideally the global number, since one host may feed several chips).

    python benchmarks/loader_bench.py --rows 131072 --batch 88
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=131072)
    ap.add_argument("--batch", type=int, default=88,
                    help="per-host batch (flagship: 88/chip, accum "
                         "microbatch 11)")
    ap.add_argument("--datadir", type=str, default="/tmp/loader_bench_data")
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--prefetch", type=int, default=4)
    ap.add_argument("--epoch-batches", type=int, default=400,
                    help="batches to drain per timed pass")
    ap.add_argument("--no-native", action="store_true")
    args = ap.parse_args()

    shape = (4, 32, 32)
    os.makedirs(args.datadir, exist_ok=True)
    lat_path = os.path.join(args.datadir, "latents.dat")
    lab_path = os.path.join(args.datadir, "labels.dat")
    nbytes = args.rows * int(np.prod(shape)) * 4
    if (not os.path.exists(lat_path)
            or os.path.getsize(lat_path) != nbytes):
        print(f"writing {args.rows}-row memmap "
              f"({nbytes / 1e9:.1f} GB)...", file=sys.stderr)
        feats = np.memmap(lat_path, np.float32, mode="w+",
                          shape=(args.rows, *shape))
        rng = np.random.default_rng(0)
        step = 8192
        for i in range(0, args.rows, step):
            feats[i: i + step] = rng.standard_normal(
                (min(step, args.rows - i), *shape), np.float32)
        feats.flush()
        labels = np.memmap(lab_path, np.int64, mode="w+",
                           shape=(args.rows,))
        labels[:] = rng.integers(0, 1000, args.rows)
        labels.flush()
        del feats, labels

    from dimsum_tpu.data import get_dataset
    from dimsum_tpu.data.loader import Loader

    class _Args:
        dataset = "latent_memmap"
        datadir = args.datadir
        image_size = 256
        num_classes = 1000

    ds = get_dataset(_Args())
    if args.no_native and getattr(ds, "_native", None) is not None:
        ds._native = None
    native = getattr(ds, "_native", None) is not None
    loader = Loader(ds, args.batch, shuffle=True, num_workers=args.workers,
                    prefetch=args.prefetch)

    # warm pass (page cache, thread spin-up)
    it = iter(loader)
    for _ in range(20):
        next(it)

    for epoch in range(2):
        loader.set_epoch(epoch + 1)
        it = iter(loader)
        n = 0
        t0 = time.perf_counter()
        for _ in range(args.epoch_batches):
            x, y = next(it)
            n += x.shape[0]
        dt = time.perf_counter() - t0
        print(json.dumps({
            "pass": epoch, "native_gather": native,
            "workers": args.workers, "prefetch": args.prefetch,
            "batch": args.batch, "rows": args.rows,
            "img_per_s": round(n / dt, 1),
            "ms_per_batch": round(dt / args.epoch_batches * 1e3, 2),
            "flagship_consumption_img_s_per_chip": 98.9,
            "headroom_vs_8chip_global": round(n / dt / 791.0, 2),
        }))


if __name__ == "__main__":
    main()
