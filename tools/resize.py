"""Dataset prep: parallel center-crop + LANCZOS resize of an image folder.

Reference: `/root/reference/eval_toolbox/resize.py` (typer CLI, Pool-parallel
LANCZOS center-crop producing the FID reference folders).
"""

from __future__ import annotations

import argparse
import os
from functools import partial
from multiprocessing import Pool


def process_one(args_tuple, size: int, outdir: str, quality: int):
    src, rel = args_tuple
    from PIL import Image

    dst = os.path.join(outdir, os.path.splitext(rel)[0] + ".png")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    try:
        with Image.open(src) as im:
            im = im.convert("RGB")
            w, h = im.size
            crop = min(w, h)
            left, top = (w - crop) // 2, (h - crop) // 2
            im = im.crop((left, top, left + crop, top + crop))
            im = im.resize((size, size), Image.LANCZOS)
            im.save(dst)
        return None
    except Exception as e:  # pragma: no cover
        return f"{src}: {e}"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--indir", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--workers", type=int, default=os.cpu_count())
    p.add_argument("--quality", type=int, default=95)
    args = p.parse_args()

    exts = (".png", ".jpg", ".jpeg", ".bmp", ".webp")
    jobs = []
    for dirpath, _, names in os.walk(args.indir):
        for n in names:
            if n.lower().endswith(exts):
                src = os.path.join(dirpath, n)
                jobs.append((src, os.path.relpath(src, args.indir)))
    print(f"resizing {len(jobs)} images -> {args.outdir}")
    fn = partial(process_one, size=args.size, outdir=args.outdir,
                 quality=args.quality)
    with Pool(args.workers) as pool:
        errors = [e for e in pool.imap_unordered(fn, jobs, chunksize=64)
                  if e is not None]
    if errors:
        print(f"{len(errors)} failures, first: {errors[0]}")
    print("done")


if __name__ == "__main__":
    main()
