"""Dataset converter: {image folder, zip, LMDB, CIFAR-10 tarball} ->
{folder, zip} with optional center-crop transforms and a `dataset.json`
labels manifest.

Equivalent of `/root/reference/eval_toolbox/dataset_tools.py` (517 LoC,
click CLI): same source kinds, same output layout
(`{idx//1000:05d}/img{idx:08d}.png` + {"labels": [[fname, int], ...]}),
same `center-crop` / `center-crop-wide` transform semantics
(dataset_tools.py:254-307).  Rewritten as argparse over this repo's data
layer.

Usage:
    python tools/dataset_tools.py --source imgs/ --dest data.zip \
        --transform center-crop --width 256 --height 256
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import zipfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


# ---------------------------------------------------------------------------
# sources: yield (numpy HWC uint8 image, label or None)
# ---------------------------------------------------------------------------


def open_image_folder(source, max_images=None):
    from PIL import Image

    files = []
    for dirpath, _, names in sorted(os.walk(source)):
        for n in sorted(names):
            if n.lower().endswith(IMG_EXTS):
                files.append(os.path.join(dirpath, n))
    manifest = None
    mpath = os.path.join(source, "dataset.json")
    if os.path.isfile(mpath):
        with open(mpath) as f:
            manifest = {k.replace("\\", "/"): int(v)
                        for k, v in json.load(f)["labels"]}
    classes = sorted({os.path.relpath(f, source).split(os.sep)[0]
                      for f in files})
    cls_idx = {c: i for i, c in enumerate(classes)}
    n = len(files) if max_images is None else min(len(files), max_images)

    def gen():
        for f in files[:n]:
            rel = os.path.relpath(f, source).replace(os.sep, "/")
            if manifest is not None:
                label = manifest.get(rel)
            elif len(classes) > 1:
                label = cls_idx[rel.split("/")[0]]
            else:
                label = None
            with Image.open(f) as im:
                yield np.asarray(im.convert("RGB")), label

    return n, gen()


def open_image_zip(source, max_images=None):
    from PIL import Image

    zf = zipfile.ZipFile(source)
    names = sorted(n for n in zf.namelist()
                   if n.lower().endswith(IMG_EXTS))
    manifest = None
    if "dataset.json" in zf.namelist():
        manifest = {k.replace("\\", "/"): int(v)
                    for k, v in json.loads(zf.read("dataset.json"))["labels"]}
    n = len(names) if max_images is None else min(len(names), max_images)

    def gen():
        for name in names[:n]:
            label = manifest.get(name) if manifest else None
            with Image.open(io.BytesIO(zf.read(name))) as im:
                yield np.asarray(im.convert("RGB")), label

    return n, gen()


def open_lmdb(source, max_images=None):
    """NVAE-style LMDB (reference lmdb_datasets.py / dataset_tools.py:125)."""
    import lmdb  # gated: not in the base image
    from PIL import Image

    env = lmdb.open(source, readonly=True, lock=False)
    with env.begin() as txn:
        total = txn.stat()["entries"]
    n = total if max_images is None else min(total, max_images)

    def gen():
        with env.begin() as txn:
            cur = txn.cursor()
            k = 0
            for _key, val in cur:
                if k >= n:
                    break
                try:
                    with Image.open(io.BytesIO(val)) as im:
                        yield np.asarray(im.convert("RGB")), None
                    k += 1
                except Exception:
                    continue

    return n, gen()


def open_cifar10(tarball, max_images=None):
    """CIFAR-10 python tarball -> 50k train images + labels
    (reference dataset_tools.py:155-186)."""
    import pickle
    import tarfile

    images, labels = [], []
    with tarfile.open(tarball) as tf:
        for batch in range(1, 6):
            member = tf.extractfile(
                f"cifar-10-batches-py/data_batch_{batch}")
            data = pickle.load(member, encoding="latin1")
            images.append(
                np.asarray(data["data"]).reshape(-1, 3, 32, 32))
            labels.append(data["labels"])
    images = np.concatenate(images).transpose(0, 2, 3, 1)  # NHWC
    labels = np.concatenate(labels)
    n = len(images) if max_images is None else min(len(images), max_images)

    def gen():
        for i in range(n):
            yield images[i], int(labels[i])

    return n, gen()


def open_dataset(source, max_images=None):
    if os.path.isdir(source):
        if os.path.isfile(os.path.join(source, "data.mdb")):
            return open_lmdb(source, max_images)
        return open_image_folder(source, max_images)
    ext = os.path.splitext(source)[1].lower()
    if ext == ".zip":
        return open_image_zip(source, max_images)
    if source.endswith((".tar.gz", ".tgz")):
        return open_cifar10(source, max_images)
    raise ValueError(f"unrecognized source: {source}")


# ---------------------------------------------------------------------------
# transforms (reference dataset_tools.py:254-307 semantics)
# ---------------------------------------------------------------------------


def make_transform(transform, width, height):
    from PIL import Image

    def scale(img):
        if width is None or height is None:
            return img
        im = Image.fromarray(img)
        return np.asarray(im.resize((width, height), Image.LANCZOS))

    def center_crop(img):
        crop = min(img.shape[0], img.shape[1])
        img = img[(img.shape[0] - crop) // 2:(img.shape[0] + crop) // 2,
                  (img.shape[1] - crop) // 2:(img.shape[1] + crop) // 2]
        im = Image.fromarray(img, "RGB")
        return np.asarray(im.resize((width, height), Image.LANCZOS))

    def center_crop_wide(img):
        ch = int(round(width * img.shape[0] / img.shape[1]))
        if img.shape[1] < width or ch < height:
            return None
        im = Image.fromarray(img, "RGB").resize((width, ch), Image.LANCZOS)
        img = np.asarray(im)
        img = img[(img.shape[0] - height) // 2:
                  (img.shape[0] + height) // 2]
        # canvas-pad top/bottom like the reference (gray border)
        canvas = np.zeros([width, width, 3], dtype=np.uint8)
        canvas[(width - height) // 2:(width + height) // 2, :] = img
        return canvas

    if transform is None:
        return scale
    if transform == "center-crop":
        if width is None or height is None:
            raise SystemExit("center-crop requires --width/--height")
        return center_crop
    if transform == "center-crop-wide":
        if width is None or height is None:
            raise SystemExit("center-crop-wide requires --width/--height")
        return center_crop_wide
    raise ValueError(f"unknown transform {transform}")


# ---------------------------------------------------------------------------
# destinations
# ---------------------------------------------------------------------------


def open_dest(dest):
    if dest.lower().endswith(".zip"):
        os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
        zf = zipfile.ZipFile(dest, "w", compression=zipfile.ZIP_STORED)

        def write(fname, data):
            zf.writestr(fname, data)

        return write, zf.close
    os.makedirs(dest, exist_ok=True)
    if os.listdir(dest):
        raise SystemExit(f"--dest folder {dest} must be empty")

    def write(fname, data):
        path = os.path.join(dest, fname)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(path, mode) as f:
            f.write(data)

    return write, lambda: None


def convert_dataset(source, dest, max_images=None, transform=None,
                    width=None, height=None):
    from PIL import Image

    n, images = open_dataset(source, max_images)
    tfm = make_transform(transform, width, height)
    write, close = open_dest(dest)
    labels = []
    idx = 0
    for img, label in images:
        img = tfm(img)
        if img is None:
            continue
        fname = f"{idx // 1000:05d}/img{idx:08d}.png"
        buf = io.BytesIO()
        Image.fromarray(img, "RGB").save(buf, format="png", compress_level=0,
                                         optimize=False)
        write(fname, buf.getvalue())
        labels.append([fname, label] if label is not None else None)
        idx += 1
    meta = {"labels": labels if all(l is not None for l in labels) and labels
            else []}
    write("dataset.json", json.dumps(meta))
    close()
    return idx


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True)
    p.add_argument("--dest", required=True)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--transform",
                   choices=["center-crop", "center-crop-wide"], default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    a = p.parse_args(argv)
    n = convert_dataset(a.source, a.dest, a.max_images, a.transform,
                        a.width, a.height)
    print(f"wrote {n} images to {a.dest}")


if __name__ == "__main__":
    main()
