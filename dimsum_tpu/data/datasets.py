"""Datasets: latent memmaps, per-file latents, image folders, LMDB.

Reference: `/root/reference/dimsum/datasets_prep/` (dispatch `__init__.py:10`,
`latent_datasets.py`, `lmdb_datasets.py`, center-crop `data_transforms.py`)
and the StyleGAN-ADA `ImageFolderDataset` used by the eval toolbox.

Pure numpy/PIL (no torch DataLoader): batches are assembled on host and
fed to the device by `dimsum_tpu.data.loader.Loader`, which overlaps host
IO with device compute -- the TPU-native replacement for torch's
multiprocess DataLoader.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

IMAGENET_N = 1281167


class Dataset:
    """Minimal map-style dataset protocol: __len__ + __getitem__ ->
    (sample ndarray, label int)."""

    def __len__(self):  # pragma: no cover - interface
        raise NotImplementedError

    def __getitem__(self, idx):  # pragma: no cover - interface
        raise NotImplementedError


class LatentMemmapDataset(Dataset):
    """One shared memmap of precomputed VAE latents (orig + hflip copies),
    shape (2N, 4, 32, 32) fp32 (reference latent_datasets.py:31-51)."""

    def __init__(self, features_path: str, labels_path: Optional[str] = None,
                 num_samples: Optional[int] = None,
                 latent_shape: Tuple[int, int, int] = (4, 32, 32),
                 use_native: bool = True):
        if num_samples is None:  # infer from file size
            item_bytes = 4 * int(np.prod(latent_shape))
            num_samples = os.path.getsize(features_path) // item_bytes
        self.features = np.memmap(features_path, dtype=np.float32, mode="r",
                                  shape=(num_samples, *latent_shape))
        self._native = None
        if use_native:
            try:
                from dimsum_tpu.data.native import NativeLatentStore

                store = NativeLatentStore(features_path, latent_shape)
                if store.is_native:
                    self._native = store
            except Exception:
                self._native = None
        self.labels = None
        if labels_path:
            self.labels = np.memmap(labels_path, dtype=np.int64, mode="r",
                                    shape=(num_samples,))
        self.num_samples = num_samples

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        x = np.asarray(self.features[idx], np.float32)
        y = int(self.labels[idx]) if self.labels is not None else 0
        return x, y

    def gather(self, indices):
        """Whole-batch fast path (native C++ threaded gather when built)."""
        if self._native is not None:
            xs = self._native.gather(indices)
        else:
            xs = np.asarray(self.features[np.asarray(indices)], np.float32)
        if self.labels is not None:
            ys = np.asarray(self.labels[np.asarray(indices)], np.int64)
        else:
            ys = np.zeros(len(indices), np.int64)
        return xs, ys


class LatentFolderDataset(Dataset):
    """Per-file .npy latents named 000000000.npy
    (reference latent_datasets.py:54-73)."""

    def __init__(self, features_dir: str, labels_dir: Optional[str] = None,
                 num_samples: Optional[int] = None):
        self.features_dir = features_dir
        self.labels_dir = labels_dir
        if num_samples is None:
            num_samples = len([f for f in os.listdir(features_dir)
                               if f.endswith(".npy")])
        self.num_samples = num_samples

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        fid = f"{str(idx).zfill(9)}.npy"
        x = np.load(os.path.join(self.features_dir, fid)).astype(np.float32)
        if self.labels_dir is not None:
            y = int(np.load(os.path.join(self.labels_dir, fid)))
        else:
            y = 0
        return x, y


def center_crop_arr(pil_image, image_size: int):
    """ADM-style center crop (reference data_transforms.py / train utils):
    iterative 2x box downsample then bicubic to the target scale."""
    from PIL import Image

    while min(*pil_image.size) >= 2 * image_size:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX)
    scale = image_size / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size),
        resample=Image.BICUBIC)
    arr = np.array(pil_image)
    crop_y = (arr.shape[0] - image_size) // 2
    crop_x = (arr.shape[1] - image_size) // 2
    return arr[crop_y: crop_y + image_size, crop_x: crop_x + image_size]


class ImageFolderDataset(Dataset):
    """Images from a directory tree OR a .zip archive (the eval toolbox's
    two source kinds, reference training/dataset.py:150-199).

    Labels come from a `dataset.json` manifest when present
    ({"labels": [[relative_fname, int], ...]}, the StyleGAN-ADA convention
    written by tools/dataset_tools.py), else from first-level subfolder
    names (sorted) when `use_labels`.  Outputs CHW float32 in [-1, 1],
    optional hflip doubling (the eval toolbox's xflip convention)."""

    EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")

    def __init__(self, root: str, image_size: int = 256,
                 use_labels: bool = False, xflip: bool = False,
                 raw_uint8: bool = False):
        self.root = root
        self.image_size = image_size
        self.xflip = xflip
        self.raw_uint8 = raw_uint8
        self._is_zip = os.path.isfile(root) and root.lower().endswith(".zip")
        self._zf = None
        manifest = None
        if self._is_zip:
            import json
            import zipfile

            with zipfile.ZipFile(root) as zf:
                names = sorted(zf.namelist())
                if "dataset.json" in names:
                    manifest = json.loads(
                        zf.read("dataset.json"))["labels"]
            files = [n for n in names
                     if n.lower().endswith(self.EXTS)]
        else:
            mpath = os.path.join(root, "dataset.json")
            if os.path.isfile(mpath):
                import json

                with open(mpath) as f:
                    manifest = json.load(f)["labels"]
            files = []
            for dirpath, _, names in sorted(os.walk(root)):
                for n in sorted(names):
                    if n.lower().endswith(self.EXTS):
                        files.append(os.path.join(dirpath, n))
        if not files:
            raise FileNotFoundError(f"no images under {root}")
        self.files = files
        self.labels = None
        if manifest is not None:
            lut = {k.replace("\\", "/"): int(v) for k, v in manifest}

            def rel(f):
                return (f if self._is_zip
                        else os.path.relpath(f, root)).replace(os.sep, "/")

            self.labels = [lut.get(rel(f), 0) for f in files]
        elif use_labels and not self._is_zip:
            classes = sorted({os.path.relpath(f, root).split(os.sep)[0]
                              for f in files})
            cls_idx = {c: i for i, c in enumerate(classes)}
            self.labels = [
                cls_idx[os.path.relpath(f, root).split(os.sep)[0]]
                for f in files]

    def _open(self, fname):
        from io import BytesIO

        from PIL import Image

        if self._is_zip:
            import zipfile

            if self._zf is None:  # lazily per worker/process
                self._zf = zipfile.ZipFile(self.root)
            return Image.open(BytesIO(self._zf.read(fname)))
        return Image.open(fname)

    def __getstate__(self):  # zip handles don't pickle across workers
        d = dict(self.__dict__)
        d["_zf"] = None
        return d

    def __len__(self):
        return len(self.files) * (2 if self.xflip else 1)

    def __getitem__(self, idx):
        base = len(self.files)
        flip = idx >= base
        fidx = idx - base if flip else idx
        with self._open(self.files[fidx]) as im:
            im = im.convert("RGB")
            arr = center_crop_arr(im, self.image_size)
        if flip:
            arr = arr[:, ::-1]
        y = self.labels[fidx] if self.labels is not None else 0
        if self.raw_uint8:
            return np.ascontiguousarray(arr.transpose(2, 0, 1)), y
        x = arr.astype(np.float32) / 127.5 - 1.0
        return np.ascontiguousarray(x.transpose(2, 0, 1)), y


class LMDBDataset(Dataset):
    """NVAE-style LMDB of raw images (reference lmdb_datasets.py).  Requires
    the `lmdb` package (not bundled in this image); gated import."""

    SIZES = {"celeba_256": 30000, "celeba_512": 30000,
             "lsun_church": 126227}

    def __init__(self, root: str, name: str, image_size: int = 256,
                 train: bool = True):
        try:
            import lmdb  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "LMDBDataset requires the 'lmdb' package") from e
        import lmdb

        path = os.path.join(root, "train.lmdb" if train else
                            "validation.lmdb")
        self.env = lmdb.open(path, readonly=True, lock=False)
        self.image_size = image_size
        self.num = self.SIZES.get(name, 0)

    def __len__(self):
        return self.num

    def __getitem__(self, idx):
        import io
        from PIL import Image

        with self.env.begin(write=False) as txn:
            data = txn.get(str(idx).encode())
        im = Image.open(io.BytesIO(data)).convert("RGB")
        arr = center_crop_arr(im, self.image_size).astype(np.float32)
        x = arr / 127.5 - 1.0
        return np.ascontiguousarray(x.transpose(2, 0, 1)), 0
