"""Input pipelines: dataset dispatch + threaded device-feeding loader.

Reference: `/root/reference/dimsum/datasets_prep/__init__.py:10-135`
(get_dataset dispatch over cifar10 / imagenet / latent_* / lsun / celeba).
"""

from __future__ import annotations

from dimsum_tpu.data.datasets import (  # noqa: F401
    Dataset,
    ImageFolderDataset,
    LMDBDataset,
    LatentFolderDataset,
    LatentMemmapDataset,
    center_crop_arr,
)
from dimsum_tpu.data.loader import Loader, device_put_sharded_batch  # noqa: F401


def get_dataset(args):
    """Dispatch mirroring the reference CLI contract (--dataset)."""
    name = args.dataset
    image_size = getattr(args, "image_size", 256)
    datadir = args.datadir
    if name in ("latent_memmap_imagenet", "latent_memmap"):
        import os

        feats = os.path.join(datadir, "latents.dat")
        labels = os.path.join(datadir, "labels.dat")
        labels = labels if os.path.exists(labels) else None
        latent = image_size // 8
        return LatentMemmapDataset(
            feats, labels,
            latent_shape=(getattr(args, "num_in_channels", 4), latent,
                          latent))
    if name.startswith("latent_"):
        import os

        labels_dir = os.path.join(datadir, "labels")
        return LatentFolderDataset(
            os.path.join(datadir, "features"),
            labels_dir if os.path.isdir(labels_dir) else None)
    if name in ("celeba_256", "celeba_512", "lsun_church"):
        return LMDBDataset(datadir, name, image_size=image_size)
    if name in ("imagenet", "ffhq", "image_folder", "cifar10"):
        return ImageFolderDataset(datadir, image_size=image_size,
                                  use_labels=(name == "imagenet"))
    raise ValueError(f"unknown dataset {name}")
