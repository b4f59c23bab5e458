"""Datasets: the reference's build_dataset surface (reference
datasets.py:90-124) with a TPU-friendly host contract.

Every dataset yields `(uint8 HWC staging image, int label)`; all randomized
augmentation runs on device (ofb_tpu/ops/augment.py). Decode + static resize
to the staging resolution is the only host work, parallelized by the loader
(ofb_tpu/data/pipeline.py).

Supported (reference datasets.py:19-124): CIFAR10, CIFAR100, IMNET
(ImageFolder), IMNET100 (first-100-classes subset with an index cache),
INAT/INAT19 (iNaturalist json annotations), plus SYNTHETIC for tests/bench.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Optional, Tuple

import numpy as np

from ..config import DataConfig


class SyntheticDataset:
    """Deterministic random images; index-seeded so results are stable."""

    def __init__(self, size: int, num_classes: int, staging: int):
        self.size = size
        self.num_classes = num_classes
        self.staging = staging

    def __len__(self):
        return self.size

    def __getitem__(self, i):
        rs = np.random.RandomState(i % 65536)
        img = rs.randint(0, 256, (self.staging, self.staging, 3), np.uint8)
        return img, int(i % self.num_classes)


class _ResizeU8:
    """Shorter-side resize + center crop to the staging square, uint8 HWC."""

    def __init__(self, staging: int):
        self.staging = staging

    def __call__(self, pil_img):
        from PIL import Image
        w, h = pil_img.size
        s = self.staging
        if w < h:
            nw, nh = s, max(s, int(round(h * s / w)))
        else:
            nw, nh = max(s, int(round(w * s / h))), s
        img = pil_img.convert("RGB").resize((nw, nh), Image.BICUBIC)
        x0 = (nw - s) // 2
        y0 = (nh - s) // 2
        img = img.crop((x0, y0, x0 + s, y0 + s))
        return np.asarray(img, np.uint8)


class FolderDataset:
    """ImageFolder-style dataset decoding to the staging resolution.

    JPEGs go through the native decode+stage library
    (native/ofb_dataprep.cpp via ofb_tpu/data/native.py) when available;
    everything else falls back to PIL."""

    def __init__(self, root: str, staging: int,
                 class_subset: Optional[list] = None,
                 native_decode: bool = True):
        import torchvision.datasets as tvd
        self.ds = tvd.ImageFolder(root)
        self.tf = _ResizeU8(staging)
        self.staging = staging
        self.native_decode = native_decode
        if class_subset is not None:
            keep = set(class_subset)
            self.samples = [(p, t) for (p, t) in self.ds.samples if t in keep]
            remap = {t: i for i, t in enumerate(sorted(keep))}
            self.samples = [(p, remap[t]) for (p, t) in self.samples]
        else:
            self.samples = self.ds.samples

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        path, target = self.samples[i]
        with open(path, "rb") as f:
            data = f.read()
        if self.native_decode and path.lower().endswith((".jpg", ".jpeg")):
            from .native import stage_jpeg
            arr = stage_jpeg(data, self.staging)
            if arr is not None:
                return arr, target
        import io
        from PIL import Image
        arr = self.tf(Image.open(io.BytesIO(data)))
        return arr, target


class CifarDataset:
    def __init__(self, root: str, train: bool, staging: int, cifar100=False):
        import torchvision.datasets as tvd
        cls = tvd.CIFAR100 if cifar100 else tvd.CIFAR10
        self.ds = cls(root, train=train, download=False)
        self.tf = _ResizeU8(staging)

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        img, target = self.ds[i]
        return self.tf(img), int(target)


class INatDataset:
    """iNaturalist 2018/2019 json-annotation dataset
    (reference datasets.py:19-58)."""

    def __init__(self, root: str, train: bool, staging: int, year: int = 2018,
                 category: str = "name"):
        split = "train" if train else "val"
        with open(os.path.join(root, f"{split}{year}.json")) as f:
            data = json.load(f)
        with open(os.path.join(root, f"categories{year}.json")) as f:
            cats = json.load(f)
        names = sorted({c[category] for c in cats})
        self.name_to_idx = {n: i for i, n in enumerate(names)}
        self.nb_classes = len(names)
        self.samples = []
        ann = {a["image_id"]: a["category_id"] for a in data["annotations"]}
        for img in data["images"]:
            cat = cats[ann[img["id"]]]
            self.samples.append((os.path.join(root, img["file_name"]),
                                 self.name_to_idx[cat[category]]))
        self.tf = _ResizeU8(staging)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        from PIL import Image
        path, target = self.samples[i]
        with open(path, "rb") as f:
            arr = self.tf(Image.open(f))
        return arr, target


def build_dataset(is_train: bool, cfg: DataConfig, staging: int = 256
                  ) -> Tuple[object, int]:
    """(dataset, num_classes) — reference datasets.py:90-124 dispatch."""
    name = cfg.data_set.upper()
    if name == "SYNTHETIC":
        return (SyntheticDataset(cfg.synthetic_size, cfg.synthetic_num_classes,
                                 staging), cfg.synthetic_num_classes)
    if name == "CIFAR10":
        return CifarDataset(cfg.data_path, is_train, staging), 10
    if name == "CIFAR100":
        return CifarDataset(cfg.data_path, is_train, staging,
                            cifar100=True), 100
    if name == "IMNET":
        split = "train" if is_train else "val"
        return FolderDataset(os.path.join(cfg.data_path, split), staging), 1000
    if name == "IMNET100":
        # first-100 classes subset with a cached index
        # (reference datasets.py:61-88)
        split = "train" if is_train else "val"
        root = os.path.join(cfg.data_path, split)
        cache = os.path.join(cfg.data_path, f"imnet100_{split}.pkl")
        if os.path.exists(cache):
            with open(cache, "rb") as f:
                subset = pickle.load(f)
        else:
            import torchvision.datasets as tvd
            classes = sorted(tvd.ImageFolder(root).class_to_idx.values())
            subset = classes[:100]
            try:
                with open(cache, "wb") as f:
                    pickle.dump(subset, f)
            except OSError:
                pass
        return FolderDataset(root, staging, class_subset=subset), 100
    if name in ("INAT", "INAT19"):
        year = 2018 if name == "INAT" else 2019
        ds = INatDataset(cfg.data_path, is_train, staging, year=year)
        return ds, ds.nb_classes
    raise ValueError(f"unknown data_set {cfg.data_set}")
