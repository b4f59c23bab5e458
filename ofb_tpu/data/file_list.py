"""File-list dataset + forever iterator.

Equivalents of the reference's auxiliary dataset/ package (SURVEY §2 row 18;
reference dataset/data_list.py:28-86 `ImageList`, dataset/data_provider.py:
5-91 `ForeverDataIterator` and file-list loader helpers) so downstream
users of those utilities have a drop-in surface.
"""

from __future__ import annotations

import os
from typing import List, Tuple


def parse_image_list(list_path: str, root: str = ""
                     ) -> List[Tuple[str, int]]:
    """Parse 'path label' lines (reference dataset/data_list.py:9-25)."""
    samples = []
    with open(list_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.rsplit(" ", 1)
            path = parts[0]
            label = int(parts[1]) if len(parts) == 2 else 0
            samples.append((os.path.join(root, path), label))
    return samples


class ImageList:
    """Dataset over an explicit (path, label) list decoding to a fixed
    staging resolution (reference dataset/data_list.py:28-86)."""

    def __init__(self, list_path_or_samples, staging: int = 256,
                 root: str = ""):
        from .datasets import _ResizeU8
        if isinstance(list_path_or_samples, str):
            self.samples = parse_image_list(list_path_or_samples, root)
        else:
            self.samples = list(list_path_or_samples)
        self.tf = _ResizeU8(staging)
        self.classes = sorted({t for _, t in self.samples})

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        from PIL import Image
        path, target = self.samples[i]
        with open(path, "rb") as f:
            arr = self.tf(Image.open(f))
        return arr, target


class ForeverDataIterator:
    """Endlessly re-iterates a loader (reference dataset/data_provider.py:
    75-91), re-shuffling each pass when the underlying factory supports
    epoch seeding."""

    def __init__(self, loader_factory, start_epoch: int = 0):
        """loader_factory(epoch) -> iterable (or a plain iterable)."""
        if callable(loader_factory):
            self.factory = loader_factory
        else:
            self.factory = lambda _epoch: loader_factory
        self.epoch = start_epoch
        self._it = iter(self.factory(self.epoch))

    def __next__(self):
        try:
            return next(self._it)
        except StopIteration:
            self.epoch += 1
            self._it = iter(self.factory(self.epoch))
            return next(self._it)

    def __iter__(self):
        return self
