"""Input pipeline: parallel host decode -> device-side augmentation ->
double-buffered feed.

Replaces the reference's torch DataLoader + CPU-side timm transforms
(reference search.py:462-476, datasets.py:127-163). Host workers only
decode/resize to a fixed staging size (uint8); RandomResizedCrop, flip,
RandAugment/color-jitter, normalize and RandomErasing run jitted on device
(ofb_tpu/ops/augment.py). A one-deep prefetch overlaps host decode with
device compute (the TPU-side analog of pin_memory + non_blocking H2D,
reference engine.py:97-98).
"""

from __future__ import annotations

import collections
import os
from typing import Iterator, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.augment import eval_preprocess_batch, train_augment_batch
from .samplers import distributed_indices, epoch_batches, ra_indices


class HostLoader:
    """Iterates (uint8 images (B,S,S,3), labels (B,)) for one epoch's index
    plan, with optional torch-DataLoader worker parallelism for decode."""

    def __init__(self, dataset, batch_indices: np.ndarray,
                 num_workers: int = 0):
        self.dataset = dataset
        self.batch_indices = batch_indices
        self.num_workers = num_workers

    def __len__(self):
        return len(self.batch_indices)

    def __iter__(self):
        if self.num_workers > 0:
            yield from self._iter_workers()
        else:
            for batch in self.batch_indices:
                out = self._native_batch(batch)
                if out is not None:
                    yield out
                    continue
                imgs, lbls = zip(*(self.dataset[int(i)] for i in batch))
                yield np.stack(imgs), np.asarray(lbls, np.int32)

    def _native_batch(self, batch):
        """Whole-batch JPEG staging through the native thread pool
        (native/ofb_dataprep.cpp) when the dataset exposes file samples —
        one C call decodes the batch across all host cores."""
        ds = self.dataset
        if not (hasattr(ds, "samples") and hasattr(ds, "staging")):
            return None
        from .native import native_available, stage_jpeg_batch
        if not native_available():
            return None
        pairs = [ds.samples[int(i)] for i in batch]
        if not all(p.lower().endswith((".jpg", ".jpeg")) for p, _ in pairs):
            return None
        datas = []
        for p, _ in pairs:
            with open(p, "rb") as f:
                datas.append(f.read())
        nthreads = os.cpu_count() or 4
        imgs = stage_jpeg_batch(datas, ds.staging, nthreads=nthreads)
        if imgs is None:
            return None
        return imgs, np.asarray([t for _, t in pairs], np.int32)

    def _iter_workers(self):
        import torch
        from torch.utils.data import DataLoader, Dataset

        ds = self.dataset
        flat = self.batch_indices.reshape(-1)

        class _View(Dataset):
            def __len__(self):
                return len(flat)

            def __getitem__(self, i):
                img, lbl = ds[int(flat[i])]
                return torch.from_numpy(np.ascontiguousarray(img)), lbl

        bs = self.batch_indices.shape[1]
        dl = DataLoader(_View(), batch_size=bs, shuffle=False,
                        num_workers=self.num_workers, drop_last=False)
        for imgs, lbls in dl:
            yield imgs.numpy(), lbls.numpy().astype(np.int32)


def make_epoch_loader(dataset, *, epoch: int, rank: int, world: int,
                      batch_size: int, repeated_aug: bool = True,
                      train: bool = True, seed: int = 0,
                      num_workers: int = 0) -> HostLoader:
    n = len(dataset)
    if train and repeated_aug:
        idx = ra_indices(n, epoch, rank, world, seed=seed)
    else:
        idx = distributed_indices(n, epoch, rank, world, shuffle=train,
                                  seed=seed)
    batches = epoch_batches(idx, batch_size, drop_last=train)
    return HostLoader(dataset, batches, num_workers=num_workers)


def _shard_batch(x, y, accum_iter, batch_sharding):
    """Common tail of every feed: accum-split the macro batch and place it
    on the mesh (single- and multi-process)."""
    B = x.shape[0]
    mb = B // accum_iter
    x = x[: mb * accum_iter].reshape(accum_iter, mb, *x.shape[1:])
    y = jnp.asarray(y[: mb * accum_iter]).reshape(accum_iter, mb)
    if batch_sharding is not None:
        if len(batch_sharding.device_set) > \
                len(batch_sharding.addressable_devices):
            # multi-process mesh: this process's loader yields its
            # RANK SHARD of the global batch (rank-sharded indices)
            # — assemble the global array from per-process shards.
            # device_put would instead assert all processes hold
            # the same (global) value.
            x = jax.make_array_from_process_local_data(
                batch_sharding, np.asarray(x))
            y = jax.make_array_from_process_local_data(
                batch_sharding, np.asarray(y))
        else:
            x = jax.device_put(x, batch_sharding)
            y = jax.device_put(y, batch_sharding)
    return x, y


def _prefetched(it, prefetch: int):
    """Run `it` `prefetch` items ahead so host decode / index planning
    overlaps device compute (the pin_memory+non_blocking analog)."""
    buf = collections.deque()
    try:
        for _ in range(prefetch):
            buf.append(next(it))
    except StopIteration:
        pass
    while buf:
        nxt = None
        try:
            nxt = next(it)
        except StopIteration:
            pass
        yield buf.popleft()
        if nxt is not None:
            buf.append(nxt)


def device_feed(loader: HostLoader, *, rng: jax.Array, train: bool,
                accum_iter: int = 1, out_size: int = 224,
                use_randaug: bool = True, re_prob: float = 0.25,
                crop_scale=(0.08, 1.0), hflip: bool = True,
                batch_sharding=None, prefetch: int = 2, raw: bool = False
                ) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Yields device-resident (images (A, mb, H, W, 3) float32, labels
    (A, mb)) with augmentation already applied, `prefetch` batches ahead.

    raw=True skips the augment dispatch and yields uint8 staging batches —
    for steps built with fused_augment=True, where the transform runs
    inside the train-step program."""

    def produce():
        nonlocal rng
        for imgs_u8, lbls in loader:
            rng, sub = jax.random.split(rng)
            x = jnp.asarray(imgs_u8)
            if raw:
                pass
            elif train:
                x = train_augment_batch(sub, x, out_size=out_size,
                                        use_randaug=use_randaug,
                                        re_prob=re_prob,
                                        crop_scale=crop_scale, hflip=hflip)
            else:
                x = eval_preprocess_batch(x, out_size=out_size)
            yield _shard_batch(x, lbls, accum_iter, batch_sharding)

    yield from _prefetched(produce(), prefetch)


def build_device_cache(dataset, *, chunk: int = 1024,
                       max_bytes: int = 12 << 30):
    """Decode the WHOLE dataset once at staging resolution and park it in
    device HBM as a single uint8 array.

    On a relay-attached host the per-epoch staging upload (48 MB/s here) is
    the sustained-throughput ceiling (BENCH.md "Sustained epoch"); caching
    the decoded uint8 staging set on device pays that upload exactly once
    and every later epoch gathers batches at HBM bandwidth instead. The
    reference keeps its dataset on disk behind a torch DataLoader every
    epoch (reference datasets.py:90-124) — a device-resident cache is the
    TPU-native answer for datasets that fit (e.g. 20k images @256px staging
    = 3.9 GB of a 16 GB v5e).

    Returns (cache: uint8 (N,S,S,3) on the default device, labels: np.int32
    (N,)). Raises ValueError if the decoded set exceeds `max_bytes`.
    """
    n = len(dataset)
    s = int(dataset.staging)
    nbytes = n * s * s * 3
    if nbytes > max_bytes:
        raise ValueError(
            f"device cache would need {nbytes / 2**30:.1f} GiB "
            f"(> {max_bytes / 2**30:.1f} GiB cap); use the host loader")
    host = np.empty((n, s, s, 3), np.uint8)
    labels = np.empty((n,), np.int32)
    chunks = [np.arange(i, min(i + chunk, n)) for i in range(0, n, chunk)]
    loader = HostLoader(dataset, chunks)
    i0 = 0
    for imgs, lbls in loader:
        host[i0:i0 + len(imgs)] = imgs
        labels[i0:i0 + len(imgs)] = lbls
        i0 += len(imgs)
    assert i0 == n
    return jnp.asarray(host), labels


@jax.jit
def _cache_gather(cache, idx):
    return jnp.take(cache, idx, axis=0)


def device_cache_feed(cache, labels: np.ndarray, *, rng: jax.Array,
                      epoch: int, rank: int, world: int, batch_size: int,
                      repeated_aug: bool = True, train: bool = True,
                      seed: int = 0, accum_iter: int = 1,
                      out_size: int = 224, use_randaug: bool = True,
                      re_prob: float = 0.25, crop_scale=(0.08, 1.0),
                      hflip: bool = True, batch_sharding=None,
                      prefetch: int = 2, raw: bool = False
                      ) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray]]:
    """device_feed over a `build_device_cache` array: identical epoch index
    plan (same samplers, same seeds) and identical augment dispatch, but the
    staging batch comes from an on-device gather instead of a host upload.

    Single-process only: the multi-process path assembles global arrays
    from process-local numpy shards, which would force a device->host
    round-trip and defeat the cache (guarded in the CLI).
    """
    n = int(cache.shape[0])
    if train and repeated_aug:
        idx = ra_indices(n, epoch, rank, world, seed=seed)
    else:
        idx = distributed_indices(n, epoch, rank, world, shuffle=train,
                                  seed=seed)
    batches = epoch_batches(idx, batch_size, drop_last=train)

    def produce():
        nonlocal rng
        for b in batches:
            rng, sub = jax.random.split(rng)
            x = _cache_gather(cache, jnp.asarray(b))
            if raw:
                pass
            elif train:
                x = train_augment_batch(sub, x, out_size=out_size,
                                        use_randaug=use_randaug,
                                        re_prob=re_prob,
                                        crop_scale=crop_scale, hflip=hflip)
            else:
                x = eval_preprocess_batch(x, out_size=out_size)
            yield _shard_batch(x, labels[b], accum_iter, batch_sharding)

    yield from _prefetched(produce(), prefetch)
