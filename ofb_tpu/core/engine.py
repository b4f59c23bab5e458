"""Per-epoch loops: search / train / evaluate.

Reference engine.py:18-291 translated to the functional step API. The inner
loop only dispatches jitted steps and (at the compress cadence) runs the
host-side state machine; metric readbacks are deferred to the print cadence
so device execution stays pipelined (the reference instead calls .item()
every iteration, engine.py:146).
"""

from __future__ import annotations

import math
import sys
from typing import Callable, Dict, Iterable, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SearchConfig
from ..models.search_space import SearchSpace
from ..utils.logging import master_print
from ..utils.metrics import MetricLogger
from .compress import compress, update_w_p
from .steps import TrainState


def _smallest_active_patch_ratio(arch, space: SearchSpace) -> float:
    """Non-progressive PMIM keep count: the smallest active patch cell's
    ratio (reference models/vision_transformer.py:593 uses the first active
    entry of the grid)."""
    switch = np.asarray(jax.device_get(arch.patch.switch))
    ratios = [r for r, s in zip(space.patch.ratios, switch) if s]
    return ratios[0] if ratios else 1.0


def search_one_epoch(state: TrainState, step_fn: Callable, feed: Iterable,
                     *, epoch: int, steps_per_epoch: int, scfg: SearchConfig,
                     space: SearchSpace, rng, finish_search: bool,
                     log_every: int = 10, print_fn=master_print
                     ) -> Tuple[TrainState, Dict[str, float], bool, bool]:
    """One search epoch (reference engine.py:75-219).

    Returns (state, stats, finish_search, execute_pruned). The compress
    state machine fires compress_per_epoch times per epoch at accumulation
    boundaries (reference engine.py:201-213).
    """
    import time as _time
    logger = MetricLogger(print_fn=print_fn)
    execute_pruned = False
    A = scfg.accum_iter
    micro_per_epoch = steps_per_epoch * A
    compress_every = max(steps_per_epoch // scfg.compress_per_epoch, 1)
    pending = []          # (step_idx, device metrics) for lazy readback
    t_epoch = _time.time()
    n_images = 0

    def flush():
        # ONE device_get for the whole pending window — float(v) per metric
        # would be a blocking device->host round-trip per scalar (the relay
        # charges ~3-5 ms each; 6 metrics x 10 steps adds up)
        host = jax.device_get([m for _, m in pending])
        for m in host:
            logger.update(**{k: float(v) for k, v in m.items()})
        pending.clear()

    # non-progressive keep ratio changes only at compress events — cache it
    # instead of a per-iteration device readback of the patch switch
    keep_cache = None if scfg.progressive else \
        _smallest_active_patch_ratio(state.arch, space)

    for it, (imgs, lbls) in enumerate(feed):
        frac_epoch = (it * A) / max(micro_per_epoch, 1) + epoch
        if scfg.progressive:
            keep = scfg.max_ratio - (scfg.max_ratio - scfg.min_ratio) * min(
                frac_epoch / max(scfg.schedule.warmup_epochs, 1e-8), 1.0)
        else:
            keep = keep_cache
        state = state.replace(arch=update_w_p(
            state.arch, frac_epoch, scfg.schedule.warmup_epochs))

        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, imgs, lbls, sub, jnp.asarray(keep))
        pending.append((it, metrics))
        n_images += int(np.prod(imgs.shape[:2])) if imgs.ndim == 5 \
            else imgs.shape[0]

        if it % log_every == 0 or it == steps_per_epoch - 1:
            flush()
            loss_val = logger.meters["loss_total"].value
            if not math.isfinite(loss_val):
                print_fn(f"Loss is {loss_val}, stopping training")
                sys.exit(1)
            print_fn(f"Epoch [{epoch}] [{it}/{steps_per_epoch}] {logger}")

        if (not finish_search
                and (it + 1) % compress_every == 0):
            flush()
            print_fn("Start Compression")
            t_c = _time.time()
            params, alphas, arch, opt_state, report = compress(
                state.params, state.alphas, state.arch, state.opt_state,
                space, scfg.compress_thresh)
            state = state.replace(params=params, alphas=alphas, arch=arch,
                                  opt_state=opt_state)
            execute_pruned |= report.execute_prune
            for e in report.events:
                print_fn(f"  {e}")
            print_fn(f"  compress pass {_time.time() - t_c:.2f}s "
                     f"({len(report.events)} events)")
            finish_search = report.finish_search
            if not scfg.progressive:
                keep_cache = _smallest_active_patch_ratio(state.arch, space)

    flush()
    # sustained epoch throughput, wall-clock incl. feed + compress passes
    # (flush() above read metrics back, so device work is drained —
    # the reference prints the same per-epoch total, utils.py:161-164)
    dt = _time.time() - t_epoch
    stats = logger.averages()
    stats["epoch_time_s"] = dt
    stats["img_s"] = n_images / max(dt, 1e-9)
    print_fn(f"Epoch [{epoch}] total {dt:.1f}s "
             f"({stats['img_s']:.1f} img/s sustained)")
    return state, stats, finish_search, execute_pruned


def search_one_epoch_planned(state: TrainState, step_fn: Callable,
                             metric_keys, cache, labels: np.ndarray,
                             batches, *, epoch: int, scfg: SearchConfig,
                             space: SearchSpace, rng, finish_search: bool,
                             log_every: int = 10, print_fn=master_print
                             ) -> Tuple[TrainState, Dict[str, float],
                                        bool, bool]:
    """search_one_epoch over a `make_planned_search_step` step: the epoch
    index plan is uploaded once and each iteration is ONE execute dispatch
    (no per-step rng/w_p/keep/gather/label round-trips — see
    steps.make_planned_search_step). Identical compress cadence, NaN
    abort, and metric cadence as the classic loop."""
    import time as _time
    from .compress import sync_w_p
    logger = MetricLogger(print_fn=print_fn)
    execute_pruned = False
    A = scfg.accum_iter
    steps_per_epoch = len(batches)
    micro_per_epoch = steps_per_epoch * A
    compress_every = max(steps_per_epoch // scfg.compress_per_epoch, 1)
    warm = scfg.schedule.warmup_epochs
    loss_pos = metric_keys.index("loss_total")
    t_epoch = _time.time()

    # was an async checkpoint write still serializing when this epoch
    # started? (its to_bytes holds the GIL and can starve the dispatch
    # loop — record it so slow epochs can be attributed)
    from . import checkpoint as _ckpt
    with _ckpt._PENDING_LOCK:
        ckpt_pending_at_start = any(t.is_alive()
                                    for t in _ckpt._PENDING.values())

    idx_plan = jnp.asarray(np.stack(batches).astype(np.int32))
    labels_plan = jnp.asarray(labels[np.stack(batches)].astype(np.int32))
    epoch_dev = jnp.asarray(epoch, jnp.int32)
    base = state.step

    pending = []
    timing = {"dispatch_s": 0.0, "flush_s": 0.0, "flush_max_s": 0.0,
              "compress_s": 0.0}

    def flush():
        t0 = _time.time()
        host = jax.device_get(pending)
        dt = _time.time() - t0
        timing["flush_s"] += dt
        timing["flush_max_s"] = max(timing["flush_max_s"], dt)
        for v in host:
            logger.update(**{k: float(x)
                             for k, x in zip(metric_keys, v)})
            if not math.isfinite(float(v[loss_pos])):
                print_fn(f"Loss is {float(v[loss_pos])}, stopping training")
                sys.exit(1)
        pending.clear()

    def host_sync_w_p(frac):
        return state.replace(arch=sync_w_p(state.arch, frac, warm))

    for it in range(steps_per_epoch):
        t0 = _time.time()
        state, packed = step_fn(state, cache, idx_plan, labels_plan, rng,
                                base, epoch_dev)
        timing["dispatch_s"] += _time.time() - t0
        pending.append(packed)

        if it % log_every == 0 or it == steps_per_epoch - 1:
            flush()
            print_fn(f"Epoch [{epoch}] [{it}/{steps_per_epoch}] {logger}")

        if not finish_search and (it + 1) % compress_every == 0:
            flush()
            print_fn("Start Compression")
            t_c = _time.time()
            frac = epoch + ((it + 1) * A) / max(micro_per_epoch, 1)
            state = host_sync_w_p(frac)
            params, alphas, arch, opt_state, report = compress(
                state.params, state.alphas, state.arch, state.opt_state,
                space, scfg.compress_thresh)
            state = state.replace(params=params, alphas=alphas, arch=arch,
                                  opt_state=opt_state)
            execute_pruned |= report.execute_prune
            for e in report.events:
                print_fn(f"  {e}")
            timing["compress_s"] += _time.time() - t_c
            print_fn(f"  compress pass {_time.time() - t_c:.2f}s "
                     f"({len(report.events)} events)")
            finish_search = report.finish_search

    flush()
    # leave state.arch.w_p at the epoch-final anneal value so eval /
    # checkpoints / a later classic-loop stage see the same state the
    # in-jit schedule last applied
    state = host_sync_w_p(epoch + 1.0)
    dt = _time.time() - t_epoch
    n_images = int(idx_plan.size)
    stats = logger.averages()
    stats["epoch_time_s"] = dt
    stats["img_s"] = n_images / max(dt, 1e-9)
    other = dt - timing["dispatch_s"] - timing["flush_s"] \
        - timing["compress_s"]
    print_fn(f"Epoch [{epoch}] total {dt:.1f}s "
             f"({stats['img_s']:.1f} img/s sustained) "
             f"[dispatch {timing['dispatch_s']:.1f}s "
             f"flush {timing['flush_s']:.1f}s "
             f"(max {timing['flush_max_s']:.1f}s) "
             f"compress {timing['compress_s']:.1f}s "
             f"other {other:.1f}s"
             f"{' ckpt-write-pending' if ckpt_pending_at_start else ''}]")
    return state, stats, finish_search, execute_pruned


def train_one_epoch(state: TrainState, step_fn: Callable, feed: Iterable, *,
                    epoch: int, steps_per_epoch: int, rng,
                    log_every: int = 10, print_fn=master_print
                    ) -> Tuple[TrainState, Dict[str, float]]:
    """Plain finetune epoch (reference engine.py:18-72)."""
    import time as _time
    logger = MetricLogger(print_fn=print_fn)
    pending = []
    t_epoch = _time.time()
    n_images = 0
    for it, (imgs, lbls) in enumerate(feed):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, imgs, lbls, sub)
        pending.append(metrics)
        n_images += int(np.prod(imgs.shape[:2])) if imgs.ndim == 5 \
            else imgs.shape[0]
        if it % log_every == 0 or it == steps_per_epoch - 1:
            for m in jax.device_get(pending):
                logger.update(**{k: float(v) for k, v in m.items()})
            pending.clear()
            loss_val = logger.meters["loss"].value
            if not math.isfinite(loss_val):
                print_fn(f"Loss is {loss_val}, stopping training")
                sys.exit(1)
            print_fn(f"Epoch [{epoch}] [{it}/{steps_per_epoch}] {logger}")
    for m in jax.device_get(pending):
        logger.update(**{k: float(v) for k, v in m.items()})
    dt = _time.time() - t_epoch
    stats = logger.averages()
    stats["epoch_time_s"] = dt
    stats["img_s"] = n_images / max(dt, 1e-9)
    return state, stats


def train_one_epoch_planned(state: TrainState, step_fn: Callable, cache,
                            labels: np.ndarray, batches, *, epoch: int,
                            rng, log_every: int = 10,
                            print_fn=master_print
                            ) -> Tuple[TrainState, Dict[str, float]]:
    """train_one_epoch over a `make_planned_train_step` step: the epoch
    index plan is device-resident and each iteration is one execute
    dispatch (see steps.make_planned_train_step)."""
    import time as _time
    logger = MetricLogger(print_fn=print_fn)
    pending = []
    t_epoch = _time.time()
    steps_per_epoch = len(batches)

    idx_plan = jnp.asarray(np.stack(batches).astype(np.int32))
    labels_plan = jnp.asarray(labels[np.stack(batches)].astype(np.int32))
    base = state.step
    timing = {"flush_s": 0.0, "flush_max_s": 0.0}

    def flush():
        t0 = _time.time()
        host = jax.device_get(pending)
        dt = _time.time() - t0
        timing["flush_s"] += dt
        timing["flush_max_s"] = max(timing["flush_max_s"], dt)
        for v in host:
            logger.update(loss=float(v))
            if not math.isfinite(float(v)):
                print_fn(f"Loss is {float(v)}, stopping training")
                sys.exit(1)
        pending.clear()

    for it in range(steps_per_epoch):
        state, loss = step_fn(state, cache, idx_plan, labels_plan, rng,
                              base)
        pending.append(loss)
        if it % log_every == 0 or it == steps_per_epoch - 1:
            flush()
            print_fn(f"Epoch [{epoch}] [{it}/{steps_per_epoch}] {logger}")

    flush()
    dt = _time.time() - t_epoch
    stats = logger.averages()
    stats["epoch_time_s"] = dt
    stats["img_s"] = int(idx_plan.size) / max(dt, 1e-9)
    stats["flush_max_s"] = timing["flush_max_s"]
    return state, stats


def _allsum_hosts(tot: Dict[str, float]) -> Dict[str, float]:
    """Sum per-host partial eval sums across all processes (the analog of
    SmoothedValue.synchronize_between_processes, reference utils.py:41-52).
    No-op single-host; multi-host it rides a process allgather so every
    host reports full-val-set statistics even when the val split is
    rank-sharded."""
    if jax.process_count() <= 1:
        return tot
    from jax.experimental import multihost_utils
    keys = sorted(tot)
    local = np.asarray([tot[k] for k in keys], np.float32)
    summed = np.asarray(
        multihost_utils.process_allgather(local)).sum(axis=0)
    return {k: float(v) for k, v in zip(keys, summed)}


def evaluate(eval_step: Callable, feed: Iterable, *args,
             print_fn=master_print, header: str = "Test:"
             ) -> Dict[str, float]:
    """Top-1/top-5/loss over a feed (reference engine.py:222-291).
    `args` are the model state pieces the eval step expects.

    Multi-host correct: each host accumulates over its (rank-sharded)
    feed, then the sums are all-reduced across processes, so the returned
    stats cover the full validation set on every host."""
    tot = {"loss_sum": 0.0, "top1": 0.0, "top5": 0.0, "count": 0.0}
    for imgs, lbls in feed:
        if imgs.ndim == 5:          # (A, mb, ...) -> flatten accum
            imgs = imgs.reshape(-1, *imgs.shape[2:])
            lbls = lbls.reshape(-1)
        m = jax.device_get(eval_step(*args, imgs, lbls))   # one transfer
        for k in tot:
            tot[k] += float(m[k])
    tot = _allsum_hosts(tot)
    n = max(tot["count"], 1.0)
    stats = {"loss": tot["loss_sum"] / n, "acc1": 100.0 * tot["top1"] / n,
             "acc5": 100.0 * tot["top5"] / n}
    print_fn(f"{header} Acc@1 {stats['acc1']:.3f} Acc@5 {stats['acc5']:.3f} "
             f"loss {stats['loss']:.3f}")
    return stats
