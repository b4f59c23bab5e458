"""Checkpoint / resume.

The reference pickles whole nn.Modules because tensor shapes change
mid-search (SURVEY §5.4; reference search.py:711-722). Our shapes are
static, so a state_dict-style pytree checkpoint suffices: params, alphas,
opt_state, EMA, plus the small arch-state record (switches, hard masks,
flags, w_p) and run metadata. Artifacts mirror the reference set:
running_ckpt / best / model_pruned / model_fused (search.py:672-683,
711-740, 775-787).

Format: msgpack via flax.serialization per component + meta.json.
Process-0-only writes (save_on_master, reference utils.py:216-218).
"""

from __future__ import annotations

import json
import os
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from ..utils.logging import is_main_process

_PENDING: Dict[str, threading.Thread] = {}
_PENDING_LOCK = threading.Lock()


def _tree_to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)),
                                  tree)


def save_checkpoint(path: str, *, params, alphas=None, arch=None,
                    opt_state=None, ema_params=None,
                    meta: Optional[Dict[str, Any]] = None,
                    async_write: bool = False) -> None:
    """Write a checkpoint directory. Only process 0 writes.

    async_write: the device->host transfer AND serialization + file I/O
    all run on a background thread, so the train loop never blocks on the
    relay readback (~0.5 GB for a DeiT-S running_ckpt = seconds per
    epoch; the reference blocks every epoch on torch.save of the whole
    pickled module, search.py:711-722). The snapshot is still consistent:
    jax arrays are immutable and this codebase never donates its train
    state (donation stalls the relay — CLAUDE.md), so the references
    captured here keep pointing at this epoch's values while the loop
    dispatches the next epoch. copy_to_host_async() is kicked off on the
    caller so the DMA overlaps compute instead of starting when the
    writer thread gets scheduled.
    """
    if os.environ.get("OFB_CKPT_BACKEND") == "orbax":
        return save_checkpoint_orbax(
            path, params=params, alphas=alphas, arch=arch,
            opt_state=opt_state, ema_params=ema_params, meta=meta,
            async_write=async_write)
    if not is_main_process():
        return
    os.makedirs(path, exist_ok=True)
    raw = {name: tree for name, tree in
           (("params", params), ("alphas", alphas), ("arch", arch),
            ("opt_state", opt_state), ("ema", ema_params))
           if tree is not None}
    if async_write:
        for tree in raw.values():
            jax.tree_util.tree_map(
                lambda x: x.copy_to_host_async()
                if hasattr(x, "copy_to_host_async") else None, tree)
        parts = None
    else:
        parts = {name: _tree_to_host(tree) for name, tree in raw.items()}

    def write():
        nonlocal parts
        if parts is None:
            parts = {name: _tree_to_host(tree) for name, tree in raw.items()}
        # every part goes tmp -> os.replace so a crash mid-write never
        # leaves meta.json pointing at a truncated msgpack; meta last,
        # so a readable meta implies readable parts.
        for name, tree in parts.items():
            dst = os.path.join(path, name + ".msgpack")
            with open(dst + ".tmp", "wb") as f:
                f.write(serialization.to_bytes(tree))
            os.replace(dst + ".tmp", dst)
        mdst = os.path.join(path, "meta.json")
        with open(mdst + ".tmp", "w") as f:
            json.dump({"format_version": 1, "parts": list(parts),
                       **(meta or {})}, f, indent=2)
        os.replace(mdst + ".tmp", mdst)

    if async_write:
        # serialize writes per destination: back-to-back epoch saves to
        # the same running_ckpt dir must not interleave.
        norm = os.path.abspath(path)
        with _PENDING_LOCK:
            prev = _PENDING.get(norm)
        if prev is not None:
            prev.join()
        t = threading.Thread(target=write, daemon=True)
        with _PENDING_LOCK:
            _PENDING[norm] = t
        t.start()
    else:
        write()


def wait_for_pending_saves():
    """Join outstanding async checkpoint writes (call before exit)."""
    with _PENDING_LOCK:
        pending = list(_PENDING.values())
        _PENDING.clear()
    for t in pending:
        t.join()


def load_checkpoint(path: str, *, params=None, alphas=None, arch=None,
                    opt_state=None, ema_params=None) -> Dict[str, Any]:
    """Restore into provided templates (same-structure pytrees). Returns a
    dict with restored parts + meta."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("backend") == "orbax":
        return load_checkpoint_orbax(path, params=params, alphas=alphas,
                                     arch=arch, opt_state=opt_state,
                                     ema_params=ema_params)
    ver = meta.get("format_version", 1)
    if ver > 1:
        raise ValueError(f"checkpoint format {ver} is newer than this "
                         f"build understands (1): {path}")
    out: Dict[str, Any] = {"meta": meta}
    templates = {"params": params, "alphas": alphas, "arch": arch,
                 "opt_state": opt_state, "ema": ema_params}
    for name in meta["parts"]:
        tpl = templates.get(name)
        fpath = os.path.join(path, name + ".msgpack")
        if tpl is None or not os.path.exists(fpath):
            continue
        with open(fpath, "rb") as f:
            out[name] = serialization.from_bytes(tpl, f.read())
    return out


def model_cfg_from_meta(cfg_dict: Dict[str, Any], cfg_cls):
    """Rebuild a (frozen, tuple-field) model config dataclass from the
    JSON round-trip of dataclasses.asdict: lists -> tuples, incl. the
    nested per-block override tuples. Shared by every CLI that restores a
    checkpointed config (eval/finetune/story/swin)."""
    def conv(v):
        if isinstance(v, list):
            return tuple(conv(x) for x in v)
        return v
    return cfg_cls(**{k: conv(v) for k, v in cfg_dict.items()})


def _destatedict(node):
    """Invert flax's to_state_dict list encoding: dicts whose keys are all
    decimal strings become lists (ordered by index)."""
    if isinstance(node, dict):
        if node and all(isinstance(k, str) and k.isdigit() for k in node):
            return [_destatedict(node[str(i)]) for i in range(len(node))]
        return {k: _destatedict(v) for k, v in node.items()}
    return node


def load_checkpoint_raw(path: str) -> Dict[str, Any]:
    """Restore parts WITHOUT templates (shapes come from the file). Needed
    for exported models whose sliced shapes are not reconstructible from a
    config alone (e.g. Swin subnets with per-block sliced widths)."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    out: Dict[str, Any] = {"meta": meta}
    if meta.get("backend") == "orbax":
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        for name in meta["parts"]:
            fpath = os.path.join(os.path.abspath(path), name + ".orbax")
            if os.path.exists(fpath):
                out[name] = ckptr.restore(fpath)
        return out
    for name in meta["parts"]:
        fpath = os.path.join(path, name + ".msgpack")
        if not os.path.exists(fpath):
            continue
        with open(fpath, "rb") as f:
            out[name] = _destatedict(serialization.msgpack_restore(f.read()))
    return out


def latest_meta(path: str) -> Optional[Dict[str, Any]]:
    p = os.path.join(path, "meta.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# Optional orbax backend.
#
# The msgpack path above device_gets the whole tree on process 0, which is
# correct for replicated state (everything during single-slice search) but
# cannot persist state sharded across *hosts* (e.g. tensor-parallel params
# on a multi-host mesh: no single process holds all shards). Orbax writes
# each host's shards in parallel and restores to the same shardings —
# the TPU-native analog of the reference's rank-0 torch.save, generalized.
# Select with OFB_CKPT_BACKEND=orbax or call these directly.
# ---------------------------------------------------------------------------

def save_checkpoint_orbax(path: str, *, params, alphas=None, arch=None,
                          opt_state=None, ema_params=None,
                          meta: Optional[Dict[str, Any]] = None,
                          async_write: bool = False) -> None:
    """Orbax-backed save of the same artifact layout (parts + meta.json).

    Safe on multi-host sharded pytrees: every process must call this
    (orbax coordinates the write); meta.json is still process-0-only.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    parts = {name: tree for name, tree in
             (("params", params), ("alphas", alphas), ("arch", arch),
              ("opt_state", opt_state), ("ema", ema_params))
             if tree is not None}
    # serialize per destination like the msgpack path: a previous async
    # save to the SAME dir must fully commit before force=True deletes
    # its target directories
    norm = "orbax:" + path
    with _PENDING_LOCK:
        prev = _PENDING.get(norm)
    if prev is not None:
        prev.join()

    # Invalidate the old meta BEFORE force=True deletes committed part
    # dirs: a crash mid-save then reads as "no checkpoint here" (loud at
    # resume time) instead of a stale meta pointing at missing/partial
    # parts. Paired with load_checkpoint_orbax raising on listed-but-
    # missing parts, the contract is: readable meta => readable parts.
    if is_main_process():
        old_meta = os.path.join(path, "meta.json")
        if os.path.exists(old_meta):
            os.remove(old_meta)

    ckptr = ocp.StandardCheckpointer()     # AsyncCheckpointer under the hood
    for name, tree in parts.items():
        ckptr.save(os.path.join(path, name + ".orbax"), tree, force=True)

    def finish():
        # meta LAST, after every part is durable — readable meta implies
        # readable parts (same crash-safety contract as the msgpack path)
        ckptr.wait_until_finished()
        if is_main_process():
            os.makedirs(path, exist_ok=True)
            mdst = os.path.join(path, "meta.json")
            with open(mdst + ".tmp", "w") as f:
                json.dump({"format_version": 1, "backend": "orbax",
                           "parts": list(parts), **(meta or {})}, f,
                          indent=2)
            os.replace(mdst + ".tmp", mdst)

    if async_write:
        t = threading.Thread(target=finish, daemon=True)
        with _PENDING_LOCK:
            _PENDING[norm] = t
        t.start()
    else:
        finish()


def load_checkpoint_orbax(path: str, *, params=None, alphas=None, arch=None,
                          opt_state=None, ema_params=None) -> Dict[str, Any]:
    """Restore orbax parts into templates (abstract or concrete pytrees;
    sharded templates restore to their shardings)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    out: Dict[str, Any] = {"meta": meta}
    templates = {"params": params, "alphas": alphas, "arch": arch,
                 "opt_state": opt_state, "ema": ema_params}
    ckptr = ocp.StandardCheckpointer()
    for name in meta["parts"]:
        tpl = templates.get(name)
        if tpl is None:
            continue
        fpath = os.path.join(path, name + ".orbax")
        if not os.path.exists(fpath):
            # meta promises this part (meta is written LAST, after
            # wait_until_finished) — a listed-but-absent part means a
            # crashed/overwritten save; silently restoring fresh-init
            # state would corrupt a resume.
            raise FileNotFoundError(
                f"checkpoint part {name!r} listed in {path}/meta.json but "
                f"{fpath} is missing — half-written orbax checkpoint "
                f"(crash during overwrite save?); refuse to resume from it")
        out[name] = ckptr.restore(fpath, tpl)
    return out
