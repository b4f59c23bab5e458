"""Device mesh construction + sharding rules.

The reference's only parallelism is DDP data-parallel over NCCL
(SURVEY §2.2-2.3; reference search.py:619, utils.py:221-244). TPU-native,
that is a 1-D 'data' mesh axis with the batch sharded over it and the model
state replicated — XLA inserts the gradient all-reduce over ICI. A second
'model' axis is provided for tensor-parallel sharding of the wide matmuls
(qkv / proj / fc1 / fc2), useful for ViT-Large+ or very large batches;
pipeline/expert/sequence axes are deliberately absent (nothing to pipeline
at depth-12 / 197 tokens — SURVEY §5.7).

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the
mesh spans all global devices (DCN between hosts, ICI within a slice).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Tuple[str, ...] = ("data", "model"),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh. Default: all devices on 'data', 'model'=1."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if len(shape) == 1:
        shape = (shape[0], 1)
    assert int(np.prod(shape)) == n, f"mesh {shape} != {n} devices"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, *, leading_accum: bool = False
                   ) -> NamedSharding:
    """Shard the (global) batch over 'data'. With gradient accumulation the
    accum axis is leading and the per-microbatch axis is sharded."""
    if leading_accum:
        return NamedSharding(mesh, P(None, "data"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rules(mesh: Mesh, params, *, tensor_parallel: bool = False):
    """Sharding tree for the model params.

    Data-parallel (default): everything replicated.
    tensor_parallel: shard the block matmuls over 'model' —
      qkv kernel (D, 3*H*hd)   -> P(None, 'model')   column parallel
      proj kernel (H*hd, D)    -> P('model', None)   row parallel
      fc1 kernel (D, hid)      -> P(None, 'model')
      fc2 kernel (hid, D)      -> P('model', None)
    XLA inserts the psum on the row-parallel outputs automatically when the
    computation is jitted with these shardings.
    """
    def rule(path, leaf):
        if not tensor_parallel:
            return NamedSharding(mesh, P())
        name = ".".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        if leaf.ndim == 2:
            if "qkv.kernel" in name or "fc1.kernel" in name:
                return NamedSharding(mesh, P(None, "model"))
            if "proj.kernel" in name or "fc2.kernel" in name:
                return NamedSharding(mesh, P("model", None))
        if leaf.ndim == 1:
            if "qkv.bias" in name or "fc1.bias" in name:
                return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_batch(mesh: Mesh, batch, *, leading_accum: bool = False):
    sh = batch_sharding(mesh, leading_accum=leading_accum)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree)
