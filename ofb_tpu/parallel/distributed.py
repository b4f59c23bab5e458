"""Multi-host initialization + elastic mesh rebuild.

TPU-native replacement for the reference's process-group management
(reference utils.py:177-279):

  * `init_distributed()` — the analog of init_distributed_mode
    (utils.py:221-244): joins the jax.distributed cluster when coordinator
    env vars are present; a no-op for single-host runs. Rank/world come
    from jax.process_index/process_count afterwards.
  * `reinit_mesh()` — the analog of reinit_distributed_mode
    (utils.py:247-279, the reference's crude elastic-resize hook): rebuilds
    a Mesh over the currently-visible device set and re-places a pytree of
    state onto it. Shapes are static, so resuming on a different slice
    size is just re-replication (+ the data plan resharding).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

from .mesh import make_mesh, replicate


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Tuple[int, int]:
    """Join the multi-host cluster if configured; returns (rank, world).

    Env contract (mirrors the reference's env:// rendezvous,
    utils.py:223-242): COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID,
    or the standard TPU pod metadata that jax.distributed auto-detects.
    """
    coord = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    if coord and jax.process_count() == 1:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=num_processes or int(
                os.environ.get("NUM_PROCESSES", "1")),
            process_id=process_id or int(os.environ.get("PROCESS_ID", "0")))
    return jax.process_index(), jax.process_count()


def reinit_mesh(state_tree, shape: Optional[Tuple[int, ...]] = None):
    """Rebuild the mesh over the current device set and re-replicate a
    state pytree onto it (elastic resize on resume). Returns (mesh, state).
    """
    mesh = make_mesh(shape)
    host_tree = jax.tree_util.tree_map(
        lambda x: jax.device_get(x) if hasattr(x, "device") else x,
        state_tree)
    return mesh, replicate(mesh, host_tree)


def barrier_sync(name: str = "ofb_barrier"):
    """Cross-host barrier (the reference sprinkles dist.barrier();
    SPMD rarely needs one, but checkpoint fences do)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
