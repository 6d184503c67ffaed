"""Multi-host (multi-process) scaffolding.

TPU-native replacement for the reference's `launch(num_machines,
machine_rank, dist_url)` torch.distributed rendezvous
(`Detection/train_net.py:194-201`, SURVEY.md §5.8):

  - `maybe_initialize_distributed` — `jax.distributed.initialize` guarded by
    env vars (MOT3D_COORDINATOR / MOT3D_NUM_PROCESSES / MOT3D_PROCESS_ID),
    the analogue of the reference's dist_url rendezvous.  A no-op unless a
    multi-process run is configured, so single-host workflows never pay for
    it.
  - `make_global_mesh` — 1-D `data` mesh over ALL global devices.
    `jax.devices()` orders devices process-major, so consecutive mesh
    positions within one host/slice ride ICI and the process boundary is
    the only DCN hop — batch-sharded data parallelism never puts a gradient
    psum segment across DCN that ICI could have carried.
  - `host_local_batch_to_global` — per-host data feeding: every process
    loads only its local shard of the global batch and the shards are
    assembled into global arrays with
    `jax.make_array_from_process_local_data` (the reference instead relies
    on per-rank torch DataLoader sampling).
  - `is_main_process` — host-0 gating for writers/checkpoints
    (`detectron2.utils.comm.is_main_process` equivalent, used at
    `Detection/train_net.py:128-136`).

The jitted train steps themselves are unchanged: XLA inserts the gradient
psum over ICI/DCN from the shardings (SURVEY.md §2.7) — there is no
hand-written communication layer to port.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_COORDINATOR = "MOT3D_COORDINATOR"
ENV_NUM_PROCESSES = "MOT3D_NUM_PROCESSES"
ENV_PROCESS_ID = "MOT3D_PROCESS_ID"

_initialized = False


def maybe_initialize_distributed(
        coordinator: Optional[str] = None,
        num_processes: Optional[int] = None,
        process_id: Optional[int] = None) -> bool:
    """Initialise `jax.distributed` iff a multi-process run is configured.

    Explicit arguments win; otherwise the MOT3D_* env vars are consulted
    (so the same CLI entry point works single-host and multi-host, like the
    reference's `launch()` wrapping both).  Returns True iff
    `jax.distributed.initialize` was called (now or earlier).
    """
    global _initialized
    if _initialized:
        return True
    coordinator = coordinator or os.environ.get(ENV_COORDINATOR)
    if num_processes is None:
        num_processes = int(os.environ.get(ENV_NUM_PROCESSES, "0") or 0)
    if process_id is None:
        pid = os.environ.get(ENV_PROCESS_ID)
        process_id = int(pid) if pid is not None else None
    if not coordinator or num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return True


def is_main_process() -> bool:
    return jax.process_index() == 0


def make_global_mesh(axis: str = "data",
                     devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all global devices, process-major (ICI inside a
    process's devices, DCN only at process boundaries)."""
    devs = list(devices if devices is not None else jax.devices())
    devs.sort(key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), (axis,))


def host_local_batch_to_global(mesh: Mesh, tree, axis: str = "data"):
    """Assemble per-process local batch shards into global jax.Arrays.

    Every leaf's leading axis is the LOCAL batch; the global batch is
    local_batch * process_count, sharded over `axis`.  Single-process this
    degenerates to a plain shard_batch.
    """
    sharding = NamedSharding(mesh, P(axis))
    nproc = len({d.process_index for d in mesh.devices.flat})

    def to_global(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)

    return jax.tree_util.tree_map(to_global, tree)


def replicate_global(mesh: Mesh, tree):
    """Replicate a host-local pytree onto every device of a (possibly
    multi-process) mesh.  Unlike `mesh.replicate`/`device_put`, this works
    when the mesh contains non-addressable devices: every process must hold
    the same values (e.g. params from the same PRNG seed), which become one
    fully-replicated global array."""
    sharding = NamedSharding(mesh, P())

    def rep(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x, x.shape)

    return jax.tree_util.tree_map(rep, tree)


def global_batch_size(local_batch_size: int) -> int:
    return local_batch_size * jax.process_count()
