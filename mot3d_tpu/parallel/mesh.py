"""Device mesh + sharding helpers.

TPU-native replacement for the reference's detectron2 `launch()` +
torch.distributed NCCL data parallelism (`Detection/train_net.py:194-201`,
SURVEY.md §2.7): a 1-D `data` mesh over all chips; batches are sharded on
their leading axis, parameters replicated, and XLA inserts the psum
gradient reductions over ICI inside the jitted step — no hand-written
communication layer.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis: str = "data",
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devs = list(devices or jax.devices())
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Shard every leaf on its leading (batch) axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def batch_spec(axis: str = "data") -> P:
    return P(axis)


def replicated_spec() -> P:
    return P()
