"""Device-mesh and sharding helpers (SURVEY.md §2.3 / §5.8).

The reference has no distributed backend — one process, one CUDA GPU
(`src/core/superpoint.cpp:133`). The TPU framework's communication layer is
jax.sharding: a Mesh over the chips, NamedShardings on the stream-batched
SLAM state, and whatever collectives pjit emits riding ICI. Data-parallel
over concurrent sequences is the one real parallelism axis of this workload
(BASELINE configs[4]: 16 KITTI streams per chip, sharded across chips);
TP/PP/EP/CP have no counterpart here and are explicitly out of scope
(SURVEY.md §5.7-5.8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1-D data mesh over the available (or first n) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def stream_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (stream) axis of every leaf over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_streams(tree, mesh: Mesh, axis_name: str = "data"):
    """Place a stream-batched pytree with its leading axis sharded."""
    sh = stream_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), tree)
