"""Device-mesh helpers: data-parallel training over ICI.

The reference has *no* intra-model parallelism — its only parallelism is
one-process-per-GPU config sweeps through GNU parallel + MongoDB
(SURVEY.md §2.7-2.8, reference experiments/runs.py:64-73).  This module is
the TPU-native capability that replaces and exceeds it: batches shard
across chips on a ``jax.sharding.Mesh`` data axis, parameters are
replicated, and XLA inserts the gradient ``psum`` over ICI from the
sharding annotations alone — no hand-written collectives.

Multi-host extension: call ``jax.distributed.initialize()`` before
``make_mesh()`` and the same code spans slices over DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh", "shard_batch", "replicate", "data_parallel_sharding",
    "data_axis_size",
]

DATA_AXIS = "data"


def data_axis_size(mesh: "Mesh") -> int:
    """Devices along the axis batches shard over — the divisibility unit
    for batch/bucket/stream sizes.  A multi-axis mesh (e.g.
    (ensemble, data)) shards batches over its 'data' axis only, so the
    total device count is the wrong divisor."""
    return int(dict(zip(mesh.axis_names, mesh.devices.shape))[DATA_AXIS])


def initialize_multihost(**kwargs) -> None:
    """Join a multi-host TPU slice: call once per process before any mesh
    construction; afterwards ``jax.devices()`` spans all hosts and the same
    sharded train steps run collectives over ICI within a slice and DCN
    across slices (SURVEY.md §2.8 TPU-native equivalent)."""
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"Requested {n_devices} devices but only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_parallel_sharding(mesh: Mesh):
    """(batch_sharding, replicated_sharding) for the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS)), NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of arrays with the leading axis split across the data
    axis (leading dim must divide by mesh size)."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
