"""Device mesh setup and batch sharding.

TPU-native replacement for the reference's NCCL/Lightning-DDP layer
(SURVEY §2.5): data parallelism is a ``jax.sharding.Mesh`` with a ``data``
axis; gradient/metric all-reduce is ``psum`` over that axis inside a
``shard_map``-ped train step; SyncBatchNorm is the masked-BN op with
``axis_name="data"``. Multi-host initialization goes through
``jax.distributed.initialize`` and per-host input sharding
(``process_index``-strided filelists replacing DistributedSampler).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis,))


def initialize_multihost(**kwargs):
    """jax.distributed.initialize wrapper (no-op when single-process)."""
    if jax.process_count() > 1 or kwargs:
        jax.distributed.initialize(**kwargs)


def shard_leading(mesh: Mesh, tree, axis: str = "data"):
    """Place arrays with their leading dim sharded over the mesh axis."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
