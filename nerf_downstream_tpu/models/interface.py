"""Model input interface (reference co3d_3d/src/models/interface.py:4-9,
mink/base_model.py:6-13: ``process_input(batch)`` wraps the collated batch
into a TensorField).

Here the batcher emits numpy arrays; ``process_input`` turns them into a
:class:`PointField` pytree ready for a jitted forward.
"""

from __future__ import annotations

import jax.numpy as jnp

from nerf_downstream_tpu.sparse.types import PointField


def process_input(batch: dict) -> PointField:
    """batch: {"coordinates": [N,4] float/int, "features": [N,C],
    "mask": [N] bool} -> PointField."""
    coords = jnp.asarray(batch["coordinates"], jnp.float32)
    feats = jnp.asarray(batch["features"], jnp.float32)
    mask = jnp.asarray(batch["mask"], bool)
    return PointField(coords=coords, feats=feats, mask=mask)
