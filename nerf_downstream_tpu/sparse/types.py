"""Core sparse value types: fixed-capacity batched voxel sets.

TPU-native replacement for MinkowskiEngine's ``SparseTensor`` /
``TensorField`` (reference usage: co3d_3d/src/models/mink/base_model.py:6-13,
res16unet.py:391-435). Instead of dynamically-sized coordinate lists managed
by a C++ coordinate manager, a :class:`SparseVoxels` carries a *static*
row-capacity ``N`` with an explicit validity mask — XLA sees only fixed
shapes, so every op compiles once per capacity bucket.

Layout is flat (all batch elements concatenated, batch index in
``coords[:, 0]``) matching ME's batched coordinate convention, which keeps
gather-GEMM-scatter uniform across the batch.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class SparseVoxels:
    """Batched sparse voxel set with fixed row capacity.

    Attributes:
      coords: int32[N, 4] — (batch, x, y, z) in finest-voxel units; rows with
        ``mask == False`` are padding and hold undefined values.
      feats:  [N, C] feature rows (any float dtype).
      mask:   bool[N] validity mask.
      stride: tensor stride (static): coordinates of valid rows are multiples
        of ``stride`` (MinkowskiEngine convention).
    """

    coords: jax.Array
    feats: jax.Array
    mask: jax.Array
    stride: int = flax.struct.field(pytree_node=False, default=1)

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]

    @property
    def num_channels(self) -> int:
        return self.feats.shape[-1]

    def count(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32))

    def batch_ids(self, num_batches: int) -> jax.Array:
        """Batch index per row; padding rows map to ``num_batches``."""
        return jnp.where(self.mask, self.coords[:, 0], num_batches).astype(
            jnp.int32
        )

    def masked_feats(self) -> jax.Array:
        return jnp.where(self.mask[:, None], self.feats, 0)

    def replace_feats(self, feats: jax.Array) -> "SparseVoxels":
        return self.replace(feats=feats)


@flax.struct.dataclass
class PointField:
    """Continuous-coordinate point set (TensorField equivalent).

    ``coords`` are float32 [N, 4] with batch index in column 0. Converted to
    a :class:`SparseVoxels` by quantization with duplicate-averaging
    (``field_to_sparse``), and back by gathering per-point voxel rows
    (``sparse_to_field``) — the ``.sparse()`` / ``.slice()`` round trip of
    the reference (res16unet.py:392,435).
    """

    coords: jax.Array
    feats: jax.Array
    mask: jax.Array

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]


def from_dense_batch(
    coords: Any, feats: Any, lengths: Any, capacity: int | None = None
) -> SparseVoxels:
    """Build SparseVoxels from per-sample arrays (host-side helper)."""
    import numpy as np

    rows = []
    frows = []
    for b, (c, f) in enumerate(zip(coords, feats)):
        c = np.asarray(c)
        rows.append(
            np.concatenate([np.full((len(c), 1), b, np.int32), c], axis=1)
        )
        frows.append(np.asarray(f))
    allc = np.concatenate(rows, 0).astype(np.int32)
    allf = np.concatenate(frows, 0).astype(np.float32)
    n = len(allc)
    cap = capacity or n
    mask = np.zeros(cap, bool)
    mask[:n] = True
    out_c = np.zeros((cap, 4), np.int32)
    out_f = np.zeros((cap, allf.shape[1]), np.float32)
    out_c[:n] = allc[:cap]
    out_f[:n] = allf[:cap]
    return SparseVoxels(
        coords=jnp.asarray(out_c),
        feats=jnp.asarray(out_f),
        mask=jnp.asarray(mask),
        stride=1,
    )
