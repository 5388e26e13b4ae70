"""Sparse voxel core: types, coordinate algebra, kernel maps."""

from nerf_downstream_tpu.sparse.kernels import (
    build_kernel_map,
    field_to_sparse,
    kernel_offsets,
    sparse_to_field,
    stride_coords,
    unique_coords,
)
from nerf_downstream_tpu.sparse.types import (
    PointField,
    SparseVoxels,
    from_dense_batch,
)

__all__ = [
    "PointField",
    "SparseVoxels",
    "from_dense_batch",
    "build_kernel_map",
    "field_to_sparse",
    "kernel_offsets",
    "sparse_to_field",
    "stride_coords",
    "unique_coords",
]
