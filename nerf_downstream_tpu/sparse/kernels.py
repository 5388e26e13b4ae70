"""Coordinate-set algebra: striding, dedup, kernel maps, field<->sparse.

This is the TPU-native replacement for MinkowskiEngine's CoordinateManager
(``kernel_map`` / ``stride`` — reference usage at
co3d_3d/src/models/mink/modules/sparse_conv.py:90-96,398-405):

- ``stride_coords``: downsample a coordinate set (unique of floor-to-stride),
  implemented as sort + first-occurrence scatter under a fixed capacity.
- ``build_kernel_map``: for each output voxel and each kernel offset, the
  input row holding its neighbor (or a sentinel) — one exact binary search
  over packed keys per (offset, output) pair. The resulting dense
  ``int32[K, N_out]`` table drives gather→MXU-matmul→accumulate convolution.
- ``field_to_sparse`` / ``sparse_to_field``: quantization with duplicate
  averaging and the inverse gather (ME ``TensorField.sparse()`` /
  ``SparseTensor.slice()``, res16unet.py:392,435).

All results have static shapes; "missing" entries are index ``N`` pointing at
a zero sentinel row appended by consumers.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from nerf_downstream_tpu import config as cfg
from nerf_downstream_tpu.sparse import packing
from nerf_downstream_tpu.sparse.types import PointField, SparseVoxels


def kernel_offsets(
    kernel_size: int | tuple[int, int, int],
    tensor_stride: int,
    dilation: int = 1,
) -> np.ndarray:
    """Integer kernel offsets in finest-voxel units, ME region convention.

    Odd kernels are centered on the output coordinate; even kernels span
    ``0..k-1`` from it (MinkowskiEngine KernelGenerator semantics). Offsets
    are scaled by the *input* tensor stride times dilation.
    """
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * 3
    axes = []
    for k in kernel_size:
        if k % 2 == 1:
            r = np.arange(-(k // 2), k // 2 + 1)
        else:
            r = np.arange(0, k)
        axes.append(r * tensor_stride * dilation)
    # x fastest (MinkowskiEngine's RegionIterator order — e.g. the ZAXIS
    # offsets of a 3^3 kernel are indices [4, 13, 22]); the order defines the
    # kernel-weight row layout for checkpoint parity.
    offs = np.array(
        [(x, y, z) for z, y, x in itertools.product(*axes[::-1])],
        dtype=np.int32,
    )
    return offs


def stride_coords(sv: SparseVoxels, stride: int) -> SparseVoxels:
    """Coordinate-set downsampling: unique(floor(coords / s) * s).

    Returns a SparseVoxels with the same capacity, features all-zero (the
    caller computes them), coordinates at tensor stride ``sv.stride*stride``.
    """
    out, _ = stride_coords_capped(sv, stride, cap=None)
    return out


def stride_coords_capped(
    sv: SparseVoxels, stride: int, cap: int | None
) -> tuple[SparseVoxels, jax.Array]:
    """``stride_coords`` with a per-level row capacity.

    Coarser levels of surface-shell data hold ~4x fewer occupied voxels per
    stride doubling (measured 62k/16k/4k/1k/0.3k rows at strides 1..16 on
    the bench workload), so carrying the finest level's static capacity
    through every level wastes capacity-proportional work in every op that
    touches the level. ``unique_coords`` packs unique entries at the front
    in key order, so capping is a slice; ``lost`` counts valid coordinates
    beyond the cap (the caller NaN-poisons the level's features when
    lost > 0 — fail loud, never train on a silently-truncated level, same
    contract as block-cap overflow / window escapes).
    """
    new_stride = sv.stride * stride
    xyz = (sv.coords[:, 1:] // new_stride) * new_stride
    coords = jnp.concatenate([sv.coords[:, :1], xyz], axis=1)
    uniq_coords, uniq_mask, _ = unique_coords(coords, sv.mask)
    if cap is None or cap >= sv.capacity:
        lost = jnp.zeros((), jnp.int32)
    else:
        lost = jnp.sum(uniq_mask[cap:].astype(jnp.int32))
        uniq_coords = uniq_coords[:cap]
        uniq_mask = uniq_mask[:cap]
    return (
        SparseVoxels(
            coords=uniq_coords,
            feats=jnp.zeros((uniq_coords.shape[0], 0), sv.feats.dtype),
            mask=uniq_mask,
            stride=new_stride,
        ),
        lost,
    )


def unique_coords(coords, mask):
    """Deduplicate a coordinate set under a static capacity.

    Returns (out_coords [N,4], out_mask [N], row_to_unique [N]) where
    ``row_to_unique[i]`` is the output slot holding row i's coordinate (valid
    only where ``mask``). Unique entries are packed at the front in key order.
    """
    n = coords.shape[0]
    hi, lo = packing.pack(coords, mask)
    idx = jnp.arange(n, dtype=jnp.int32)
    s_hi, s_lo, s_idx = packing.sort_with_payload(hi, lo, idx)
    s_valid = s_hi != packing.INVALID_KEY
    first = packing.unique_first_occurrence(s_hi, s_lo, s_valid)
    # output slot for each sorted row (duplicates share their first row's slot)
    slot = jnp.cumsum(first.astype(jnp.int32)) - 1
    num_unique = jnp.sum(first.astype(jnp.int32))
    slot = jnp.where(s_valid, slot, n - 1)  # clamp padding (masked out below)
    out_mask = idx < num_unique
    # scatter first-occurrence coords into their slots; non-first rows are
    # routed to index n and dropped
    src_coords = coords[s_idx]
    scatter_to = jnp.where(first, slot, n)
    out_coords = (
        jnp.zeros((n + 1, 4), coords.dtype)
        .at[scatter_to]
        .set(src_coords, mode="drop")[:n]
    )
    # map original row -> unique slot
    row_to_unique = (
        jnp.zeros((n,), jnp.int32).at[s_idx].set(slot.astype(jnp.int32))
    )
    return out_coords, out_mask, row_to_unique


def build_grid_index(
    coords: jax.Array,
    mask: jax.Array,
    num_batches: int,
    extent: int,
    stride: int,
):
    """Dense per-batch lookup grid: grid[b, x, y, z] = row index (or N).

    The TPU-native replacement for hashmap probing *and* binary search:
    one scatter builds the grid, then any number of kernel-map builds
    against this coordinate set are single gathers. Coordinates are
    expressed relative to each batch element's min corner; the grid covers
    ``extent`` finest-units per axis (cells of size ``stride``).

    Returns (grid int32[B, E, E, E] flattened to [B*E*E*E], origin[B, 3]).
    """
    n = coords.shape[0]
    e = max(extent // stride, 1)
    b_ids = jnp.where(mask, coords[:, 0], num_batches).astype(jnp.int32)
    big = jnp.int32(1 << 30)
    xyz = coords[:, 1:]
    masked_xyz = jnp.where(mask[:, None], xyz, big)
    origin = jax.ops.segment_min(
        masked_xyz, b_ids, num_segments=num_batches + 1
    )[:num_batches]
    origin = jnp.where(origin == big, 0, origin)
    rel = (xyz - origin[jnp.clip(b_ids, 0, num_batches - 1)]) // stride
    in_bounds = mask & jnp.all((rel >= 0) & (rel < e), axis=1)
    flat = (
        jnp.clip(b_ids, 0, num_batches - 1) * (e * e * e)
        + rel[:, 0] * (e * e)
        + rel[:, 1] * e
        + rel[:, 2]
    )
    flat = jnp.where(in_bounds, flat, num_batches * e * e * e)
    grid = (
        jnp.full((num_batches * e * e * e + 1,), n, jnp.int32)
        .at[flat]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop")[:-1]
    )
    return grid, origin


def lookup_grid(
    grid: jax.Array,
    origin: jax.Array,
    num_batches: int,
    extent: int,
    stride: int,
    q_coords: jax.Array,
    q_mask: jax.Array,
    n_in: int,
) -> jax.Array:
    """Exact lookup of query coords in a grid index; missing/out -> n_in."""
    e = max(extent // stride, 1)
    b_ids = jnp.clip(q_coords[:, 0], 0, num_batches - 1).astype(jnp.int32)
    delta = q_coords[:, 1:] - origin[b_ids]
    rel = delta // stride
    in_bounds = q_mask & jnp.all((rel >= 0) & (rel < e), axis=1)
    if stride > 1:
        # exactness: grid cells are stride-sized; only exact multiples are
        # real coordinates of this set
        in_bounds = in_bounds & jnp.all(delta % stride == 0, axis=1)
    flat = b_ids * (e * e * e) + rel[:, 0] * (e * e) + rel[:, 1] * e + rel[:, 2]
    flat = jnp.clip(flat, 0, grid.shape[0] - 1)
    rows = grid[flat]
    return jnp.where(in_bounds, rows, n_in)


def build_kernel_map_grid(
    grid,
    origin,
    num_batches: int,
    extent: int,
    in_stride: int,
    n_in: int,
    out_coords: jax.Array,
    out_mask: jax.Array,
    offsets: np.ndarray,
    transpose: bool = False,
) -> jax.Array:
    """Kernel map via the dense grid index: one gather for all K offsets."""
    offs = jnp.asarray(offsets, jnp.int32)
    if transpose:
        offs = -offs
    k = offs.shape[0]
    n_out = out_coords.shape[0]
    q_xyz = out_coords[None, :, 1:] + offs[:, None, :]
    q = jnp.concatenate(
        [
            jnp.broadcast_to(out_coords[None, :, :1], (k, n_out, 1)),
            q_xyz,
        ],
        axis=-1,
    ).reshape(-1, 4)
    q_mask = jnp.broadcast_to(out_mask[None, :], (k, n_out)).reshape(-1)
    rows = lookup_grid(
        grid, origin, num_batches, extent, in_stride, q, q_mask, n_in
    )
    return rows.reshape(k, n_out)


def build_kernel_map(
    in_coords: jax.Array,
    in_mask: jax.Array,
    out_coords: jax.Array,
    out_mask: jax.Array,
    offsets: np.ndarray,
    transpose: bool = False,
) -> jax.Array:
    """Neighbor index table int32[K, N_out]; missing entries = N_in.

    For a forward conv the input neighbor of output voxel ``o`` at offset
    ``d`` sits at ``o + d``. For a transposed conv (decoder onto cached
    coords) the adjoint relation is ``o - d``
    (reference conv_tr: sparse_conv.py:427-560; ME ConvolutionTranspose).

    This is the generic (unbounded-extent) sort + binary-search builder;
    the CoordinateContext prefers the dense-grid builder when an extent is
    configured (an order of magnitude faster on TPU).
    """
    n_in = in_coords.shape[0]
    hi, lo = packing.pack(in_coords, in_mask)
    idx = jnp.arange(n_in, dtype=jnp.int32)
    s_hi, s_lo, s_idx = packing.sort_with_payload(hi, lo, idx)

    offs = jnp.asarray(offsets, jnp.int32)  # [K, 3]
    if transpose:
        offs = -offs
    # queries: [K, N_out, 4]
    q_xyz = out_coords[None, :, 1:] + offs[:, None, :]
    q = jnp.concatenate(
        [
            jnp.broadcast_to(
                out_coords[None, :, :1], q_xyz.shape[:2] + (1,)
            ),
            q_xyz,
        ],
        axis=-1,
    )
    q_flat = q.reshape(-1, 4)
    q_mask = jnp.broadcast_to(out_mask[None, :], q.shape[:2]).reshape(-1)
    q_hi, q_lo = packing.pack(q_flat, q_mask)
    pos = packing.find(s_hi, s_lo, q_hi, q_lo, missing=n_in)
    # translate sorted position -> original input row; sentinel stays N_in
    s_idx_ext = jnp.concatenate([s_idx, jnp.array([n_in], jnp.int32)])
    rows = s_idx_ext[pos]
    return rows.reshape(offs.shape[0], out_coords.shape[0])


@cfg.configurable("field_to_sparse")
def field_to_sparse(field: PointField, voxel_size: float = 1.0,
                    assume_unique: bool = False):
    """Quantize a PointField into SparseVoxels, averaging duplicate points.

    Returns (SparseVoxels, point_to_voxel int32[N]) — the inverse map used by
    ``sparse_to_field``.

    ``assume_unique``: declare that every valid point already maps to a
    distinct voxel (true for the Plenoxel grids — PeRFception stores one row
    per occupied voxel — WHEN no coordinate-warping augmentation runs before
    quantization). Skips the duplicate-averaging stage; a violated
    declaration is caught by a fail-loud collision check that NaN-poisons
    the features (any warping transform — rotation, affine, elastic, scale —
    can land two voxels in one cell, so configs that bind those transforms
    must keep this False; see co3d_aug*.gin).

    The general path averages duplicates with sorted-run cumulative sums
    (duplicates are adjacent after the key sort): one cumsum + one row
    gather + one compaction scatter, ~3x cheaper than the segment-sum
    formulation it replaces (row-granular scatter-adds are latency-bound
    on TPU). Reference semantics: ME TensorField.sparse() quantization
    averaging (res16unet.py:392).
    """
    n = field.capacity
    vox = jnp.floor(field.coords[:, 1:] / voxel_size).astype(jnp.int32)
    coords = jnp.concatenate(
        [field.coords[:, :1].astype(jnp.int32), vox], axis=1
    )
    hi, lo = packing.pack(coords, field.mask)
    idx = jnp.arange(n, dtype=jnp.int32)
    s_hi, s_lo, s_idx = packing.sort_with_payload(hi, lo, idx)
    s_valid = s_hi != packing.INVALID_KEY
    if assume_unique:
        # the SORT stays (4 ms): downstream row scatters/gathers (densify,
        # row_slot, slicing) rely on spatially-coherent row order — dropping
        # it costs more than the sort.
        dup = (s_hi[1:] == s_hi[:-1]) & (s_lo[1:] == s_lo[:-1]) & s_valid[1:]
        # fail loud on grid-index collisions instead of silently corrupting
        # training (one fused select; free when the declaration holds)
        poison = jnp.where(
            jnp.any(dup),
            jnp.asarray(float("nan"), field.feats.dtype),
            jnp.asarray(1.0, field.feats.dtype),
        )
        sv = SparseVoxels(
            coords=coords[s_idx],
            feats=field.feats[s_idx] * poison,
            mask=s_valid,
            stride=1,
        )
        p2v = jnp.zeros((n,), jnp.int32).at[s_idx].set(idx)
        return sv, p2v
    first = packing.unique_first_occurrence(s_hi, s_lo, s_valid)
    slot = jnp.cumsum(first.astype(jnp.int32)) - 1
    num_unique = jnp.sum(first.astype(jnp.int32))
    slot = jnp.where(s_valid, slot, n - 1)
    out_mask = idx < num_unique
    # run sums via cumulative sums over the sorted rows: run u spanning
    # sorted rows [i, e] has sum csum[e] - csum[i-1]; e = (next first) - 1,
    # and trailing invalid rows contribute zero so e may safely extend to
    # the array end for the last run.
    s_feats = jnp.where(s_valid[:, None], field.feats[s_idx], 0)
    csum = jnp.cumsum(s_feats.astype(jnp.float32), axis=0)
    ccnt = jnp.cumsum(s_valid.astype(jnp.int32))
    pos_next = jnp.concatenate(
        [jnp.where(first, idx, n)[1:], jnp.full((1,), n, jnp.int32)]
    )
    next_first = jax.lax.cummin(pos_next, axis=0, reverse=True)
    end_pos = jnp.clip(next_first - 1, 0, n - 1)
    csum_prev = jnp.concatenate([jnp.zeros((1, csum.shape[1]), csum.dtype),
                                 csum[:-1]])
    ccnt_prev = jnp.concatenate([jnp.zeros((1,), ccnt.dtype), ccnt[:-1]])
    run_sum = csum[end_pos] - csum_prev
    run_cnt = jnp.maximum(ccnt[end_pos] - ccnt_prev, 1)
    avg = (run_sum / run_cnt[:, None]).astype(field.feats.dtype)
    scatter_to = jnp.where(first, slot, n)
    out_feats = (
        jnp.zeros((n + 1, avg.shape[1]), avg.dtype)
        .at[scatter_to]
        .set(avg, mode="drop")[:n]
    )
    out_coords = (
        jnp.zeros((n + 1, 4), coords.dtype)
        .at[scatter_to]
        .set(coords[s_idx], mode="drop")[:n]
    )
    row_to_unique = (
        jnp.zeros((n,), jnp.int32).at[s_idx].set(slot.astype(jnp.int32))
    )
    sv = SparseVoxels(
        coords=out_coords, feats=out_feats, mask=out_mask, stride=1
    )
    return sv, row_to_unique


def slice_field(sv: SparseVoxels, field: PointField) -> PointField:
    """ME ``SparseTensor.slice(tensor_field)`` at any tensor stride: each
    point gathers the features of its enclosing voxel at ``sv.stride``
    (used by the multi-scale FCNN skip concat, fcnn.py:150-155)."""
    n_in = sv.capacity
    hi, lo = packing.pack(sv.coords, sv.mask)
    idx = jnp.arange(n_in, dtype=jnp.int32)
    s_hi, s_lo, s_idx = packing.sort_with_payload(hi, lo, idx)
    vox = (
        jnp.floor(field.coords[:, 1:] / sv.stride).astype(jnp.int32)
        * sv.stride
    )
    q = jnp.concatenate(
        [field.coords[:, :1].astype(jnp.int32), vox], axis=1
    )
    q_hi, q_lo = packing.pack(q, field.mask)
    pos = packing.find(s_hi, s_lo, q_hi, q_lo, missing=n_in)
    s_idx_ext = jnp.concatenate([s_idx, jnp.array([n_in], jnp.int32)])
    rows = s_idx_ext[pos]
    feats_ext = jnp.concatenate(
        [sv.feats, jnp.zeros((1, sv.feats.shape[1]), sv.feats.dtype)]
    )
    return PointField(
        coords=field.coords, feats=feats_ext[rows], mask=field.mask
    )


def sparse_to_field(
    sv: SparseVoxels, field: PointField, point_to_voxel
) -> PointField:
    """Gather voxel features back onto the original points (``.slice()``).

    ``point_to_voxel=None`` marks the identity map (``assume_unique``
    quantization): the gather — and its scatter-add backward — vanish into
    a masked select."""
    if point_to_voxel is None:
        feats = jnp.where(field.mask[:, None], sv.feats, 0)
        return PointField(coords=field.coords, feats=feats, mask=field.mask)
    feats_ext = jnp.concatenate(
        [sv.feats, jnp.zeros((1, sv.feats.shape[1]), sv.feats.dtype)]
    )
    idx = jnp.where(field.mask, point_to_voxel, sv.capacity)
    return PointField(
        coords=field.coords, feats=feats_ext[idx], mask=field.mask
    )
