"""Trilinear splat / interpolation between point fields and voxel sets.

Replaces ME ``TensorField.splat()`` / ``SparseTensor.interpolate()`` /
``MinkowskiInterpolation`` (used by MinkowskiSplatFCNN, fcnn.py:169-208, and
the Perlin transform). Each point couples to the 8 surrounding voxel corners
with trilinear weights; splat scatter-adds point features into voxels,
interpolate gathers voxel features back to points.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from nerf_downstream_tpu.sparse import packing

_CORNERS = np.array(
    list(itertools.product((0, 1), repeat=3)), np.int32
)  # [8, 3]


def _corner_weights(frac: jax.Array) -> jax.Array:
    """frac [N,3] in [0,1) -> weights [8,N]."""
    c = jnp.asarray(_CORNERS, jnp.float32)  # [8,3]
    w = jnp.where(
        c[:, None, :] == 1, frac[None, :, :], 1.0 - frac[None, :, :]
    )
    return jnp.prod(w, axis=-1)


def _corner_coords(field_coords, stride):
    """Integer corner voxel coords for each (point, corner): [8, N, 4]."""
    base = jnp.floor(field_coords[:, 1:] / stride).astype(jnp.int32)
    frac = field_coords[:, 1:] / stride - base.astype(field_coords.dtype)
    corners = (base[None, :, :] + _CORNERS[:, None, :]) * stride
    b = jnp.broadcast_to(
        field_coords[None, :, :1].astype(jnp.int32), corners.shape[:2] + (1,)
    )
    return jnp.concatenate([b, corners], axis=-1), frac.astype(jnp.float32)


def interpolate(sv_coords, sv_mask, sv_feats, sv_stride, field):
    """Trilinear gather of voxel features at continuous point locations."""
    n_in = sv_coords.shape[0]
    hi, lo = packing.pack(sv_coords, sv_mask)
    idx = jnp.arange(n_in, dtype=jnp.int32)
    s_hi, s_lo, s_idx = packing.sort_with_payload(hi, lo, idx)
    corners, frac = _corner_coords(field.coords, sv_stride)
    q = corners.reshape(-1, 4)
    q_mask = jnp.broadcast_to(
        field.mask[None, :], corners.shape[:2]
    ).reshape(-1)
    q_hi, q_lo = packing.pack(q, q_mask)
    pos = packing.find(s_hi, s_lo, q_hi, q_lo, missing=n_in)
    s_idx_ext = jnp.concatenate([s_idx, jnp.array([n_in], jnp.int32)])
    rows = s_idx_ext[pos].reshape(8, -1)  # [8, N]
    weights = _corner_weights(frac)  # [8, N]
    found = (rows < n_in).astype(jnp.float32)
    weights = weights * found
    feats_ext = jnp.concatenate(
        [sv_feats, jnp.zeros((1, sv_feats.shape[1]), sv_feats.dtype)]
    )
    out = jnp.einsum(
        "kn,knc->nc", weights, feats_ext[rows].astype(jnp.float32)
    )
    return out.astype(sv_feats.dtype)


def splat(field, out_coords, out_mask, out_stride):
    """Trilinear scatter of point features onto voxel rows.

    ``out_coords`` must contain the corner voxels (built by the caller from
    the same field, e.g. via unique of all 8 corners)."""
    n_out = out_coords.shape[0]
    hi, lo = packing.pack(out_coords, out_mask)
    idx = jnp.arange(n_out, dtype=jnp.int32)
    s_hi, s_lo, s_idx = packing.sort_with_payload(hi, lo, idx)
    corners, frac = _corner_coords(field.coords, out_stride)
    q = corners.reshape(-1, 4)
    q_mask = jnp.broadcast_to(
        field.mask[None, :], corners.shape[:2]
    ).reshape(-1)
    q_hi, q_lo = packing.pack(q, q_mask)
    pos = packing.find(s_hi, s_lo, q_hi, q_lo, missing=n_out)
    s_idx_ext = jnp.concatenate([s_idx, jnp.array([n_out], jnp.int32)])
    rows = s_idx_ext[pos].reshape(8, -1)
    weights = _corner_weights(frac) * (rows < n_out)
    # scatter-add all 8*N contributions
    flat_rows = rows.reshape(-1)
    masked = jnp.where(field.mask[:, None], field.feats, 0)
    flat_contrib = weights.reshape(-1)[:, None] * jnp.tile(masked, (8, 1))
    out = (
        jnp.zeros((n_out + 1, field.feats.shape[1]), jnp.float32)
        .at[flat_rows]
        .add(flat_contrib, mode="drop")[:n_out]
    )
    return out.astype(field.feats.dtype)
