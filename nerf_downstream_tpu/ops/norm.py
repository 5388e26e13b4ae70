"""Masked normalization statistics for padded sparse rows.

BatchNorm over a SparseVoxels must ignore padding rows; with a mesh axis
name the statistics are ``psum``-reduced across replicas, which *is*
SyncBatchNorm (reference: ME.MinkowskiSyncBatchNorm.convert_sync_batchnorm at
co3d_3d/train.py:106-107) — on TPU it's one flag on the same op, not a
separate module tree conversion.

These are pure functions; the flax modules in ``models/mink/layers.py`` own
the running statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean_var(
    feats: jax.Array, mask: jax.Array, axis_name: str | None = None,
    return_count: bool = False,
):
    """Mean/var over valid rows per channel; optionally psum across replicas.

    ``feats`` may have any leading shape ([..., C]) with ``mask`` matching
    the leading dims — rows or 5-D block cells alike (reductions are
    layout-free, so the cells never round-trip through a flat view).

    With ``return_count=True`` also returns the (psum'd) valid-row count so
    callers can form the unbiased variance for running statistics (torch BN
    updates running_var with the n/(n-1) estimate)."""
    m = mask.astype(jnp.float32)[..., None]
    f = feats.astype(jnp.float32)
    axes = tuple(range(f.ndim - 1))
    cnt = jnp.sum(m)
    s1 = jnp.sum(f * m, axis=axes)
    s2 = jnp.sum(f * f * m, axis=axes)
    if axis_name is not None:
        cnt = jax.lax.psum(cnt, axis_name)
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
    cnt = jnp.maximum(cnt, 1.0)
    mean = s1 / cnt
    var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
    if return_count:
        return mean, var, cnt
    return mean, var


def batch_norm_apply(feats, mean, var, scale, bias, eps=1e-5):
    inv = jax.lax.rsqrt(var + eps)
    out = (feats.astype(jnp.float32) - mean) * inv
    return (out * scale + bias).astype(feats.dtype)


def layer_norm(feats, scale, bias, eps=1e-5):
    """Per-row LayerNorm over channels (reference MinkowskiLayerNorm,
    mink/modules/layernorm.py:6-38)."""
    f = feats.astype(jnp.float32)
    mean = jnp.mean(f, axis=-1, keepdims=True)
    var = jnp.mean((f - mean) ** 2, axis=-1, keepdims=True)
    out = (f - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale + bias).astype(feats.dtype)


def instance_norm_stats(
    feats: jax.Array, batch_ids: jax.Array, num_batches: int
):
    """Per-(batch-element, channel) mean/var via segment sums (replaces
    ME.MinkowskiInstanceNorm)."""
    f = feats.astype(jnp.float32)
    ns = num_batches + 1
    cnt = jax.ops.segment_sum(
        jnp.ones((f.shape[0],), jnp.float32), batch_ids, num_segments=ns
    )
    s1 = jax.ops.segment_sum(f, batch_ids, num_segments=ns)
    s2 = jax.ops.segment_sum(f * f, batch_ids, num_segments=ns)
    cnt = jnp.maximum(cnt, 1.0)[:, None]
    mean = s1 / cnt
    var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
    # broadcast back to rows
    return mean[batch_ids], var[batch_ids]
