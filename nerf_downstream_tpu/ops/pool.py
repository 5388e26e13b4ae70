"""Sparse poolings: strided window poolings and global batch poolings.

Replaces ME MinkowskiSum/Avg/Max/GlobalAvg/GlobalMax pooling (reference use:
resnet.py stem SumPooling, fcnn.py GlobalMaxAvgPool fcnn.py:9-18). Window
poolings reuse the same kernel-map machinery as convolution; global poolings
are ``segment_sum``/``segment_max`` over batch indices — XLA's native
replacement for ME's CUDA reduction kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gathered(feats, kernel_map):
    n_in, c = feats.shape
    feats_ext = jnp.concatenate([feats, jnp.zeros((1, c), feats.dtype)], 0)
    return feats_ext, n_in


def window_pool(
    feats: jax.Array, kernel_map: jax.Array, mode: str = "avg"
) -> jax.Array:
    """Pool over kernel-map neighbors. mode in {sum, avg, max}.

    Returns [N_out, C]. Missing neighbors are ignored; avg divides by the
    count of present neighbors; max of an empty window is 0.
    """
    feats_ext, n_in = _gathered(feats, kernel_map)
    c = feats.shape[1]
    k, n_out = kernel_map.shape

    if mode == "max":
        neg = jnp.finfo(feats.dtype).min

        def step(acc, idx_k):
            g = feats_ext[idx_k]
            found = (idx_k < n_in)[:, None]
            acc = jnp.maximum(acc, jnp.where(found, g, neg))
            return acc, None

        acc, _ = jax.lax.scan(
            step, jnp.full((n_out, c), neg, feats.dtype), kernel_map
        )
        return jnp.where(acc == neg, 0, acc)

    def step(carry, idx_k):
        acc, cnt = carry
        g = feats_ext[idx_k]
        found = (idx_k < n_in).astype(feats.dtype)
        return (acc + g, cnt + found), None

    (acc, cnt), _ = jax.lax.scan(
        step,
        (jnp.zeros((n_out, c), feats.dtype), jnp.zeros((n_out,), feats.dtype)),
        kernel_map,
    )
    if mode == "sum":
        return acc
    if mode == "avg":
        return acc / jnp.maximum(cnt, 1)[:, None]
    raise ValueError(f"unknown pool mode {mode!r}")


def global_pool(
    feats: jax.Array,
    batch_ids: jax.Array,
    num_batches: int,
    mode: str = "avg",
) -> jax.Array:
    """Global pooling per batch element -> dense [B, C].

    ``batch_ids`` must map padding rows to ``num_batches`` (see
    ``SparseVoxels.batch_ids``).
    """
    if mode == "max":
        out = jax.ops.segment_max(
            feats, batch_ids, num_segments=num_batches + 1
        )[:num_batches]
        return jnp.where(jnp.isfinite(out), out, 0)
    sums = jax.ops.segment_sum(
        feats, batch_ids, num_segments=num_batches + 1
    )[:num_batches]
    if mode == "sum":
        return sums
    if mode == "avg":
        cnt = jax.ops.segment_sum(
            jnp.ones_like(batch_ids, feats.dtype),
            batch_ids,
            num_segments=num_batches + 1,
        )[:num_batches]
        return sums / jnp.maximum(cnt, 1)[:, None]
    raise ValueError(f"unknown pool mode {mode!r}")
