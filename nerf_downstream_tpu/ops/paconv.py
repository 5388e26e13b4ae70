"""PAConv assign-score ops — TPU replacement for the reference's in-repo
CUDA extension (co3d_3d/src/models/paconv/cuda_lib/src/gpu/
assign_score_withk_gpu.cu:28-220 and the halfkernel twin).

    out[b, n, o] = sum_{k, m} score[b,n,k,m] *
                   (points[b, knn[b,n,k], m, o] - centers[b,n,m,o])

Forward scans over k (gather -> einsum -> accumulate) so only one
[B,N,M,O] slab is live; the custom VJP mirrors the two CUDA backward
kernels (scatter-add for d_points/d_centers, recomputed gathers for
d_scores) instead of letting autodiff stack per-k residuals.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gather_points(points, idx_k):
    """points [B, Np, M, O], idx_k [B, N] -> [B, N, M, O]."""
    return jnp.take_along_axis(
        points, idx_k[:, :, None, None], axis=1
    )


def _fwd_impl(scores, points, centers, knn_idx):
    b, n, k, m = scores.shape
    o = points.shape[-1]

    def step(acc, kk):
        idx_k = knn_idx[:, :, kk]
        g = _gather_points(points, idx_k)
        if centers is not None:
            g = g - centers
        acc = acc + jnp.einsum(
            "bnm,bnmo->bno", scores[:, :, kk, :], g,
            preferred_element_type=jnp.float32,
        )
        return acc, None

    out, _ = jax.lax.scan(
        step, jnp.zeros((b, n, o), jnp.float32), jnp.arange(k)
    )
    return out.astype(points.dtype)


@partial(jax.custom_vjp, nondiff_argnums=())
def _assign_score_full(scores, points, centers, knn_idx):
    return _fwd_impl(scores, points, centers, knn_idx)


def _full_fwd(scores, points, centers, knn_idx):
    return _fwd_impl(scores, points, centers, knn_idx), (
        scores, points, centers, knn_idx,
    )


def _full_bwd(res, g):
    scores, points, centers, knn_idx = res
    b, n, k, m = scores.shape
    o = points.shape[-1]
    gf = g.astype(jnp.float32)

    def step(carry, kk):
        d_scores, d_points = carry
        idx_k = knn_idx[:, :, kk]
        gathered = _gather_points(points, idx_k).astype(jnp.float32)
        diff = gathered - centers if centers is not None else gathered
        ds_k = jnp.einsum("bno,bnmo->bnm", gf, diff)
        d_scores = d_scores.at[:, :, kk, :].set(ds_k)
        contrib = jnp.einsum(
            "bnm,bno->bnmo", scores[:, :, kk, :].astype(jnp.float32), gf
        )
        d_points = _scatter_add(d_points, idx_k, contrib)
        return (d_scores, d_points), None

    init = (
        jnp.zeros_like(scores, jnp.float32),
        jnp.zeros(points.shape, jnp.float32),
    )
    (d_scores, d_points), _ = jax.lax.scan(step, init, jnp.arange(k))
    if centers is not None:
        s_sum = jnp.sum(scores, axis=2).astype(jnp.float32)  # [B,N,M]
        d_centers = -jnp.einsum("bnm,bno->bnmo", s_sum, gf)
        d_centers = d_centers.astype(centers.dtype)
    else:
        d_centers = None
    return (
        d_scores.astype(scores.dtype),
        d_points.astype(points.dtype),
        d_centers,
        None,
    )


def _scatter_add(d_points, idx_k, contrib):
    """d_points [B, Np, M, O] += contrib [B, N, M, O] at rows idx_k [B, N]."""
    b = d_points.shape[0]
    bidx = jnp.broadcast_to(
        jnp.arange(b)[:, None], idx_k.shape
    ).reshape(-1)
    rows = idx_k.reshape(-1)
    flat = contrib.reshape((-1,) + contrib.shape[2:])
    return d_points.at[bidx, rows].add(flat)


_assign_score_full.defvjp(_full_fwd, _full_bwd)


def assign_score_withk(scores, points, centers, knn_idx, aggregate="sum"):
    """Full kernel: subtracts per-point centers (operator 'forward')."""
    assert aggregate == "sum"
    return _assign_score_full(scores, points, centers, knn_idx)


def assign_score_withk_halfkernel(scores, points, knn_idx, aggregate="sum"):
    """Halfkernel variant: no centers (assign_score_withk_halfkernel_gpu.cu)."""
    assert aggregate == "sum"
    return _assign_score_full(scores, points, None, knn_idx)


def assign_score_withk_reference(scores, points, centers, knn_idx):
    """Naive einsum reference (materializes [B,N,K,M,O]) for testing."""
    b, n, k = knn_idx.shape
    g = jax.vmap(
        lambda p, i: p[i], in_axes=(0, 0)
    )(points, knn_idx.reshape(b, -1)).reshape(
        b, n, k, points.shape[2], points.shape[3]
    )
    if centers is not None:
        g = g - centers[:, :, None]
    return jnp.einsum("bnkm,bnkmo->bno", scores, g)
