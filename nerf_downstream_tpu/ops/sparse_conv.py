"""Sparse convolution: gather -> MXU matmul -> accumulate.

The reference computes sparse conv as per-offset gather-GEMM-scatter over
CUDA kernel maps (MinkowskiEngine native conv; custom path at
co3d_3d/src/models/mink/modules/sparse_conv.py:122-152). The TPU-native
formulation here keeps shapes static: for each kernel offset ``k`` the dense
index table ``kernel_map[k]`` (int32[N_out], sentinel N_in) selects input
rows; a zero sentinel row makes missing neighbors contribute nothing, so

    out = sum_k  take(feats ++ [0], kernel_map[k]) @ W[k]

i.e. K gathers feeding K ``[N, Cin] @ [Cin, Cout]`` MXU matmuls, accumulated
in f32 by a ``lax.scan``. Inputs are cast to ``compute_dtype`` (bfloat16 on
TPU) while accumulation stays f32 (``preferred_element_type``).

Transposed conv uses the adjoint kernel map (offsets negated, or the scatter
inversion of a cached forward map) with its own weights, matching
ME ConvolutionTranspose / reference sparse_conv.py:427-560.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _conv_fwd_impl(feats_ext, kernel_map, w):
    """out = sum_k take(feats_ext, idx_k) @ w_k, f32 accumulation."""
    n_out = kernel_map.shape[1]
    cout = w.shape[-1]

    def step(acc, xs):
        w_k, idx_k = xs
        gathered = feats_ext[idx_k]
        return acc + jnp.dot(
            gathered, w_k, preferred_element_type=jnp.float32
        ), None

    out, _ = jax.lax.scan(
        step, jnp.zeros((n_out, cout), jnp.float32), (w, kernel_map)
    )
    return out


@jax.custom_vjp
def _sparse_conv_core(feats_ext, kernel_map, w):
    return _conv_fwd_impl(feats_ext, kernel_map, w)


def _core_fwd(feats_ext, kernel_map, w):
    # Residuals are only the inputs: the backward pass *recomputes* the
    # per-offset gathers instead of letting autodiff stack [K, N, Cin]
    # activations (which OOMs HBM on real scene sizes).
    return _conv_fwd_impl(feats_ext, kernel_map, w), (feats_ext, kernel_map, w)


def _core_bwd(res, g):
    feats_ext, kernel_map, w = res
    n_ext, cin = feats_ext.shape
    gc = g.astype(w.dtype)

    def step(d_feats, xs):
        w_k, idx_k = xs
        # dX += scatter_add(g @ W_k^T) at the gathered rows
        contrib = jnp.dot(gc, w_k.T, preferred_element_type=jnp.float32)
        d_feats = d_feats.at[idx_k].add(contrib, mode="drop")
        # dW_k = take(x, idx_k)^T @ g   (gather recomputed)
        gathered = feats_ext[idx_k]
        d_w = jnp.dot(
            gathered.T, gc, preferred_element_type=jnp.float32
        )
        return d_feats, d_w

    d_feats, d_ws = jax.lax.scan(
        step, jnp.zeros((n_ext, cin), jnp.float32), (w, kernel_map)
    )
    # sentinel row gradients vanish
    d_feats = d_feats.at[n_ext - 1].set(0.0)
    return d_feats.astype(feats_ext.dtype), None, d_ws.astype(w.dtype)


_sparse_conv_core.defvjp(_core_fwd, _core_bwd)


@jax.custom_vjp
def _sparse_conv_core_inv(feats_ext, kernel_map, inv_map, w):
    return _conv_fwd_impl(feats_ext, kernel_map, w)


def _core_inv_fwd(feats_ext, kernel_map, inv_map, w):
    return _conv_fwd_impl(feats_ext, kernel_map, w), (
        feats_ext, kernel_map, inv_map, w,
    )


def _core_inv_bwd(res, g):
    """d_feats via the inverted map: gathers instead of scatter-adds (TPU
    scatters cost ~2x a gather). inv_map[k, i] = output row whose offset-k
    neighbor is input row i (sentinel = N_out)."""
    feats_ext, kernel_map, inv_map, w = res
    n_ext, cin = feats_ext.shape
    n_out = g.shape[0]
    gc = g.astype(w.dtype)
    g_ext = jnp.concatenate([gc, jnp.zeros((1, gc.shape[1]), gc.dtype)], 0)

    def dx_step(acc, xs):
        w_k, inv_k = xs
        picked = g_ext[inv_k]  # [N_in, Cout]
        return acc + jnp.dot(
            picked, w_k.T, preferred_element_type=jnp.float32
        ), None

    d_feats_in, _ = jax.lax.scan(
        dx_step,
        jnp.zeros((inv_map.shape[1], cin), jnp.float32),
        (w, inv_map),
    )
    d_feats = jnp.zeros((n_ext, cin), jnp.float32).at[: inv_map.shape[1]].set(
        d_feats_in
    )
    d_feats = d_feats.at[n_ext - 1].set(0.0)

    def dw_step(_, xs):
        w_k, idx_k = xs
        gathered = feats_ext[idx_k]
        return None, jnp.dot(
            gathered.T, gc, preferred_element_type=jnp.float32
        )

    _, d_ws = jax.lax.scan(dw_step, None, (w, kernel_map))
    return d_feats.astype(feats_ext.dtype), None, None, d_ws.astype(w.dtype)


_sparse_conv_core_inv.defvjp(_core_inv_fwd, _core_inv_bwd)


def sparse_conv_apply(
    feats: jax.Array,
    kernel_map: jax.Array,
    weights: jax.Array,
    bias: jax.Array | None = None,
    compute_dtype=jnp.float32,
    unroll: int = 1,
    inv_map: jax.Array | None = None,
) -> jax.Array:
    """Apply a sparse convolution given a precomputed kernel map.

    Args:
      feats: [N_in, Cin] input features (padding rows may hold garbage; they
        are never referenced because kernel maps only point at valid rows).
      kernel_map: int32[K, N_out]; entries == N_in mean "no neighbor".
      weights: [K, Cin, Cout].
      bias: optional [Cout].
      compute_dtype: dtype for the gathered operand and weights (bf16 on TPU).
      unroll: scan unroll factor (reserved).

    Returns [N_out, Cout] float32. Backward recomputes gathers (custom VJP)
    so memory stays O(N*C) instead of O(K*N*C).
    """
    n_in, cin = feats.shape
    k, n_out = kernel_map.shape
    feats_ext = jnp.concatenate(
        [feats, jnp.zeros((1, cin), feats.dtype)], axis=0
    ).astype(compute_dtype)
    w = weights.astype(compute_dtype)

    if k == 1:
        # kernel-volume-1 fast path: plain matmul
        # (reference sparse_conv.py:391-395)
        gathered = feats_ext[kernel_map[0]]
        out = jnp.dot(gathered, w[0], preferred_element_type=jnp.float32)
    elif inv_map is not None:
        out = _sparse_conv_core_inv(feats_ext, kernel_map, inv_map, w)
    else:
        out = _sparse_conv_core(feats_ext, kernel_map, w)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out


def kernel_map_pairs(kernel_map: jax.Array, n_in: int) -> jax.Array:
    """Number of real (input, output) pairs in a kernel map."""
    return jnp.sum((kernel_map < n_in).astype(jnp.int32))


def sparse_conv_real_flops(
    kernel_map: jax.Array, n_in: int, cin: int, cout: int
) -> jax.Array:
    """FLOPs over real neighbor pairs — the reference-comparable ``_flops``
    accounting (sparse_conv.py:111,390-420): 2 * pairs * Cin * Cout."""
    return 2 * kernel_map_pairs(kernel_map, n_in) * cin * cout
