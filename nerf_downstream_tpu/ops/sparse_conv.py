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

import jax
import jax.numpy as jnp


def sparse_conv_apply(
    feats: jax.Array,
    kernel_map: jax.Array,
    weights: jax.Array,
    bias: jax.Array | None = None,
    compute_dtype=jnp.float32,
    unroll: int = 1,
) -> jax.Array:
    """Apply a sparse convolution given a precomputed kernel map.

    Args:
      feats: [N_in, Cin] input features (padding rows may hold garbage; they
        are never referenced because kernel maps only point at valid rows).
      kernel_map: int32[K, N_out]; entries == N_in mean "no neighbor".
      weights: [K, Cin, Cout].
      bias: optional [Cout].
      compute_dtype: dtype for the gathered operand and weights (bf16 on TPU).
      unroll: scan unroll factor.

    Returns [N_out, Cout] float32.
    """
    n_in, cin = feats.shape
    k, n_out = kernel_map.shape
    cout = weights.shape[-1]
    feats_ext = jnp.concatenate(
        [feats, jnp.zeros((1, cin), feats.dtype)], axis=0
    ).astype(compute_dtype)
    w = weights.astype(compute_dtype)

    if k == 1:
        # kernel-volume-1 fast path: plain matmul
        # (reference sparse_conv.py:391-395)
        gathered = feats_ext[kernel_map[0]]
        out = jnp.dot(gathered, w[0], preferred_element_type=jnp.float32)
    else:
        def step(acc, xs):
            w_k, idx_k = xs
            gathered = feats_ext[idx_k]
            acc = acc + jnp.dot(
                gathered, w_k, preferred_element_type=jnp.float32
            )
            return acc, None

        out, _ = jax.lax.scan(
            step,
            jnp.zeros((n_out, cout), jnp.float32),
            (w, kernel_map),
            unroll=unroll,
        )
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
