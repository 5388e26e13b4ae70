"""Weight-sparse convolution support (reference WeightSparseConvolution,
co3d_3d/src/models/mink/modules/sparse_conv.py:122-152,346-379).

The reference stores pruned per-offset kernels as csr/coo/strided matrices
and skips offsets outside ``valid_kernel`` (ZAXIS hard-codes offsets
[4, 13, 22] — the z-column of a 3^3 kernel). On TPU, unstructured sparsity
inside a kernel matrix buys nothing (the MXU runs dense tiles); the
structured win is *offset-level* skipping — fewer gathers and matmuls. So:

- ``valid_offsets_from_weights``: per-offset liveness from pruned weights
  (host-side, static) — the ``valid_kernel`` computation (:346-379);
- ``zaxis_offsets``: the ZAXIS offset subset;
- conv layers take a static ``valid_offsets`` tuple and subset the offset
  table + weight rows at trace time.

Layouts csr/coo/strided are accepted for CLI parity and all map to the
dense-masked representation.
"""

from __future__ import annotations

import numpy as np


def valid_offsets_from_weights(weights: np.ndarray, tol: float = 0.0):
    """Offsets whose kernel matrix has any surviving weight: [K, Ci, Co] ->
    tuple of live offset indices."""
    w = np.asarray(weights)
    live = np.abs(w).max(axis=(1, 2)) > tol
    return tuple(int(i) for i in np.nonzero(live)[0])


def zaxis_offsets(offsets: np.ndarray):
    """Offsets with dx == dy == 0 (the reference's [4, 13, 22] for k=3)."""
    offs = np.asarray(offsets)
    sel = (offs[:, 0] == 0) & (offs[:, 1] == 0)
    return tuple(int(i) for i in np.nonzero(sel)[0])


def subset_offsets(offsets: np.ndarray, valid: tuple):
    return np.asarray(offsets)[list(valid)]


def sparsity_stats(weights: np.ndarray) -> dict:
    w = np.asarray(weights)
    total = w.size
    zeros = int((w == 0).sum())
    live = valid_offsets_from_weights(w)
    return {
        "total": total,
        "zeros": zeros,
        "density": 1 - zeros / max(total, 1),
        "live_offsets": len(live),
        "kernel_volume": w.shape[0],
    }
