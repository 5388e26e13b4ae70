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


def pad_offset_groups(offsets: np.ndarray, valid: tuple):
    """Make an arbitrary offset subset windowed-path eligible by padding
    its (dx, dy) groups to uniform size.

    The windowed conv kernels consume per-member in-window indices
    directly (one-hot per member), so a padded slot just needs matches
    that contribute nothing: it repeats the group's FIRST live offset and
    maps to ``weight_row = -1`` — the apply zeroes those weight slots, so
    the duplicate matches multiply by 0. Compute then scales with the
    padded offset count instead of falling back to the dense-masked row
    path: offset-level pruning (the reference's valid_kernel,
    sparse_conv.py:346-379) buys real MXU work savings for ANY layout,
    not just ZAXIS.

    Returns (padded offsets [K'], weight_rows int64[K'] — original offset
    index or -1 for padding).
    """
    offs = np.asarray(offsets)
    groups: dict = {}
    for i in valid:
        dx, dy, _dz = offs[int(i)]
        groups.setdefault((int(dx), int(dy)), []).append(int(i))
    m = max(len(v) for v in groups.values())
    out_offs, rows = [], []
    for idxs in groups.values():
        for i in idxs:
            out_offs.append(offs[i])
            rows.append(i)
        for _ in range(m - len(idxs)):
            out_offs.append(offs[idxs[0]])
            rows.append(-1)
    return np.asarray(out_offs), np.asarray(rows, np.int64)
