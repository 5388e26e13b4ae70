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
  table + weight rows at trace time;
- ``block_live_from_weights``: per-offset [Cin-block, Cout-block] liveness
  at MXU granularity (128) — the *intra-offset* structured tier. The MXU
  executes 128x128 tiles dense, so sparsity below that granularity buys
  nothing; at/above it, dead blocks skip both their slice of the windowed
  dispatch matmul and their weight matmul
  (ops/pallas/window_gather.py::window_gather_matmul_pallas_bs). This is
  the TPU equivalent of the reference's per-offset csr/coo spmm
  (sparse_conv.py:122-152): compute scales with surviving *structure*,
  with the structure unit sized to the hardware.

Layouts csr/coo/strided are accepted for CLI parity; csr/coo route pruned
checkpoints through offset-level skipping + the block-structured tier,
strided maps to the dense-masked representation.
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


MXU_BLOCK = 128


def block_live_from_weights(
    weights: np.ndarray, block: int = MXU_BLOCK, tol: float = 0.0
) -> np.ndarray:
    """Per-offset block liveness: [K, Ci, Co] -> bool[K, nbi, nbo] where
    block (bi, bo) is live iff any |w| in its (<=block x <=block) tile
    exceeds ``tol``. Edge blocks (Ci/Co not multiples of ``block``) are
    clamped, not padded."""
    w = np.asarray(weights)
    k, ci, co = w.shape
    nbi = -(-ci // block)
    nbo = -(-co // block)
    out = np.zeros((k, nbi, nbo), bool)
    for bi in range(nbi):
        for bo in range(nbo):
            tile = w[
                :, bi * block:(bi + 1) * block, bo * block:(bo + 1) * block
            ]
            out[:, bi, bo] = np.abs(tile).max(axis=(1, 2)) > tol
    return out


def block_live_savings(live: np.ndarray) -> float:
    """Fraction of weight-block compute skipped by the block-structured
    tier (0 = fully dense)."""
    lv = np.asarray(live)
    return 1.0 - lv.sum() / max(lv.size, 1)


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
