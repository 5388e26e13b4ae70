"""Window-coverage span probe for the flagship bench workload.

Answers "what coverage does each level's same-set window plan need?" by
computing, per (offset-group, tile), the input-rank span ``emax - qstart``
that the windowed conv must cover — the exact boundary logic of
``ops/window_conv.py::build_plan_direct`` — then tabulating how many
(group, tile) pairs escape at candidate coverages.  These numbers size
``CoordinateContext.window_blocks`` / ``window_escape_cap`` /
``window_escape_tiles`` in ``bench.py`` and
``co3d_3d/configs/scannet_plenoxel.gin`` (see BASELINE.md / ROADMAP.md).

``--permute N`` re-runs the stride-1..16 stats over N random scene-order
permutations of the same batch: scene order shifts every scene's row
offsets, so outlier tiles can exceed the coverage at ANY level — the
shuffle-robustness finding that moved the escape caps from stride-1-only
to per-level (ROADMAP "Convergence validation + shuffle robustness").

Run (CPU is fine — pure plan geometry, no conv):
    JAX_PLATFORMS=cpu python scratch/probe_spans.py [--permute 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

COVERAGES = (256, 384, 512, 640, 768, 1024, 1536)


def level_coords(batch, stride: int) -> np.ndarray:
    """Valid (b, x, y, z) int rows of the stride-``stride`` level, unique and
    floor-coarsened the way the model's level transitions coarsen (coords
    stay in finest-voxel units, ME convention)."""
    coords = np.asarray(batch["coordinates"])
    mask = np.asarray(batch["mask"]).astype(bool)
    c = coords[mask]
    v = np.floor(c[:, 1:]).astype(np.int64)
    b = c[:, :1].astype(np.int64)
    v = (v // stride) * stride
    rows = np.concatenate([b, v], 1)
    return np.unique(rows, axis=0)


def span_stats(rows: np.ndarray, stride: int, tile: int, window: int):
    """Per-(group, tile) coverage spans via the build_plan_direct boundary
    recipe: lower_bound of each offset's shifted tile-boundary keys, group
    min/max, cummax'd quantized starts."""
    import jax
    import jax.numpy as jnp

    from nerf_downstream_tpu.ops.window_conv import group_offsets
    from nerf_downstream_tpu.sparse import packing
    from nerf_downstream_tpu.sparse.kernels import kernel_offsets

    n_valid = rows.shape[0]
    cap = max(tile, 1 << int(np.ceil(np.log2(max(n_valid, tile)))))
    coords = np.zeros((cap, 4), np.int32)
    coords[:n_valid] = rows
    mask = np.arange(cap) < n_valid
    hi, lo = packing.pack(jnp.asarray(coords), jnp.asarray(mask))
    hi, lo, _ = packing.sort_with_payload(hi, lo, jnp.arange(cap))

    offs = kernel_offsets(3, stride)
    groups = group_offsets(offs)
    deltas = [packing.offset_delta(d) for d in offs]
    nt = cap // tile
    b_hi, b_lo = hi[::tile], lo[::tile]
    b_valid = (jnp.arange(nt) * tile) < n_valid
    bnd = []
    for d_hi, d_lo in deltas:
        qh, ql = packing.shift_keys(b_hi, b_lo, d_hi, d_lo, mask=b_valid)
        bnd.append(packing.lower_bound(hi, lo, qh, ql))
    bnd = jnp.where(b_valid[None, :], jnp.stack(bnd), n_valid)
    bnd = jnp.concatenate(
        [bnd, jnp.full((len(offs), 1), n_valid, jnp.int32)], 1
    )
    perm = jnp.asarray([i for g in groups for i in g])
    m = len(groups[0])
    bnd_g = bnd[perm].reshape(len(groups), m, nt + 1)
    smin = jnp.min(bnd_g[:, :, :-1], axis=1)
    emax = jnp.max(bnd_g[:, :, 1:], axis=1)
    starts = jnp.maximum(jax.lax.cummax(smin, axis=1), 0)
    starts = (starts // window) * window
    occupied = b_valid[None, :] & (smin < n_valid)
    spans = np.asarray(jnp.where(occupied, emax - starts, 0))
    return spans, int(occupied.sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--permute", type=int, default=0)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--window", type=int, default=128)
    args = ap.parse_args()

    import bench

    rng = np.random.default_rng(0)
    raw = bench.make_batch(rng)

    def one(batch, label):
        print(f"== {label} (tile={args.tile}, window quantum={args.window})")
        for stride in (1, 2, 4, 8, 16):
            rows = level_coords(batch, stride)
            spans, n_occ = span_stats(rows, stride, args.tile, args.window)
            flat = spans[spans > 0]
            esc = {
                c: int((flat > c).sum()) for c in COVERAGES
            }
            print(
                f"stride {stride:>2}: rows {rows.shape[0]:>6}  "
                f"tile-groups {n_occ:>5}  span p50/p99/max "
                f"{int(np.percentile(flat, 50))}/"
                f"{int(np.percentile(flat, 99))}/{int(flat.max())}  "
                "escapes@cov "
                + " ".join(f"{c}:{v}" for c, v in esc.items())
            )

    one(raw, "fixed scene order")
    for p in range(args.permute):
        order = rng.permutation(bench.SCENES)
        coords = np.asarray(raw["coordinates"]).copy()
        bidx = coords[:, 0].astype(int)
        remap = np.argsort(order)
        coords[:, 0] = remap[np.clip(bidx, 0, bench.SCENES - 1)]
        batch = dict(raw, coordinates=coords)
        one(batch, f"scene permutation {p} ({order.tolist()})")


if __name__ == "__main__":
    main()
