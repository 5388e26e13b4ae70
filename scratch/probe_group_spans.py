"""Per-GROUP window-span stats: sizes a per-group coverage design.

The fwd/bwd window kernels pay dispatch FLOPs proportional to
sum_g coverage_g x N x M x C; today every group uses the same coverage
(window_blocks x window_size). If the (0,0) group's spans are tiny and
only the (+-1, *) groups need the full reach, per-group coverage cuts the
dominant dispatch matmul cost. This probe prints span quantiles PER GROUP
(dx,dy) for each stride level of the bench workload, over scene
permutations (the shuffle-robustness worst case).

Run: JAX_PLATFORMS=cpu python scratch/probe_group_spans.py [--permute 4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from probe_spans import level_coords, span_stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--permute", type=int, default=4)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--window", type=int, default=128)
    args = ap.parse_args()

    import bench
    from nerf_downstream_tpu.ops.window_conv import group_offsets
    from nerf_downstream_tpu.sparse.kernels import kernel_offsets

    rng = np.random.default_rng(0)
    raw = bench.make_batch(rng)

    batches = [("fixed", raw)]
    for p in range(args.permute):
        order = rng.permutation(bench.SCENES)
        coords = np.asarray(raw["coordinates"]).copy()
        bidx = coords[:, 0].astype(int)
        remap = np.argsort(order)
        coords[:, 0] = remap[np.clip(bidx, 0, bench.SCENES - 1)]
        batches.append((f"perm{p}", dict(raw, coordinates=coords)))

    for stride in (1, 2, 4):
        offs = kernel_offsets(3, stride)
        groups = group_offsets(offs)
        # group label = (dx, dy) of its first member in offset units
        labels = [tuple((offs[g[0]][:2] // stride).tolist()) for g in groups]
        per_group = None
        for _, batch in batches:
            rows = level_coords(batch, stride)
            spans, _ = span_stats(rows, stride, args.tile, args.window)
            if per_group is None:
                per_group = [[] for _ in range(spans.shape[0])]
            for g in range(spans.shape[0]):
                s = spans[g][spans[g] > 0]
                per_group[g].append(s)
        print(f"== stride {stride}")
        for g, lab in enumerate(labels):
            s = np.concatenate(per_group[g])
            print(
                f"  group {lab}: span p50/p90/p99/max "
                f"{int(np.percentile(s, 50))}/{int(np.percentile(s, 90))}/"
                f"{int(np.percentile(s, 99))}/{int(s.max())}  "
                f"(n={s.size})"
            )


if __name__ == "__main__":
    main()
