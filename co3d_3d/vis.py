"""Dataset visualizer (reference co3d_3d/vis.py:12-73): open3d viewer over
any gin-selected dataset with a density colormap and percentile filter.

open3d is not installed in this image; the CLI degrades to exporting a PLY
file you can open elsewhere.
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

from nerf_downstream_tpu import config as gin
from nerf_downstream_tpu.data.datasets import get_dataset


def density_colormap(values: np.ndarray) -> np.ndarray:
    """Map scalars to a blue->red colormap in [0,1]."""
    v = np.asarray(values, np.float64).reshape(-1)
    lo, hi = v.min(), v.max()
    t = (v - lo) / (hi - lo + 1e-12)
    colors = np.stack([t, 0.2 * np.ones_like(t), 1 - t], axis=1)
    return colors


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ginc", action="append")
    parser.add_argument("--ginb", action="append")
    parser.add_argument("--phase", type=str, default="train")
    parser.add_argument("--index", type=int, default=0)
    parser.add_argument("--density_percentile", type=float, default=0.0)
    parser.add_argument("--out", type=str, default=None, help="PLY export path")
    args = parser.parse_args(argv)
    gin.parse_config_files_and_bindings(args.ginc, args.ginb)

    dataset = get_dataset()(phase=args.phase)
    sample = dataset[args.index]
    coords = np.asarray(sample["coordinates"], np.float64)
    feats = np.asarray(sample["features"])
    density = feats[:, :1] if feats.shape[1] >= 1 else np.ones((len(coords), 1))
    if args.density_percentile > 0:
        ths = np.percentile(density, args.density_percentile * 100)
        keep = density.reshape(-1) > ths
        coords, density = coords[keep], density[keep]
    colors = density_colormap(density)

    try:
        import open3d as o3d

        pcd = o3d.geometry.PointCloud()
        pcd.points = o3d.utility.Vector3dVector(coords)
        pcd.colors = o3d.utility.Vector3dVector(colors)
        o3d.visualization.draw_geometries([pcd])
    except ImportError:
        out = args.out or "vis_export.ply"
        from nerf_downstream_tpu.data.ply import write_ply

        write_ply(out, coords, (colors * 255).astype(np.uint8))
        logging.warning(f"open3d unavailable; wrote {out}")


if __name__ == "__main__":
    main()
