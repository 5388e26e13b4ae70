"""ScanNet preprocessing: Plenoxel ckpt + GT mesh PLY -> labeled data.npz
(reference co3d_3d/scripts/preprocess_scannet.py:14-188).

Per scene: decode voxel coords, normalize to [-1,1], undo the scene
transform (T^-1, scene_scale), 1-NN label + distance transfer from the GT
point cloud via a KD-tree, write npz with labels + fp16 dists. Failed scenes
are excluded from regenerated split files.
"""

from __future__ import annotations

import argparse
import logging
import os
import pickle

import numpy as np
from scipy.spatial import cKDTree

from nerf_downstream_tpu.data import plenoxel
from nerf_downstream_tpu.data.ply import load_ply


def assign_labels(voxel_xyz: np.ndarray, gt_xyz: np.ndarray,
                  gt_labels: np.ndarray):
    """1-NN label + distance transfer (reference assign_label :14-68)."""
    tree = cKDTree(gt_xyz)
    dists, idx = tree.query(voxel_xyz, k=1)
    return gt_labels[idx].astype(np.int32), dists.astype(np.float16)


def preprocess_scene(scene_dir: str, gt_ply: str, scene_scale: float,
                     transform: np.ndarray | None = None,
                     overwrite: bool = False) -> bool:
    out_path = os.path.join(scene_dir, "data.npz")
    if os.path.exists(out_path) and not overwrite:
        return True
    data = plenoxel.load_scene(scene_dir)
    coords = plenoxel.decode_links(data["links"], data["reso"])
    reso = np.asarray(data["reso"], np.float64)
    norm = coords / reso * 2 - 1.0  # [-1, 1] grid coords
    world = norm / scene_scale
    if transform is not None:
        world = (
            np.linalg.inv(transform)
            @ np.concatenate([world, np.ones((len(world), 1))], 1).T
        ).T[:, :3]
    gt_xyz, _, gt_labels = load_ply(gt_ply, load_label=True)
    labels, dists = assign_labels(world, gt_xyz, gt_labels)
    plenoxel.save_npz(
        out_path, coords, data["density"], data["sh"], data["reso"],
        labels=labels, dists=dists,
    )
    return True


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, required=True,
                        help="dir with plenoxel_torch_<scene>/")
    parser.add_argument("--scannet_root", type=str, required=True,
                        help="dir with <scene>_vh_clean_2.labels.ply files")
    parser.add_argument("--split_dir", type=str, required=True)
    parser.add_argument("--overwrite", action="store_true")
    args = parser.parse_args(argv)

    scales_path = os.path.join(args.split_dir, "scene_scales.data")
    scales = {}
    if os.path.exists(scales_path):
        with open(scales_path, "rb") as f:
            scales = pickle.load(f)

    for phase in ("train", "val"):
        split_file = os.path.join(args.split_dir, f"scannet_256_{phase}.txt")
        if not os.path.exists(split_file):
            continue
        with open(split_file) as f:
            scenes = [l.strip() for l in f if l.strip()]
        ok = []
        for scene in scenes:
            scene_dir = os.path.join(args.data_root, f"plenoxel_torch_{scene}")
            gt = os.path.join(
                args.scannet_root, scene, f"{scene}_vh_clean_2.labels.ply"
            )
            try:
                if preprocess_scene(
                    scene_dir, gt, scales.get(scene, 1.0),
                    overwrite=args.overwrite,
                ):
                    ok.append(scene)
            except Exception as e:  # failed-scene bookkeeping (:181-188)
                logging.warning(f"scene {scene} failed: {e}")
        with open(split_file, "w") as f:
            f.write("\n".join(ok) + "\n")
        print(f"{phase}: {len(ok)}/{len(scenes)} scenes ok")


if __name__ == "__main__":
    main()
