"""CO3D preprocessing: Plenoxel last.ckpt (256^3) -> stride-2 downsampled
data.npz (128^3) (reference co3d_3d/scripts/preprocess.py:8-59).

Keeps even-coordinate voxels, halves coordinates, re-quantizes SH to uint8.
Skip-if-exists so sweeps are resumable.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from nerf_downstream_tpu.data import plenoxel


def preprocess_scene(scene_dir: str, overwrite: bool = False) -> bool:
    out_path = os.path.join(scene_dir, "data.npz")
    if os.path.exists(out_path) and not overwrite:
        return False
    data = plenoxel.load_torch_ckpt(os.path.join(scene_dir, "last.ckpt"))
    coords = plenoxel.decode_links(data["links"], data["reso"])
    sel = np.all(coords % 2 == 0, axis=1)
    coords = coords[sel] // 2
    plenoxel.save_npz(
        out_path,
        coords,
        data["density"][sel],
        data["sh"][sel],
        reso=[128, 128, 128],
    )
    return True


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, required=True)
    parser.add_argument("--overwrite", action="store_true")
    args = parser.parse_args(argv)
    scenes = sorted(glob.glob(os.path.join(args.data_root, "plenoxel_co3d_*")))
    done = 0
    for scene in scenes:
        if preprocess_scene(scene, args.overwrite):
            done += 1
    print(f"preprocessed {done}/{len(scenes)} scenes")


if __name__ == "__main__":
    main()
