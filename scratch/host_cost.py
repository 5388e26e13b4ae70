"""Per-stage host cost table for the flagship input pipeline.

VERDICT r4 weak #2: data_over_step hit 0.99 on the 1-core bench host but no
per-transform cost table existed to aim the optimization. This script times
each stage of the exact bench_input_pipeline workload (bench.py:406-469):
npz decode -> dataset postprocessing -> each transform in the flagship
stack -> collate, per 8-scene batch, on this host. Run:

    python scratch/host_cost.py [--scenes 8] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import tempfile
import time
from collections import defaultdict

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from nerf_downstream_tpu import config as cfg
    from nerf_downstream_tpu.data import plenoxel, transforms
    from nerf_downstream_tpu.data.scannet import PlenoxelScannetDataset
    from nerf_downstream_tpu.data.utils import collate_mink

    import bench

    rng = np.random.default_rng(0)
    tmpdir = tempfile.mkdtemp(prefix="ndt_host_cost")
    root = os.path.join(tmpdir, "perfception-scannet")
    split = os.path.join(tmpdir, "split")
    os.makedirs(split, exist_ok=True)
    names = []
    for i in range(args.scenes):
        inst = f"scene{i:04d}_00"
        sc = plenoxel.make_synthetic_scene(
            rng, n_voxels=bench.VOXELS_PER_SCENE, reso=(128, 128, 128),
            with_labels=True, num_classes=41, surface=True,
        )
        plenoxel.save_npz(
            os.path.join(root, f"plenoxel_torch_{inst}", "data.npz"),
            sc["coords"], sc["density"], sc["sh"], sc["reso"],
            labels=sc["labels"], dists=sc["dists"],
        )
        names.append(inst)
    open(os.path.join(split, "scannet_256_train.txt"), "w").write(
        "\n".join(names)
    )
    with open(os.path.join(split, "scene_scales.data"), "wb") as f:
        pickle.dump({n: 1.0 for n in names}, f)

    stack = [
        "RandomRotation", "RandomCrop", "RandomAffine",
        "CoordinateDropout", "RandomHorizontalFlip", "RandomTranslation",
        "ElasticDistortion",
    ]
    cfg.clear_config()
    cfg.parse_config(
        f'PlenoxelScannetDataset.data_root = "{root}"\n'
        "PlenoxelScannetDataset.downsample_stride = 1\n"
        "PlenoxelScannetDataset.train_transformations = []\n"
        'PlenoxelScannetDataset.features = ["sh"]\n'
        "RandomCrop.x = 200\nRandomCrop.y = 200\nRandomCrop.z = 200\n"
        "ElasticDistortion.distortion_params = [(4, 16)]\n"
    )
    ds = PlenoxelScannetDataset(phase="train")
    tfs = {name: transforms.TRANSFORMS[name]() for name in stack}

    # per-stage timing: run the full per-scene path iters times, measuring
    # each stage separately (same data flow as Compose, one clock per stage)
    acc = defaultdict(float)
    n_events = defaultdict(int)
    voxels = 0
    for it in range(args.iters):
        batch_samples = []
        for idx in range(len(ds)):
            t0 = time.perf_counter()
            sample = ds[idx]  # decode + dataset postprocess, no transforms
            acc["decode+dataset"] += time.perf_counter() - t0
            coords = sample["coordinates"]
            feats = sample["features"]
            labels = sample["labels"]
            voxels += len(coords)
            for name in stack:
                t0 = time.perf_counter()
                coords, feats, labels = tfs[name](coords, feats, labels)
                acc[name] += time.perf_counter() - t0
                n_events[name] += 1
            batch_samples.append(
                {
                    "coordinates": coords,
                    "features": feats,
                    "labels": labels,
                }
            )
        t0 = time.perf_counter()
        collate_mink(batch_samples, capacity=bench.CAPACITY)
        acc["collate_mink"] += time.perf_counter() - t0

    total = sum(acc.values())
    print(
        f"{args.scenes}-scene batch x {args.iters} iters, "
        f"{voxels // args.iters} voxels/batch"
    )
    print(f"{'stage':<24} {'ms/batch':>9} {'share':>7}")
    for name, s in sorted(acc.items(), key=lambda x: -x[1]):
        print(
            f"{name:<24} {s / args.iters * 1e3:>9.2f} "
            f"{s / total:>7.1%}"
        )
    print(f"{'TOTAL':<24} {total / args.iters * 1e3:>9.2f}")
    cfg.clear_config()


if __name__ == "__main__":
    main()
