"""Flagship-config convergence validation on learnable synthetic geometry.

Trains the REAL product path — ``co3d_3d/train.py`` with the shipped
``scannet_plenoxel.gin`` (shuffled DataModule batches -> fully-windowed
convs with per-level escape fallback -> CE -> cosine SGD) — on a synthetic
8-scene PeRFception-ScanNet-style tree whose labels are GEOMETRIC (the
octant of each voxel around its scene centroid, expressed in raw nyu40 ids
1..8 so the dataset's remap LUT exercises), then evals and prints the final
metrics.  A model that learns must push val/mIoU far above the 12.5%
octant-chance floor; ROADMAP records **97.6 mIoU / 99.99 OA** at 300 steps
on TPU.  This run is also the shuffle-robustness regression: scene order
inside a batch shifts every scene's row offsets, which is exactly the
condition that NaN'd the original stride-1-only escape caps (the per-level
``window_escape_cap`` in the gin is the fix this script validated).

Run (TPU, ~4-8 min warm / 20+ min fresh Mosaic compile, then ~0.1 s/step):
    python scratch/convergence.py [--steps 300] [--out /tmp/conv_exp]
``NDT_CONV_STEPS=12`` (the verify-skill smoke) overrides ``--steps``.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import numpy as np

SCENES = 8
VOXELS = 7_800
CFG = "co3d_3d/configs"


def octant_labels(coords: np.ndarray) -> np.ndarray:
    """nyu40 ids 1..8 by the octant of each voxel around the scene centroid
    (all eight ids are in the ScanNet 20-class valid set, so they survive
    the dataset's nyu40 -> train-id remap as 8 distinct classes)."""
    c = coords - np.median(coords, axis=0, keepdims=True)
    bits = (c >= 0).astype(np.int64)
    return (bits[:, 0] * 4 + bits[:, 1] * 2 + bits[:, 2] + 1).astype(
        np.int64
    )


def write_tree(tmpdir: str) -> str:
    from nerf_downstream_tpu.data import plenoxel

    rng = np.random.default_rng(0)
    root = os.path.join(tmpdir, "perfception-scannet")
    split = os.path.join(tmpdir, "split")
    os.makedirs(split, exist_ok=True)
    names = []
    for i in range(SCENES):
        inst = f"scene{i:04d}_00"
        sc = plenoxel.make_synthetic_scene(
            rng, n_voxels=VOXELS, reso=(128, 128, 128),
            with_labels=True, num_classes=41, surface=True,
        )
        plenoxel.save_npz(
            os.path.join(root, f"plenoxel_torch_{inst}", "data.npz"),
            sc["coords"], sc["density"], sc["sh"], sc["reso"],
            labels=octant_labels(sc["coords"]), dists=sc["dists"],
        )
        names.append(inst)
    for phase in ("train", "val"):
        with open(
            os.path.join(split, f"scannet_256_{phase}.txt"), "w"
        ) as f:
            f.write("\n".join(names))
    with open(os.path.join(split, "scene_scales.data"), "wb") as f:
        pickle.dump({n: 1.0 for n in names}, f)
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--steps", type=int,
        default=int(os.environ.get("NDT_CONV_STEPS", "300")),
    )
    ap.add_argument("--out", default="/tmp/ndt_convergence")
    ap.add_argument("--data", default="/tmp/ndt_convergence_data")
    args = ap.parse_args()

    from nerf_downstream_tpu import config as cfg
    from nerf_downstream_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache(os.path.join(_REPO_ROOT, ".jax_cache"))
    root = write_tree(args.data)

    from co3d_3d import eval as eval_cli
    from co3d_3d import train as train_cli

    common = [
        "--ginc", f"{CFG}/scannet_plenoxel.gin",
        "--ginc", f"{CFG}/scannet_feature_sh.gin",
        "--ginb", f'PlenoxelScannetDataset.data_root = "{root}"',
        "--ginb", "PlenoxelScannetDataset.downsample_stride = 1",
    ]
    train_cli.main(common + [
        "--ginb", f"train.max_steps = {args.steps}",
        "--ginb", f"train.val_every_n_steps = {max(args.steps // 3, 1)}",
        "--ginb", "train.train_num_workers = 2",
        "--ginb", "train.val_num_workers = 1",
        "--save_path", args.out,
        "--seed", "1",
    ])
    cfg.clear_config()
    eval_cli.main(common + [
        "--load_path", os.path.join(args.out, "last.ckpt"),
        "--tag", "convergence",
        # --replace: without it, a rerun with the default --out would see
        # the previous run's convergence.json, skip eval (idempotent
        # sweeps), and validate STALE metrics instead of this training run
        "--replace",
    ])
    res = json.loads(
        open(os.path.join(args.out, "convergence.json")).read()
    )[0]
    keep = {
        k: round(float(v), 4)
        for k, v in res.items()
        if k in ("val/mIoU", "val/mAcc", "val/OA", "val/loss")
    }
    print(json.dumps({"steps": args.steps, **keep}))
    miou = float(res.get("val/mIoU", 0.0))
    if args.steps >= 100:
        assert miou > 60.0, (
            f"val/mIoU {miou:.1f} — octant geometry should be near-"
            "saturated (chance 12.5, measured 97.6 at 300 steps); the "
            "product path is not learning"
        )


if __name__ == "__main__":
    main()
