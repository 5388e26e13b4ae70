"""2D split generation (reference utils/generate_split.py:5-42):
class-stratified train/val/test filelists with per-scene frame counts."""

from __future__ import annotations

import argparse
import os
from collections import defaultdict

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, required=True,
                        help="dir with <class>/<scene>/images/")
    parser.add_argument("--out_dir", type=str, default="filelist")
    parser.add_argument("--ratios", type=float, nargs=3,
                        default=[0.8, 0.1, 0.1])
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    by_class = defaultdict(list)
    for cls_name in sorted(os.listdir(args.data_root)):
        cls_dir = os.path.join(args.data_root, cls_name)
        if not os.path.isdir(cls_dir):
            continue
        for scene in sorted(os.listdir(cls_dir)):
            images = os.path.join(cls_dir, scene, "images")
            if os.path.isdir(images):
                n = len(os.listdir(images))
                by_class[cls_name].append((scene, n))

    splits = {"train": [], "val": [], "test": []}
    for cls_name in sorted(by_class):
        scenes = by_class[cls_name]
        order = rng.permutation(len(scenes))
        n = len(scenes)
        n_train = int(n * args.ratios[0])
        n_val = int(n * args.ratios[1])
        for name, sl in [("train", order[:n_train]),
                         ("val", order[n_train : n_train + n_val]),
                         ("test", order[n_train + n_val :])]:
            splits[name] += [
                f"{cls_name} {scenes[i][0]} {scenes[i][1]}" for i in sl
            ]

    os.makedirs(args.out_dir, exist_ok=True)
    for name, rows in splits.items():
        with open(os.path.join(args.out_dir, f"{name}.txt"), "w") as f:
            f.write("\n".join(rows) + "\n")
        print(f"{name}: {len(rows)}")


if __name__ == "__main__":
    main()
