"""Class-stratified train/val/test split generation
(reference co3d_3d/scripts/generate_split.py:7-83)."""

from __future__ import annotations

import argparse
import os
from collections import defaultdict

import numpy as np


def stratified_split(instances: list[tuple[str, str]], ratios=(0.8, 0.1, 0.1),
                     seed: int = 0):
    """instances: [(class_label, inst_id)] -> (train, val, test) lists,
    class-stratified."""
    rng = np.random.default_rng(seed)
    by_class = defaultdict(list)
    for label, inst in instances:
        by_class[label].append(inst)
    splits = ([], [], [])
    for label in sorted(by_class):
        insts = by_class[label]
        order = rng.permutation(len(insts))
        n = len(insts)
        n_train = int(n * ratios[0])
        n_val = int(n * ratios[1])
        bounds = [(0, n_train), (n_train, n_train + n_val), (n_train + n_val, n)]
        for dst, (a, b) in zip(splits, bounds):
            dst.extend((label, insts[i]) for i in order[a:b])
    return splits


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--instance_list", type=str, required=True,
                        help="file with '<class> <inst_id>' lines")
    parser.add_argument("--out_dir", type=str, default="filelist")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    with open(args.instance_list) as f:
        instances = [tuple(l.split()[:2]) for l in f if l.strip()]
    train, val, test = stratified_split(instances, seed=args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    for name, rows in [("train", train), ("val", val), ("test", test),
                       ("trainval", train + val)]:
        with open(os.path.join(args.out_dir, f"{name}.txt"), "w") as f:
            f.write("\n".join(f"{c} {i}" for c, i in rows) + "\n")
    print(f"train={len(train)} val={len(val)} test={len(test)}")


if __name__ == "__main__":
    main()
