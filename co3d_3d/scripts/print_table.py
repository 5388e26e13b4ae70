"""Aggregate eval_results.json across seeds into LaTeX table rows
(reference co3d_3d/scripts/print_table.py:1-51)."""

from __future__ import annotations

import argparse
import glob
import json
import os
from collections import defaultdict

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", type=str, default="experiments")
    parser.add_argument("--metric", type=str, default="val/acc1")
    parser.add_argument("--pattern", type=str, default="*")
    args = parser.parse_args(argv)

    groups = defaultdict(list)
    for path in sorted(
        glob.glob(os.path.join(args.root, args.pattern, "eval_results.json"))
    ):
        run = os.path.basename(os.path.dirname(path))
        # runs are named <config>-<seed>; group by config
        base = run.rsplit("-", 1)[0]
        with open(path) as f:
            res = json.load(f)
        if args.metric in res:
            groups[base].append(float(res[args.metric]))

    for base in sorted(groups):
        vals = np.array(groups[base])
        print(
            f"{base} & {vals.mean():.2f} $\\pm$ {vals.std():.2f} "
            f"({len(vals)} seeds) \\\\"
        )


if __name__ == "__main__":
    main()
