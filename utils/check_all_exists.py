"""Data-integrity checker (reference utils/check_all_exists.py:1-42):
asserts the expected scene count and per-scene render counts exist."""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, required=True)
    parser.add_argument("--expected_scenes", type=int, default=18619)
    parser.add_argument("--renders_per_scene", type=int, default=50)
    parser.add_argument("--subdirs", nargs="+", default=["fgbg", "bg", "mask"])
    args = parser.parse_args(argv)

    scene_dirs = []
    for cls_name in sorted(os.listdir(args.data_root)):
        cls_dir = os.path.join(args.data_root, cls_name)
        if not os.path.isdir(cls_dir):
            continue
        for scene in sorted(os.listdir(cls_dir)):
            scene_dirs.append(os.path.join(cls_dir, scene))

    bad = []
    for scene in scene_dirs:
        for sub in args.subdirs:
            d = os.path.join(scene, sub)
            if not os.path.isdir(d) or len(os.listdir(d)) < args.renders_per_scene:
                bad.append(d)

    print(f"scenes found: {len(scene_dirs)} (expected {args.expected_scenes})")
    print(f"incomplete: {len(bad)}")
    for d in bad[:20]:
        print("  ", d)
    if len(scene_dirs) != args.expected_scenes or bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
