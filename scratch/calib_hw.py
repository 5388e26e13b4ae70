"""Auto-calibration vs hand-tuned knobs ON HARDWARE (VERDICT r4 #4).

Derives capacity knobs for the bench workload with the measured
calibration pass (utils/calibrate.py — the same code co3d_3d/train.py
runs when a config binds no caps), writes them as a gin example, and
A/B-times the train step under calibrated vs hand-tuned (bench.py
BLOCK_BINDINGS) knobs with the dedupe-proof bench harness.

Run (needs the TPU):  python scratch/calib_hw.py [--samples 2] [--permute 4]
Prints both step timings and the calibrated gin text; writes
co3d_3d/configs/scannet_plenoxel_calibrated_example.gin.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--permute", type=int, default=4)
    ap.add_argument("--slack", type=float, default=1.2)
    ap.add_argument("--skip_baseline", action="store_true")
    args = ap.parse_args()

    from nerf_downstream_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache(os.path.join(_REPO_ROOT, ".jax_cache"))

    import bench
    from nerf_downstream_tpu import config as cfg
    from nerf_downstream_tpu.utils import calibrate as C

    # calibration scans under the same config the run would use — incl.
    # the device-moved coordinate transforms whose host twins it applies
    cfg.clear_config()
    cfg.parse_config(
        bench.BLOCK_BINDINGS
        + 'train.device_transforms = '
        '["RandomFeatureJitter", "ElasticDistortion"]\n'
    )
    rng = np.random.default_rng(0)
    batches = [bench.make_batch(rng) for _ in range(args.samples)]
    tile = int(cfg.query_parameter("CoordinateContext.window_tile"))
    window = int(cfg.query_parameter("CoordinateContext.window_size"))
    knobs = C.calibrate(
        batches, tile=tile, window=window,
        permutations=args.permute, slack=args.slack, seed=0,
    )
    text = C.gin_text(knobs)
    print("== calibrated knobs ==\n" + text)

    out_gin = os.path.join(
        _REPO_ROOT, "co3d_3d", "configs",
        "scannet_plenoxel_calibrated_example.gin",
    )
    with open(out_gin, "w") as f:
        f.write(
            "# Example output of the measured auto-calibration pass\n"
            "# (python scratch/calib_hw.py / python -m co3d_3d.calibrate)\n"
            "# on the bench workload: 8 synthetic 128^3 surface scenes,\n"
            "# 64k-row capacity, device ElasticDistortion applied by its\n"
            "# host twin before span measurement. Compose AFTER the task\n"
            "# gin to pin capacity knobs for multi-process runs.\n"
            + text
        )
    print(f"wrote {out_gin}")

    # A/B: calibrated vs shipped hand-tuned knobs, same harness
    overrides = C.gin_text(knobs)
    results = {}
    cfg.clear_config()
    saved = bench.BLOCK_BINDINGS
    try:
        bench.BLOCK_BINDINGS = saved + overrides
        results["calibrated"] = bench.bench_3d_train()
        if not args.skip_baseline:
            bench.BLOCK_BINDINGS = saved
            results["hand_tuned"] = bench.bench_3d_train()
    finally:
        bench.BLOCK_BINDINGS = saved
    print(json.dumps(results, indent=2, default=float))


if __name__ == "__main__":
    main()
