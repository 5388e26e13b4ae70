"""Calibration CLI: derive windowed-conv capacity knobs from a dataset scan.

Measures real train batches (real transforms, real collate) with the same
boundary/escape logic the runtime uses and writes the derived
``CoordinateContext`` bindings as a gin file to compose into later runs:

    python -m co3d_3d.calibrate --ginc co3d_3d/configs/scannet_plenoxel.gin \
        --ginc co3d_3d/configs/scannet_feature_sh.gin \
        [--ginb ...] --samples 4 --permute 4 --out calibrated.gin
    python -m co3d_3d.train --ginc ... --ginc calibrated.gin ...

``python -m co3d_3d.train`` also runs this automatically when the config
binds none of the capacity knobs (train.auto_calibrate, default on);
this CLI is for scanning more samples offline and pinning the result.
"""

from __future__ import annotations

import argparse
import logging

from nerf_downstream_tpu import config as gin


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ginc", action="append", default=[])
    parser.add_argument("--ginb", action="append", default=[])
    parser.add_argument("--samples", type=int, default=4)
    parser.add_argument("--permute", type=int, default=4)
    parser.add_argument("--slack", type=float, default=1.2)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--out", default="calibrated.gin")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    gin.parse_config_files_and_bindings(args.ginc, args.ginb)
    from nerf_downstream_tpu.data.data_module import DataModule
    from nerf_downstream_tpu.utils import calibrate as C

    batch_size = args.batch_size or gin.query_parameter(
        "train.batch_size", default=8
    )
    capacity = gin.query_parameter("train.capacity", default=None)
    dm = DataModule(batch_size=int(batch_size), capacity=capacity)
    it = dm.train_batches()
    batches = [next(it) for _ in range(args.samples)]
    tile = gin.query_parameter("CoordinateContext.window_tile", default=256)
    window = gin.query_parameter(
        "CoordinateContext.window_size", default=128
    )
    knobs = C.calibrate(
        batches, tile=int(tile), window=int(window),
        permutations=args.permute, slack=args.slack,
    )
    text = C.gin_text(knobs)
    with open(args.out, "w") as f:
        f.write(text)
    print(text)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
