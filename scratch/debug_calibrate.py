"""Debug which capacity guard poisons the calibrated-knobs permute test.

Reproduces tests/test_calibrate.py::test_calibrated_knobs_train_clean_on_
permuted_batches, then for the failing permutation re-measures every
level's escape statistics (same accounting as calibration) and compares
them against the bound budgets.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from nerf_downstream_tpu import config as cfg
from nerf_downstream_tpu.utils import calibrate as C


def _batches(rng, n_batches=1, scenes=3, voxels=600, cap=4096):
    from nerf_downstream_tpu.data.plenoxel import make_synthetic_scene
    from nerf_downstream_tpu.data.utils import collate_mink

    out = []
    for _ in range(n_batches):
        samples = []
        for _ in range(scenes):
            sc = make_synthetic_scene(
                rng, n_voxels=voxels, reso=(64, 64, 64), with_labels=True,
                num_classes=8, surface=True,
            )
            samples.append(
                {
                    "coordinates": sc["coords"].astype(np.float32),
                    "features": np.concatenate(
                        [sc["density"], sc["sh"]], 1
                    ).astype(np.float32),
                    "labels": sc["labels"],
                }
            )
        out.append(collate_mink(samples, capacity=cap))
    return out


def main():
    rng = np.random.default_rng(0)
    batches = _batches(rng, n_batches=1, scenes=3)
    knobs = C.calibrate(batches, tile=64, window=64, permutations=2, seed=2)
    print("knobs:", knobs)
    tile, window, blocks = (
        knobs["window_tile"], knobs["window_size"], knobs["window_blocks"],
    )
    level_caps = knobs["level_caps"]
    in_cap = int(np.asarray(batches[0]["coordinates"]).shape[0])
    meas_caps = (max(in_cap, level_caps[0]),) + level_caps[1:]

    for p in range(3):
        order = np.random.default_rng(p).permutation(3)
        v = C._permuted(batches[0], order)
        per = {}
        for i, s in enumerate(C.STRIDES):
            rows = C._level_rows(v, s)
            cap_ok = rows.shape[0] <= level_caps[i]
            per[s] = C._sorted_level_coords(rows, tile, meas_caps[i])
            entries, tiles, far = C._plan_escape_stats(
                per[s][0], per[s][1], tile, window, blocks
            )
            print(
                f"perm {p} s{s}: rows={rows.shape[0]} cap={level_caps[i]} "
                f"ok={cap_ok} esc_entries={entries} "
                f"(cap {knobs['window_escape_cap'][i]}) tiles={tiles} "
                f"(cap {knobs['window_escape_tiles'][i]}) far={far}"
            )
        for s in C.STRIDES[:-1]:
            ce = C._cross_escapes(per, s, tile, window, blocks,
                                  expanding=False)
            xe = C._cross_escapes(
                per, s, tile, window,
                blocks * knobs["window_expand_factor"], expanding=True,
            )
            print(f"perm {p} cross s{s}: contracting_esc={ce} "
                  f"expanding_esc={xe}")


if __name__ == "__main__":
    main()
