"""Secondary benchmarks (BASELINE.md rows beyond the headline voxels/s):

1. 2D ResNet-18 train images/s/chip (bf16, 224x224) — the co3d_2d path.
2. Sparse-eval per-batch latency, dense vs --sparsify (ZAXIS offset subset),
   the reference's weight-sparse inference feature
   (co3d_3d/src/models/mink/modules/sparse_conv.py:30-54,562-677).

Prints one JSON line per metric. The driver's headline bench stays
``bench.py``; run this manually and record numbers in BASELINE.md.
"""

from __future__ import annotations

import json
import time

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(_os.path.abspath(__file__))))

import numpy as np


def bench_2d():
    import jax
    import jax.numpy as jnp

    from nerf_downstream_tpu.train.modules2d import LitModel

    B, S = 128, 224
    rng = np.random.default_rng(0)
    # device-resident batch: numpy would re-ship ~77MB over the relay
    # every step and dominate the measurement
    batch = {
        "images": jnp.asarray(
            rng.normal(size=(B, S, S, 3)).astype(np.float32)
        ),
        "labels": jnp.asarray(rng.integers(0, 51, B)),
    }
    from nerf_downstream_tpu import config as cfg

    cfg.clear_config()
    cfg.bind("ResNetBased", "dtype", jnp.bfloat16)  # precision=16 path
    lit = LitModel(model_name="resnet18", num_training_steps=1000)
    cfg.clear_config()
    state = lit.create_state(jax.random.PRNGKey(0), batch)
    step = lit.make_train_step()
    for _ in range(3):
        state, mets = step(state, batch)
    jax.block_until_ready(state.params)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, mets = step(state, batch)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / iters
    ips = B / dt
    # A100 torchvision resnet18 fp16 train is ~2.5k img/s (common MLPerf-ish
    # single-GPU figure); the reference publishes nothing (BASELINE.md).
    print(json.dumps({
        "metric": "resnet18_2d_train_images_per_sec_per_chip",
        "value": round(ips, 1), "unit": "images/s",
        "vs_baseline": round(ips / 2500.0, 3),
    }))


def bench_sparse_eval():
    import jax
    import jax.numpy as jnp

    from nerf_downstream_tpu import config as cfg

    import bench as B

    rng = np.random.default_rng(0)
    from nerf_downstream_tpu.train.loop import array_batch

    batch = array_batch(B.make_batch(rng))
    n_valid = int(np.asarray(batch["mask"]).sum())

    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.train.modules import SegmentationTraining

    results = {}
    for name, kwargs, method in [
        ("dense", {}, "block_resident"),
        # ZAXIS on all 9 stages: 3 of 27 offsets live -> the reference's
        # sparsified inference mode (offset subsetting); runs the row path
        # (offset subsets don't map to the dense block conv).
        ("zaxis", {"sparse": [2] * 9}, "block_resident"),
    ]:
        cfg.clear_config()
        cfg.parse_config(
            "CoordinateContext.grid_extent = 128\n"
            f'CoordinateContext.method = "{method}"\n'
            "CoordinateContext.block_caps = (19712, 4224, 960, 256, 64)\n"
        )
        model = get_model(
            name="Res16UNet18A", out_channel=B.NUM_CLASSES,
            num_batches=B.SCENES, compute_dtype=jnp.bfloat16, **kwargs,
        )
        task = SegmentationTraining(
            model, optimizer_name="SGD", scheduler_name="none", lr=0.1,
            ignore_label=-100,
        )
        state = task.create_state(jax.random.PRNGKey(0), batch)
        estep = task.make_eval_step()
        feats = batch["features"]
        for i in range(2):
            out = estep(state, dict(batch, features=feats + i * 1e-6))
        jax.block_until_ready(out[0])
        iters = 10
        t0 = time.perf_counter()
        for i in range(iters):
            out = estep(state, dict(batch, features=feats + i * 1e-5))
        jax.block_until_ready(out[0])
        dt = (time.perf_counter() - t0) / iters
        results[name] = dt
        print(json.dumps({
            "metric": f"res16unet18a_eval_latency_{name}",
            "value": round(dt * 1e3, 2), "unit": "ms/batch",
            "vs_baseline": round(n_valid / dt / 2.0e6, 3),
        }))
    cfg.clear_config()


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    bench_2d()
    bench_sparse_eval()


if __name__ == "__main__":
    main()
