"""Benchmark: MinkowskiNet (Res16UNet18A) fwd+bwd voxel throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "extra"}.
``extra`` carries every secondary BASELINE.md row so the driver-captured
BENCH_r*.json holds all perf claims (nothing hand-transcribed):
2D ResNet-18 / ViT-S images/s, dense vs --sparsify (ZAXIS) eval latency,
and the input pipeline's host-side batch time (decode + transform stack)
next to the device step time. Set NDT_BENCH_EXTRA=0 to run only the
headline metric.

Workload: PeRFception-ScanNet-like synthetic batch — 8 surface-shell
scenes x ~7.8k occupied voxels (SH-27 features), 20 classes, 64k-row
capacity — through a full Res16UNet18A training step (conv kernel-map
build + block-resident sparse convs + sync-capable masked BN + CE +
backward + SGD update).

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
# 30 steps per dispatch: the relay RTT (50-250 ms/call, machinery real
# TPU-attached hosts don't have) amortizes 1/ITERS into the wall number —
# at 10 it was still ~7 ms/step of pure tunnel overhead on a ~55 ms step
ITERS = 30
REPEATS = 3  # min-of-REPEATS wall filters pool-queue congestion spikes

# fully-windowed hybrid: per-level row caps from this workload's measured
# occupied rows (62400/12832/2934/763/231 at strides 1..16) with ~15%
# slack, rounded to window-tile multiples. Same-set coverage = 4 x 128 =
# 512 rows, sized for the COMMON tile (probe: covers all but ~1.6k of
# 1.7M stride-1 entries); the outlier entries ride the escape fallback
# (window_escape_cap, stride-1 level only — scratch/probe_spans.py).
# Expanding down-conv maps keep 3 x 4 x 128 = 1536 coverage via
# window_expand_factor. All guards (level-cap overflow, escape-list
# overflow) still NaN-poison, so a throughput number from a truncated
# run is impossible.
BLOCK_BINDINGS = (
    # extent 160 = scene span 128 + the device ElasticDistortion
    # displacement tail (~±13 voxels at magnitude 16)
    "CoordinateContext.grid_extent = 160\n"
    'CoordinateContext.method = "hybrid"\n'
    "CoordinateContext.level_caps = (65536, 14848, 3584, 1024, 512)\n"
    "CoordinateContext.window_tile = 256\n"
    "CoordinateContext.window_size = 128\n"
    "CoordinateContext.window_blocks = 4\n"
    "CoordinateContext.window_expand_factor = 3\n"
    # escape caps at EVERY level that can escape (scene-shuffle changes
    # row offsets and can push outlier tiles past the coverage at any
    # level — measured on permuted batches, scratch/convergence.py);
    # stride-16 holds <= coverage rows, escapes impossible. Per-level
    # candidate-tile budgets keep the search cost proportional.
    "CoordinateContext.window_escape_cap = (8192, 2048, 512, 512, 0)\n"
    "CoordinateContext.window_escape_tiles = (64, 12, 6, 6, 6)\n"
    # flagship parity: the device elastic warp runs before quantization,
    # so duplicate cells exist and must be averaged (the assume_unique
    # collision guard would NaN-poison) — same reason the flagship gin
    # binds False (scannet_plenoxel.gin:110-114)
    "field_to_sparse.assume_unique = False\n"
    # the flagship ED recipe (scannet_plenoxel.gin:32-33) — the class
    # default would run a second (8, 24) pass the flagship doesn't
    "ElasticDistortion.distortion_params = [(4, 16)]\n"
    "ElasticDistortion.application_ratio = 0.7\n"
)


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


def _make_task(jnp, sparse=None, num_batches=SCENES):
    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.train.modules import SegmentationTraining

    kwargs = {"sparse": sparse} if sparse else {}
    model = get_model(
        name="Res16UNet18A", out_channel=NUM_CLASSES,
        num_batches=num_batches, compute_dtype=jnp.bfloat16, **kwargs,
    )
    return SegmentationTraining(
        model, optimizer_name="SGD", scheduler_name="none", lr=0.1,
        ignore_label=-100,
        # flagship-config parity: feature jitter AND the elastic warp ride
        # the device step (scannet_plenoxel.gin train.device_transforms)
        device_transforms=("RandomFeatureJitter", "ElasticDistortion"),
    )


def bench_3d_train():
    """Headline: Res16UNet18A train step voxels/s on the block-resident
    path. Per-level block caps are this workload's measured occupied-block
    counts (17.9k/3.8k/0.85k/0.21k/0.03k at strides 1..16) with ~10% slack;
    the overflow guard NaN-poisons on cap overflow, so a throughput number
    from a silently-truncated run is impossible."""
    import jax
    import jax.numpy as jnp

    from nerf_downstream_tpu import config as cfg
    from nerf_downstream_tpu.train.loop import array_batch

    cfg.clear_config()
    cfg.parse_config(BLOCK_BINDINGS)

    rng = np.random.default_rng(0)
    batch = array_batch(make_batch(rng))
    n_valid = int(batch["mask"].sum())

    task = _make_task(jnp)
    state = task.create_state(jax.random.PRNGKey(0), batch)
    step = task.make_train_step(donate=True)

    for _ in range(WARMUP):
        state, mets = step(state, batch)
    jax.block_until_ready(state.params)

    # ITERS steps inside ONE jitted lax.scan: a single dispatch and a
    # single stacked-loss fetch, so the tunnel RTT (50-250 ms/call under
    # relay congestion, the machinery real TPU-attached hosts don't have)
    # amortizes 1/ITERS. Also dedupe-proof: one execution, and the
    # per-step losses come back stacked for the honesty checks below
    # (a plain chained host loop measured 4.2 ms/step for a 114 ms
    # program here — see ROADMAP measurement caution).
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(s):
        def body(carry, _):
            carry, mets = step(carry, batch)
            return carry, mets["loss"]

        return jax.lax.scan(body, s, None, length=ITERS)

    state, _ = multi_step(state)  # compile + warm
    # the TPU pool time-shares the chip between sessions: a 0.98 s
    # execution has been observed to take 2.2-10 s of wall while the
    # device was busy 98 ms/step throughout (module-level profiler
    # evidence, ROADMAP). Min-of-REPEATS wall is still a real end-to-end
    # measurement; device_step_ms (profiler, hardware-clocked) is
    # reported alongside as the congestion-free number.
    walls = []
    all_losses = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state, losses_dev = multi_step(state)
        losses = np.asarray(losses_dev)
        jax.block_until_ready(state.params)
        walls.append((time.perf_counter() - t0) / ITERS)
        all_losses.append(losses)

        # honesty checks: the overflow guard NaN-poisons truncated levels,
        # so a finite loss certifies no cap overflowed / window escaped;
        # distinct losses certify ITERS real optimization steps ran
        assert np.isfinite(losses).all(), (
            f"non-finite loss {losses}: caps overflowed — invalid"
        )
        assert len(set(losses.tolist())) == ITERS, (
            f"only {len(set(losses.tolist()))}/{ITERS} distinct step "
            "losses: executions were deduped/skipped — invalid"
        )
    flat = np.concatenate(all_losses).tolist()
    assert len(set(flat)) == len(flat), "repeated losses across runs"
    device_ms = _device_step_ms(multi_step, state)
    return n_valid / min(walls), min(walls), device_ms


def _device_step_ms(multi_step, state):
    """Hardware-clocked per-step time of the scanned train program: sum of
    XLA-module durations on the device plane / ITERS. Immune to pool-queue
    congestion (the wall number is not); None if the profile has no device
    plane (CPU runs)."""
    import glob
    import shutil
    import tempfile

    import jax

    logdir = tempfile.mkdtemp(prefix="ndt_bench_trace")
    try:
        with jax.profiler.trace(logdir):
            state, losses = multi_step(state)
            np.asarray(losses)
            jax.block_until_ready(state.params)
        paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
        if not paths:
            return None
        pd = jax.profiler.ProfileData.from_file(paths[0])
        total = 0.0
        for plane in pd.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            for line in plane.lines:
                if line.name == "XLA Modules":
                    for ev in line.events:
                        total += ev.duration_ns / 1e6
        return round(total / ITERS, 2) if total else None
    except Exception:
        return None
    finally:
        shutil.rmtree(logdir, ignore_errors=True)


def bench_eval_latency():
    """Dense vs ZAXIS-sparsified eval latency (the reference's weight-sparse
    inference, sparse_conv.py:30-54,562-677)."""
    import jax
    import jax.numpy as jnp

    from nerf_downstream_tpu import config as cfg
    from nerf_downstream_tpu.train.loop import array_batch

    rng = np.random.default_rng(0)
    out = {}
    # eval-phase overrides (last-wins): eval never augments, so the
    # elastic warp the TRAIN bindings provision for does not exist here —
    # inputs are the dataset's unwarped unique voxel grids within extent
    # 128, exactly the r4 measurement conditions (the collision guard
    # would NaN-poison if this declaration were wrong)
    eval_bindings = (
        BLOCK_BINDINGS
        + "field_to_sparse.assume_unique = True\n"
        + "CoordinateContext.grid_extent = 128\n"
    )
    for name, sparse in [("dense", None), ("zaxis", [2] * 9)]:
        cfg.clear_config()
        cfg.parse_config(eval_bindings)
        batch = array_batch(make_batch(rng))
        task = _make_task(jnp, sparse=sparse)
        state = task.create_state(jax.random.PRNGKey(0), batch)
        estep = task.make_eval_step()
        feats = batch["features"]

        # ITERS evals in one scanned program (single dispatch — relay RTT
        # amortizes); the per-iter input scaling must survive the model's
        # bf16 cast (an additive 1e-5 rounds away and the relay then
        # dedupes bit-identical executions — the assertion caught that)
        @jax.jit
        def multi_eval(s, f):
            def body(carry, i):
                logits, _ = estep(
                    s, dict(batch, features=f * (1 + 0.01 * i))
                )
                return carry, jnp.sum(logits)
            return jax.lax.scan(
                body, 0, jnp.arange(ITERS, dtype=jnp.float32)
            )[1]

        np.asarray(multi_eval(state, feats))  # compile + warm
        best = None
        for r in range(REPEATS):
            t0 = time.perf_counter()
            sums = np.asarray(multi_eval(state, feats * (1 + 0.001 * r)))
            dt = (time.perf_counter() - t0) / ITERS
            best = dt if best is None else min(best, dt)
            assert len(set(sums.tolist())) == ITERS, "evals deduped/skipped"
        out[f"eval_{name}_ms"] = round(best * 1e3, 2)
        if name == "dense":
            # serving throughput: valid voxels through the full forward
            n_valid = int(np.asarray(batch["mask"]).sum())
            out["eval_voxels_per_sec"] = round(n_valid / best, 1)
    cfg.clear_config()
    return out


def bench_serving_latency():
    """Per-scene (batch-1) serving latency — the deployment number the
    reference's eval harness logs per scene
    (segmentation_training.py:125-141). One ~7.8k-voxel scene at a
    serving-scaled 8k capacity with per-level caps/escape budgets scaled
    to the single-scene workload."""
    import jax
    import jax.numpy as jnp

    from nerf_downstream_tpu import config as cfg
    from nerf_downstream_tpu.data.plenoxel import make_synthetic_scene
    from nerf_downstream_tpu.data.utils import collate_mink
    from nerf_downstream_tpu.train.loop import array_batch

    cfg.clear_config()
    cfg.parse_config(
        "CoordinateContext.grid_extent = 128\n"
        'CoordinateContext.method = "hybrid"\n'
        "CoordinateContext.level_caps = (8192, 2048, 512, 256, 256)\n"
        "CoordinateContext.window_tile = 256\n"
        "CoordinateContext.window_size = 128\n"
        "CoordinateContext.window_blocks = 4\n"
        "CoordinateContext.window_expand_factor = 3\n"
        "CoordinateContext.window_escape_cap = (1024, 256, 64, 0, 0)\n"
        "CoordinateContext.window_escape_tiles = (16, 4, 2, 2, 2)\n"
        "field_to_sparse.assume_unique = True\n"
    )
    rng = np.random.default_rng(0)
    sc = make_synthetic_scene(
        rng, n_voxels=VOXELS_PER_SCENE, reso=(128, 128, 128),
        with_labels=True, num_classes=NUM_CLASSES, surface=True,
    )
    batch = array_batch(
        collate_mink(
            [
                {
                    "coordinates": sc["coords"].astype(np.float32),
                    "features": np.concatenate(
                        [sc["density"], sc["sh"]], 1
                    )[:, 1:28].astype(np.float32),
                    "labels": sc["labels"],
                }
            ],
            capacity=8192,
        )
    )
    task = _make_task(jnp, num_batches=1)
    state = task.create_state(jax.random.PRNGKey(0), batch)
    estep = task.make_eval_step()
    feats = batch["features"]

    @jax.jit
    def multi(s, f):
        def body(carry, i):
            logits, _ = estep(s, dict(batch, features=f * (1 + 0.01 * i)))
            return carry, jnp.sum(logits)

        return jax.lax.scan(
            body, 0, jnp.arange(ITERS, dtype=jnp.float32)
        )[1]

    np.asarray(multi(state, feats))  # compile + warm
    best = None
    for r in range(REPEATS):
        t0 = time.perf_counter()
        sums = np.asarray(multi(state, feats * (1 + 0.001 * r)))
        dt = (time.perf_counter() - t0) / ITERS
        best = dt if best is None else min(best, dt)
        assert np.isfinite(sums).all(), "serving eval poisoned (caps)"
        assert len(set(sums.tolist())) == ITERS, "serving evals deduped"
    cfg.clear_config()
    return {"serving_batch1_ms": round(best * 1e3, 2)}


def bench_2d(arch: str, batch: int = 128):
    import jax
    import jax.numpy as jnp

    from nerf_downstream_tpu import config as cfg
    from nerf_downstream_tpu.train.modules2d import LitModel

    s = 224
    rng = np.random.default_rng(0)
    # device-resident batch: numpy would re-ship ~77MB over the relay
    # every step and dominate the measurement
    data = {
        "images": jnp.asarray(
            rng.normal(size=(batch, s, s, 3)).astype(np.float32)
        ),
        "labels": jnp.asarray(rng.integers(0, 51, batch)),
    }
    cfg.clear_config()
    cfg.bind("ResNetBased", "dtype", jnp.bfloat16)  # precision=16 path
    cfg.bind("ViTBased", "dtype", jnp.bfloat16)
    lit = LitModel(model_name=arch, num_training_steps=1000)
    cfg.clear_config()
    state = lit.create_state(jax.random.PRNGKey(0), data)
    step = lit.make_train_step()
    for _ in range(3):
        state, mets = step(state, data)
    jax.block_until_ready(state.params)

    # iters steps in one scanned program; min-of-REPEATS wall + distinct
    # finite losses (see bench_3d_train for the relay rationale)
    iters = 20

    @jax.jit
    def multi2d(s):
        def body(carry, _):
            carry, mets = step(carry, data)
            return carry, mets["loss"]
        return jax.lax.scan(body, s, None, length=iters)

    state, _ = multi2d(state)  # compile + warm
    best = None
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state, losses_dev = multi2d(state)
        losses = np.asarray(losses_dev)
        jax.block_until_ready(state.params)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
        assert np.isfinite(losses).all()
        assert len(set(losses.tolist())) == iters, "2d steps deduped"
    return batch / best


def bench_input_pipeline(tmpdir: str, workers: int = 8,
                         worker_mode: str = "thread"):
    """Host-side batch time: real npz decode + the flagship transform stack
    through DataModule's prefetcher, at bench scale. Proves (or
    refutes) data_time < device step time overlap — the reference logs
    exactly this pair in production (segmentation_training.py:92-93).
    ``workers``/``worker_mode`` drive the worker-scaling rows (process
    workers parallelize across cores on real TPU-VM hosts; this bench
    host has 1 core, so the rows document the mechanism's overhead
    floor, not its scaling)."""
    import pickle

    from nerf_downstream_tpu import config as cfg
    from nerf_downstream_tpu.data import plenoxel
    from nerf_downstream_tpu.data.data_module import DataModule
    from nerf_downstream_tpu.data.scannet import PlenoxelScannetDataset

    rng = np.random.default_rng(0)
    root = _os.path.join(tmpdir, "perfception-scannet")
    split = _os.path.join(tmpdir, "split")
    _os.makedirs(split, exist_ok=True)
    names = []
    for i in range(SCENES):
        inst = f"scene{i:04d}_00"
        sc = plenoxel.make_synthetic_scene(
            rng, n_voxels=VOXELS_PER_SCENE, reso=(128, 128, 128),
            with_labels=True, num_classes=41, surface=True,
        )
        plenoxel.save_npz(
            _os.path.join(root, f"plenoxel_torch_{inst}", "data.npz"),
            sc["coords"], sc["density"], sc["sh"], sc["reso"],
            labels=sc["labels"], dists=sc["dists"],
        )
        names.append(inst)
    open(_os.path.join(split, "scannet_256_train.txt"), "w").write(
        "\n".join(names)
    )
    with open(_os.path.join(split, "scene_scales.data"), "wb") as f:
        pickle.dump({n: 1.0 for n in names}, f)

    cfg.clear_config()
    cfg.parse_config(
        f'PlenoxelScannetDataset.data_root = "{root}"\n'
        "PlenoxelScannetDataset.downsample_stride = 1\n"
        "PlenoxelScannetDataset.train_transformations = ["
        '"RandomRotation", "RandomCrop", "RandomAffine", '
        '"CoordinateDropout", "RandomFeatureJitter", '
        '"RandomHorizontalFlip", "RandomTranslation", '
        '"ElasticDistortion"]\n'
        # flagship parity: jitter + elastic warp leave the host Compose
        # for the device step (scannet_plenoxel.gin binds the same)
        'train.device_transforms = '
        '["RandomFeatureJitter", "ElasticDistortion"]\n'
        'PlenoxelScannetDataset.features = ["sh"]\n'
        "RandomCrop.x = 200\nRandomCrop.y = 200\nRandomCrop.z = 200\n"
        "ElasticDistortion.distortion_params = [(4, 16)]\n"
        "CoordinateContext.grid_extent = 320\n"
    )
    dm = DataModule(
        batch_size=SCENES, train_num_workers=workers, capacity=CAPACITY,
        dataset_cls=PlenoxelScannetDataset, worker_mode=worker_mode,
    )
    it = dm.train_batches()
    next(it)  # warm (thread pool spin-up, file cache)
    t0 = time.perf_counter()
    n = 6
    for _ in range(n):
        next(it)
    cfg.clear_config()
    return (time.perf_counter() - t0) / n


def main():
    import tempfile

    import jax

    from nerf_downstream_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache("/root/repo/.jax_cache")

    vps, step_dt, device_ms = bench_3d_train()
    extra = {"step_ms": round(step_dt * 1e3, 1)}
    if device_ms:
        # hardware-clocked; wall (the headline) adds pool-queue congestion
        extra["device_step_ms"] = device_ms
    if _os.environ.get("NDT_BENCH_EXTRA", "1") == "1":
        with tempfile.TemporaryDirectory() as td:
            extra["data_time_ms"] = round(
                bench_input_pipeline(td) * 1e3, 1
            )
        extra["data_over_step"] = round(
            extra["data_time_ms"] / extra["step_ms"], 2
        )
        # worker-scaling rows (process workers; 1-core bench host => the
        # rows measure fork-pool overhead, scaling needs real multi-core)
        for nw in (2, 4):
            with tempfile.TemporaryDirectory() as td:
                extra[f"data_time_proc{nw}_ms"] = round(
                    bench_input_pipeline(
                        td, workers=nw, worker_mode="process"
                    ) * 1e3, 1,
                )
        extra.update(bench_eval_latency())
        extra.update(bench_serving_latency())
        extra["resnet18_2d_img_per_sec"] = round(bench_2d("resnet18"), 1)
        extra["vit_small_2d_img_per_sec"] = round(
            bench_2d("vit_small_patch16_224", batch=64), 1
        )

    print(
        json.dumps(
            {
                "metric": "res16unet18a_train_voxels_per_sec_per_chip",
                "value": round(vps, 1),
                "unit": "voxels/s",
                "vs_baseline": round(vps / A100_ME_BASELINE_VOXELS_PER_SEC, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
