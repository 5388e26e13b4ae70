"""3D training CLI (reference co3d_3d/train.py).

Interface parity: ``python -m co3d_3d.train --ginc <cfg.gin> ... --ginb
<binding> ... --save_path ... --seed N [--resume] [--debug]``; the
gin-configured entry function ``train()`` keeps the reference's full
parameter surface (train.py:50-93) so all 28 3D config files bind unchanged.

TPU notes: ``gpus > 1`` trains data-parallel over a ``jax.sharding.Mesh``
(the reference's DDPPlugin, train.py:184): the batch is shard-partitioned
(whole samples per device), gradients psum-reduce with the
global-denominator loss, and validation runs through the shard_map eval
step with psum'd metrics. ``use_sync_batchnorm`` builds the model with
``bn_axis_name="data"`` so masked-BN statistics sync across devices
(reference train.py:106-107).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import socket
from typing import Optional

from nerf_downstream_tpu import config as gin
from nerf_downstream_tpu.data.data_module import DataModule
from nerf_downstream_tpu.models import get_model
from nerf_downstream_tpu.train.loggers import get_logger
from nerf_downstream_tpu.train.loop import Trainer
from nerf_downstream_tpu.train.modules import get_training_module
from nerf_downstream_tpu.train.profilers import SumProfiler


def setup_logger(run_name: str, debug: bool = False):
    """Console logging with host-tag prefixes (reference train.py:33-47)."""
    host = socket.gethostname()
    logging.basicConfig(
        level=logging.DEBUG if debug else logging.INFO,
        format=f"%(asctime)s [{host}:{run_name}] %(levelname)s %(message)s",
        force=True,
    )


def seed_everything(seed: int):
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed % 2**32)
    from nerf_downstream_tpu.data import transforms as T

    T.seed(seed)


@gin.configurable
def train(
    save_path: str = "experiments",
    gpus: int = 1,
    parallel_mode: str = "ddp",
    model_parallel: int = 1,
    run_name: Optional[str] = None,
    run_name_postfix: Optional[str] = None,
    project_name: str = "nerf-downstream-tpu",
    max_steps: int = 10000,
    max_epochs: int = -1,
    warmup_steps: int = -1,
    model=None,
    training_module: str = "SegmentationTraining",
    optimizer_name: str = "SGD",
    scheduler_name: str = "PolyLR",
    scheduler_interval: str = "step",
    lr: float = 1e-3,
    weight_decay: float = 1e-4,
    batch_size: int = 8,
    val_batch_size: int = 6,
    prune_batch_size: int = 8,
    train_num_workers: int = 4,
    val_num_workers: int = 2,
    collate_func_name: str = "collate_mink",
    val_every_n_steps: int = 1000,
    log_every_n_steps: int = 10,
    reset_profiler_every_n_steps: int = 1000,
    progressbar_refresh_rate: int = 1,
    loggers: list = ("csv",),
    resume_training: bool = False,
    checkpoint_path: Optional[str] = None,
    load_weights: bool = False,
    load_optimizers: bool = False,
    transfer_self_supervised: bool = False,
    use_sync_batchnorm: bool = False,
    use_sync_grad: bool = False,
    ignore_label: int = -100,
    train_phase: str = "train",
    val_phase: str = "val",
    test_phase: str = "test",
    monitor_metric: str = "val/mIoU",
    evaluate: bool = False,
    void_weight: Optional[float] = None,
    debug: bool = False,
    seed: int = 777,
    capacity: Optional[int] = None,
    device_transforms: tuple = (),
    auto_calibrate: bool = True,
):
    os.makedirs(save_path, exist_ok=True)

    # "gspmd" expresses the distributed step through sharding annotations
    # over a (data, model) mesh (parallel/gspmd.py): the model sees GLOBAL
    # shapes and no collective axis — XLA inserts the collectives. "ddp"
    # (default) is the shard_map+psum throughput path.
    gspmd = parallel_mode == "gspmd" and gpus > 1
    axis_name = "data" if gpus > 1 and not gspmd else None
    if gpus > 1:
        data_shards = gpus // model_parallel if gspmd else gpus
        assert batch_size % data_shards == 0, (
            f"batch_size {batch_size} not divisible by {data_shards} "
            "data-parallel shards"
        )
        assert val_batch_size % data_shards == 0, (
            f"val_batch_size {val_batch_size} not divisible by "
            f"{data_shards} data-parallel shards"
        )
    if model is None:
        # per-device scene count under shard_map DDP (each shard holds
        # whole samples); GSPMD traces global shapes
        model_kwargs = {
            "num_batches": batch_size if gspmd else batch_size // max(gpus, 1)
        }
        if axis_name is not None and use_sync_batchnorm:
            model_kwargs["bn_axis_name"] = axis_name
        model = get_model(**model_kwargs)

    if run_name is None or "default" in str(run_name).lower() or run_name == "":
        run_name = f"b{batch_size}x{gpus}-{type(model).__name__}"
    if run_name_postfix:
        run_name += "-" + run_name_postfix
    logging.info(f"== run name: {run_name}")

    import jax

    # multi-process (pod) bookkeeping: --gpus is the GLOBAL device count;
    # each process loads its stride of the filelist and produces
    # batch_size/process_count scenes per step, sharded over its LOCAL
    # devices — the Trainer assembles the global batch
    # (jax.make_array_from_process_local_data)
    procs = jax.process_count()
    local_bs, local_val_bs = batch_size, val_batch_size
    if procs > 1:
        if gspmd:
            raise NotImplementedError(
                "parallel_mode='gspmd' is single-process for now; use "
                "'ddp' for multi-process runs"
            )
        assert gpus % procs == 0, (gpus, procs)
        assert batch_size % procs == 0 and val_batch_size % procs == 0
        local_bs = batch_size // procs
        local_val_bs = val_batch_size // procs
        if capacity is not None:
            # capacity is the GLOBAL row budget (split per shard inside
            # the DataModule); each process carries its share
            assert capacity % procs == 0
            capacity = capacity // procs

    data_module = DataModule(
        train_phase=train_phase,
        val_phase=val_phase,
        test_phase=test_phase,
        batch_size=local_bs,
        val_batch_size=local_val_bs,
        train_num_workers=train_num_workers,
        val_num_workers=val_num_workers,
        collate_func_name=collate_func_name,
        ignore_label=ignore_label,
        capacity=capacity,
        process_index=jax.process_index(),
        process_count=procs,
        shards=1 if gspmd else max(gpus // procs, 1),
    )

    if auto_calibrate:
        # measure-and-bind the windowed-conv capacity knobs when the config
        # carries none (utils/calibrate.py) — ME-style it-just-works
        # generality under static shapes; no-op for measured configs
        from nerf_downstream_tpu.utils.calibrate import maybe_auto_calibrate

        if procs > 1:
            # per-process scans would derive divergent static shapes ->
            # divergent compiled programs across the pod; pin the caps
            # offline (co3d_3d/calibrate.py) and --ginc the result
            if maybe_auto_calibrate(data_module, dry_run=True):
                raise ValueError(
                    "multi-process runs need pinned capacity knobs: run "
                    "python -m co3d_3d.calibrate offline and compose the "
                    "generated gin (auto-calibration scans per-process "
                    "data shards and would diverge)"
                )
        elif maybe_auto_calibrate(data_module):
            logging.info("auto-calibrated windowed-conv capacity knobs")

    task = get_training_module(training_module)(
        model,
        optimizer_name=optimizer_name,
        scheduler_name=scheduler_name,
        lr=lr,
        weight_decay=weight_decay,
        warmup_steps=warmup_steps,
        ignore_label=ignore_label,
        void_weight=void_weight,
        log_every_n_steps=log_every_n_steps,
        reset_profiler_every_n_steps=reset_profiler_every_n_steps,
        load_weights=load_weights,
        load_optimizers=load_optimizers,
        transfer_self_supervised=transfer_self_supervised,
        checkpoint_path=checkpoint_path,
        debug=debug,
        use_sync_grad=use_sync_grad,
        datamodule=data_module,
        scheduler_interval=scheduler_interval,
        axis_name=axis_name,
        # host augmentations moved into the jitted step; the train
        # datasets drop the same names from their Compose
        # (data/device_transforms.py)
        device_transforms=tuple(device_transforms),
    )

    logger_objs = [
        get_logger(name, save_path, run_name, project_name) for name in loggers
    ]
    from nerf_downstream_tpu.train.loggers import logged

    hparams = logged()
    for lg in logger_objs:
        lg.log_hyperparams(hparams)

    profiler = SumProfiler()
    warmup = warmup_steps if warmup_steps and warmup_steps > 0 else 0
    trainer = Trainer(
        task,
        data_module,
        max_steps=max_steps + warmup,
        max_epochs=max_epochs,
        val_every_n_steps=val_every_n_steps,
        log_every_n_steps=log_every_n_steps,
        loggers=logger_objs,
        default_root_dir=save_path,
        monitor_metric=monitor_metric,
        profiler=profiler,
        resume_from_checkpoint=(
            os.path.join(save_path, "last.ckpt")
            if resume_training
            and os.path.exists(os.path.join(save_path, "last.ckpt"))
            else None
        ),
        reset_profiler_every_n_steps=reset_profiler_every_n_steps,
        seed=seed,
        devices=max(gpus, 1),
        parallel_mode=parallel_mode,
        model_parallel=model_parallel,
    )
    state = trainer.fit()
    logging.info("\n" + profiler.summary())

    if evaluate:
        results = trainer.test(state, ckpt_path="best", phase=test_phase)
        if jax.process_index() == 0:  # rank-zero artifact (shared FS)
            with open(os.path.join(save_path, "eval_results.json"), "w") as f:
                json.dump({k: float(v) for k, v in results.items()}, f)
    return state


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ginc", action="append", help="gin config file")
    parser.add_argument("--ginb", action="append", help="gin bindings")
    parser.add_argument("--save_path", type=str, default="experiments")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--run_name", type=str, default=None)
    parser.add_argument("--run_name_postfix", type=str, default=None)
    parser.add_argument(
        "--gpus", type=int, default=1,
        help="data-parallel devices (GLOBAL count under multi-process)",
    )
    parser.add_argument("--seed", type=int, default=777)
    parser.add_argument("--debug", action="store_true")
    # multi-host launch (the reference's SLURM srun per-node processes,
    # sbatch.sh:1-44): each process joins the jax.distributed coordination
    # service and contributes its local devices to the global mesh
    parser.add_argument(
        "--dist_coordinator", type=str, default=None,
        help="coordinator address host:port (enables jax.distributed)",
    )
    parser.add_argument("--dist_num_processes", type=int, default=None)
    parser.add_argument("--dist_process_id", type=int, default=None)
    args = parser.parse_args(argv)

    run_name = args.run_name if args.run_name is not None else "default"
    if args.run_name_postfix is not None:
        run_name = f"{run_name}-{args.run_name_postfix}"
    run_name += f"_{args.seed}"
    setup_logger(run_name, args.debug)

    import jax

    if args.dist_coordinator:
        jax.distributed.initialize(
            coordinator_address=args.dist_coordinator,
            num_processes=args.dist_num_processes,
            process_id=args.dist_process_id,
        )

    logging.info(f"Found {len(jax.devices())} devices: {jax.devices()}")
    ginbs = [f"train.gpus={args.gpus}"]
    if args.ginb:
        ginbs.extend(args.ginb)
    logging.info(f"Gin configuration files: {args.ginc}")
    logging.info(f"Gin bindings: {ginbs}")

    seed_everything(args.seed)
    gin.parse_config_files_and_bindings(args.ginc, ginbs)
    return train(
        save_path=args.save_path,
        resume_training=args.resume,
        run_name=args.run_name,
        run_name_postfix=args.run_name_postfix,
        seed=args.seed,
    )


if __name__ == "__main__":
    main()
