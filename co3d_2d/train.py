"""2D training CLI (reference co3d_2d/train.py).

Interface parity: ``python -m co3d_2d.train --ginc
configs/<family>/<model>.gin [--seed N] [--resume_training] [--ckpt_path]``;
gin-configured ``run()`` with the reference's parameter surface (:39-53).
Checkpoints best-on-val/acc + last; epoch-driven schedule translated to
steps (steps_per_epoch * max_epochs).

TPU notes: ``num_gpus > 1`` trains data-parallel over a ``jax.sharding``
mesh — pmean'd gradients in a shard_map step with SyncBatchNorm via the BN
``axis_name`` (the reference's ``accelerator="ddp"`` + ``sync_batchnorm``,
co3d_2d/train.py:93-103); ``precision=16`` maps to bfloat16 compute.
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional

from nerf_downstream_tpu import config as gin
from nerf_downstream_tpu.data.loader2d import DataModule2D
from nerf_downstream_tpu.train.loggers import get_logger
from nerf_downstream_tpu.train.loop import Trainer
from nerf_downstream_tpu.train.modules2d import LitModel


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise ValueError("Boolean value expected.")


@gin.configurable
def run(
    ckpt_path: Optional[str] = None,
    resume_training: bool = False,
    seed: int = 0,
    run_name: Optional[str] = None,
    num_gpus: int = 1,
    log_every_n_steps: int = 100,
    max_epochs: int = 1000,
    check_val_every_n_epoch: int = 10,
    precision: int = 16,
    progressbar_refresh_rate: int = 20,
    run_train: bool = True,
    run_eval: bool = True,
    loggers: tuple = ("csv",),
    log_dir: str = "co3d_2d/logs",
):
    run_name = (run_name or "default") + f"_{seed}"
    save_dir = os.path.join(log_dir, run_name)
    os.makedirs(save_dir, exist_ok=True)

    import jax

    dtype = None
    if precision == 16:
        import jax.numpy as jnp

        dtype = jnp.bfloat16
        gin.bind("ResNetBased", "dtype", dtype)
        gin.bind("ViTBased", "dtype", dtype)

    data_module = DataModule2D(
        process_index=jax.process_index(), process_count=jax.process_count()
    )
    if num_gpus > 1:
        assert data_module.batch_size % num_gpus == 0, (
            f"batch_size {data_module.batch_size} not divisible by "
            f"num_gpus {num_gpus}"
        )
        task = LitModel(axis_name="data", use_sync_batchnorm=True)
    else:
        task = LitModel()
    steps_per_epoch = data_module.steps_per_epoch()
    max_steps = steps_per_epoch * max_epochs
    task.set_num_training_steps(max_steps)

    project = "co3d-downstream-2d" if run_train else "co3d-downstream-2d-test"
    logger_objs = [
        get_logger(name, log_dir, run_name, project) for name in loggers
    ]

    trainer = Trainer(
        task,
        data_module,
        max_steps=max_steps,
        val_every_n_steps=steps_per_epoch * check_val_every_n_epoch,
        log_every_n_steps=log_every_n_steps,
        loggers=logger_objs,
        default_root_dir=save_dir,
        monitor_metric="val/acc",
        seed=seed,
        resume_from_checkpoint=ckpt_path if resume_training else None,
        devices=num_gpus,
    )
    state = None
    if run_train:
        state = trainer.fit()
    if run_eval:
        if state is None:
            first = next(iter(data_module.val_batches("test")))
            state = task.create_state(jax.random.PRNGKey(seed), first)
        results = trainer.test(
            state,
            ckpt_path="best" if ckpt_path is None else ckpt_path,
            phase="test",
        )
        logging.info(f"test results: {results}")
        return results
    return state


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ginc", action="append", help="gin config file")
    parser.add_argument("--ginb", action="append", help="gin bindings")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ckpt_path", type=str, default=None)
    parser.add_argument("--resume_training", type=str2bool, default=False)
    parser.add_argument("--num_gpus", type=int, default=1)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, force=True)
    gin.parse_config_files_and_bindings(args.ginc, args.ginb)

    from co3d_3d.train import seed_everything

    seed_everything(args.seed)
    return run(
        ckpt_path=args.ckpt_path,
        resume_training=args.resume_training,
        seed=args.seed,
        num_gpus=args.num_gpus,
    )


if __name__ == "__main__":
    main()
