"""PAConv standalone ModelNet40 trainer (reference
co3d_3d/src/models/paconv/main.py, 312 LoC single-GPU, and main_ddp.py,
621 LoC manual NCCL DDP).

One CLI covers both: ``--devices N`` runs the shard_map data-parallel step
over an N-device mesh (the TPU replacement for mp.spawn + NCCL + manual
all_reduce, main_ddp.py:614-618,247-257); metrics are globally exact by
construction, avoiding the double-count bug the reference warns about
(main_ddp.py:586-590).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from nerf_downstream_tpu import config as gin
from nerf_downstream_tpu.data.datasets import get_dataset
from nerf_downstream_tpu.data.utils import collate_pointnet
from nerf_downstream_tpu.models import get_model
from nerf_downstream_tpu.train.loggers import get_logger
from nerf_downstream_tpu.train.loop import Trainer
from nerf_downstream_tpu.train.modules import ClassificationTraining


class PointCloudDM:
    """Dense [B, N, 3] batches for PAConv/DGCNN models."""

    def __init__(self, dataset_cls, batch_size, val_batch_size, num_workers,
                 seed=0):
        self.batch_size = batch_size
        self.val_batch_size = val_batch_size
        self.num_workers = num_workers
        self.rng = np.random.default_rng(seed)
        self._cls = dataset_cls
        self._ds = {}

    def dataset(self, phase):
        if phase not in self._ds:
            self._ds[phase] = self._cls(phase=phase)
        return self._ds[phase]

    def _collate(self, ds, idxs):
        batch = collate_pointnet([ds[int(i)] for i in idxs])
        batch["mask"] = np.ones(len(idxs), bool)
        return batch

    def train_batches(self):
        ds = self.dataset("train")
        while True:
            order = self.rng.permutation(len(ds))
            for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
                yield self._collate(ds, order[i : i + self.batch_size])

    def val_batches(self, phase="val"):
        ds = self.dataset(phase)
        idx = list(range(len(ds)))
        for i in range(0, len(idx) - self.val_batch_size + 1,
                       self.val_batch_size):
            yield self._collate(ds, idx[i : i + self.val_batch_size])


class DensePointTask(ClassificationTraining):
    """Classification task whose model consumes dense [B, N, C] clouds."""

    def _apply(self, params, batch_stats, batch, train: bool, rng=None):
        import jax.numpy as jnp

        x = jnp.asarray(batch["coordinates"], jnp.float32)
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            rngs = {"dropout": rng} if rng is not None else None
            out, mut = self.model.apply(
                variables, x, train=True, mutable=["batch_stats"], rngs=rngs
            )
            return out, mut["batch_stats"]
        return self.model.apply(variables, x, train=False), batch_stats

    def create_state(self, rng, example_batch):
        import jax
        import jax.numpy as jnp

        from nerf_downstream_tpu.train.state import TrainState

        x = jnp.asarray(example_batch["coordinates"], jnp.float32)
        variables = jax.jit(
            lambda r, xx: self.model.init(
                {"params": r, "dropout": r}, xx, train=False
            )
        )(rng, x)
        state = TrainState.create(
            self.model.apply,
            variables["params"],
            variables.get("batch_stats", {}),
            self.make_tx(),
        )
        return self._maybe_load_checkpoint(state)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ginc", action="append")
    parser.add_argument("--ginb", action="append")
    parser.add_argument("--model", type=str, default="PAConvPointNet")
    parser.add_argument("--data_root", type=str,
                        default="./datasets/modelnet40_ply_hdf5_2048/")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--val_batch_size", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--lr", type=float, default=0.1)
    parser.add_argument("--weight_decay", type=float, default=1e-4)
    parser.add_argument("--num_points", type=int, default=1024)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--save_path", type=str, default="experiments/paconv")
    parser.add_argument("--devices", type=int, default=1)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, force=True)
    gin.parse_config_files_and_bindings(args.ginc, args.ginb)
    gin.bind("ModelNet40H5Dataset", "data_root", args.data_root)
    gin.bind("ModelNet40H5Dataset", "num_points", args.num_points)
    gin.bind("get_model", "out_channel", 40)

    from co3d_3d.train import seed_everything

    seed_everything(args.seed)
    model = get_model(name=args.model, in_channel=3, out_channel=40)
    dm = PointCloudDM(
        get_dataset("ModelNet40H5Dataset"), args.batch_size,
        args.val_batch_size, args.workers, args.seed,
    )
    ds = dm.dataset("train")
    steps_per_epoch = max(1, len(ds) // args.batch_size)
    gin.bind("train", "max_steps", steps_per_epoch * args.epochs)
    if args.devices > 1:
        assert args.batch_size % args.devices == 0, (
            f"batch_size {args.batch_size} not divisible by "
            f"{args.devices} devices"
        )
        assert args.val_batch_size % args.devices == 0, (
            f"val_batch_size {args.val_batch_size} not divisible by "
            f"{args.devices} devices"
        )
    task = DensePointTask(
        model, optimizer_name="SGD", scheduler_name="CosineAnnealingLR",
        lr=args.lr, weight_decay=args.weight_decay,
        axis_name="data" if args.devices > 1 else None,
    )
    gin.parse_config("SGD.momentum = 0.9")
    trainer = Trainer(
        task, dm, max_steps=steps_per_epoch * args.epochs,
        val_every_n_steps=steps_per_epoch,
        loggers=[get_logger("csv", args.save_path, "paconv")],
        default_root_dir=args.save_path, monitor_metric="val/acc1",
        devices=args.devices,
    )
    state = trainer.fit()
    return trainer.test(state, ckpt_path="best", phase="val")


if __name__ == "__main__":
    main()
