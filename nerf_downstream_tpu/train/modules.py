"""Task modules: the JAX re-design of the reference's LightningModules.

Reference contract (co3d_3d/src/modules/):
- ``BaseModule`` (lightning_module_base.py:13-124): stores hyperparameters,
  wires optimizer+scheduler, implements the three checkpoint-load modes
  (load_weights / load_optimizers with LR override / transfer_self_supervised
  key rewrite).
- ``SegmentationTraining`` (segmentation_training.py): weighted CE with
  ignore_index + optional void-class weight, OA/mIoU step metrics, IoUMeter
  epoch metrics, per-class IoU table, eval_results.json.
- ``ClassificationTraining`` (classification_training.py): CE, top-1/top-5.

TPU-native shape: a task builds *pure jitted step functions* over a
TrainState; the trainer owns the loop. Under pjit the global masked-mean
loss already weights every point equally across shards, which is exactly
what the reference's ``use_sync_grad`` point-count rescale reconstructs on
top of DDP's per-rank mean (segmentation_training.py:112-120) — so the flag
is accepted and the semantics hold by construction.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_downstream_tpu import config as cfg
from nerf_downstream_tpu.models.interface import process_input
from nerf_downstream_tpu.train import metrics as M
from nerf_downstream_tpu.train.optim import get_optimizer, get_scheduler
from nerf_downstream_tpu.train.state import TrainState


def split_ema_state(batch_stats):
    """Split out PowerNorm ``ema_gz`` leaves (flat path dict) from a
    batch_stats tree.

    The reference PowerNorm updates ``ema_gz`` during the backward pass
    (powernorm.py:99-139); functionally, the train step differentiates the
    loss w.r.t. these leaves and the custom VJP returns the *new buffer
    value* as their cotangent (models/mink/powernorm.py::_power_core_bwd).
    """
    from flax import traverse_util

    flat = traverse_util.flatten_dict(dict(batch_stats))
    ema = {k: v for k, v in flat.items() if k[-1] == "ema_gz"}
    return flat, ema


def merge_ema_state(new_stats, new_ema):
    """Overwrite the ema_gz leaves of ``new_stats`` with the values the
    backward pass produced."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(dict(new_stats))
    flat.update(new_ema)
    return traverse_util.unflatten_dict(flat)


class BaseTask:
    def __init__(
        self,
        model,
        optimizer_name: str = "SGD",
        scheduler_name: str = "PolyLR",
        lr: float = 1e-3,
        weight_decay: float = 1e-5,
        warmup_steps: int = -1,
        ignore_label: int = -100,
        void_weight: Optional[float] = None,
        log_every_n_steps: int = 10,
        reset_profiler_every_n_steps: int = 1000,
        load_weights: bool = False,
        load_optimizers: bool = False,
        transfer_self_supervised: bool = False,
        checkpoint_path: Optional[str] = None,
        export_path: Optional[str] = None,
        debug: bool = False,
        use_sync_grad: bool = False,
        datamodule=None,
        scheduler_interval: str = "step",
        save_pred: bool = False,
        save_pred_path: Optional[str] = None,
        axis_name: Optional[str] = None,
        device_transforms: tuple = (),
    ):
        # mirror BaseModule's store-everything ctor
        for name, value in list(vars().items()):
            if name not in ("self", "__class__"):
                setattr(self, name, value)
        if load_weights or load_optimizers:
            assert checkpoint_path is not None
        # augmentations moved off the host into the jitted train step
        # (data/device_transforms.py); the train datasets drop the same
        # names from their host Compose via transforms.build(device_ok=)
        from nerf_downstream_tpu.data import device_transforms as DT

        self._device_aug = DT.build(
            device_transforms,
            num_scenes=getattr(model, "num_batches", None),
        )
        self._train_step_cache = {}
        self._eval_step_cache = None
        self.schedule = None
        if scheduler_name.lower() != "none":
            self.schedule = get_scheduler(
                scheduler_name, lr, warmup_steps if warmup_steps > 0 else None
            )

    # -- optimizer / state ---------------------------------------------------

    def make_tx(self):
        lr = self.schedule if self.schedule is not None else self.lr
        return get_optimizer(self.optimizer_name, lr, self.weight_decay)

    def create_state(self, rng, example_batch) -> TrainState:
        field = process_input(example_batch)
        # jit the init: op-by-op dispatch would trigger one compile per op
        variables = jax.jit(
            lambda r, f: self.model.init(r, f, train=False)
        )(rng, field)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx = self.make_tx()
        state = TrainState.create(self.model.apply, params, batch_stats, tx)
        state = self._maybe_load_checkpoint(state)
        return state

    def _maybe_load_checkpoint(self, state: TrainState) -> TrainState:
        if self.checkpoint_path is None:
            return state
        from nerf_downstream_tpu.train import checkpoints

        ckpt = checkpoints.load_checkpoint(self.checkpoint_path)
        if self.load_weights:
            if self.transfer_self_supervised:
                params, batch_stats = checkpoints.convert_self_supervised(
                    ckpt["params"], ckpt["batch_stats"],
                    state.params, state.batch_stats,
                )
                state = state.replace(params=params, batch_stats=batch_stats)
            else:
                state = checkpoints.restore_into(state, ckpt, weights=True)
            logging.info(f"Loaded model weights from {self.checkpoint_path}")
        if self.load_optimizers:
            # LR schedule restarts from the new run's LR by construction
            # (the schedule is part of tx, not of the loaded state) —
            # reference lightning_module_base.py:96-104.
            state = checkpoints.restore_into(
                state, ckpt, weights=False, optimizer=True
            )
            logging.info(
                f"Loaded optimizer parameters from {self.checkpoint_path}"
            )
        return state

    def current_lr(self, step) -> float:
        if self.schedule is None:
            return float(self.lr)
        return float(self.schedule(step))

    # -- steps ---------------------------------------------------------------

    def loss_and_metrics(self, logits, batch):
        raise NotImplementedError

    def _apply(self, params, batch_stats, batch, train: bool, rng=None):
        if train and self._device_aug is not None and rng is not None:
            key = jax.random.fold_in(rng, 0x5EED)
            if self.axis_name is not None:
                # inside shard_map: decorrelate noise across shards
                key = jax.random.fold_in(
                    key, jax.lax.axis_index(self.axis_name)
                )
            batch = self._device_aug(batch, key)
        field = process_input(batch)
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            rngs = {"dropout": rng} if rng is not None else None
            out, mut = self.model.apply(
                variables, field, train=True, mutable=["batch_stats"],
                rngs=rngs,
            )
            return out, mut["batch_stats"]
        out = self.model.apply(variables, field, train=False)
        return out, batch_stats

    def make_train_step(self, donate: bool = True):
        # cache: a fresh jit wrapper per call would retrace/recompile
        if donate in self._train_step_cache:
            return self._train_step_cache[donate]
        base_key = jax.random.PRNGKey(0)

        def train_step(state: TrainState, batch):
            rng = jax.random.fold_in(base_key, state.step)
            flat_stats, ema = split_ema_state(state.batch_stats)

            def loss_fn(params, ema_in):
                from flax import traverse_util

                bs = dict(flat_stats)
                bs.update(ema_in)
                logits, new_stats = self._apply(
                    params, traverse_util.unflatten_dict(bs), batch,
                    train=True, rng=rng,
                )
                loss, mets = self.loss_and_metrics(logits, batch)
                return loss, (new_stats, mets)

            if ema:
                # PowerNorm: the ema_gz "cotangents" are the new buffer values
                (loss, (new_stats, mets)), (grads, new_ema) = (
                    jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                        state.params, ema
                    )
                )
                new_stats = merge_ema_state(new_stats, new_ema)
            else:
                (loss, (new_stats, mets)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, ema)
            new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
            mets = dict(mets, loss=loss)
            return new_state, mets

        fn = jax.jit(train_step, donate_argnums=(0,) if donate else ())
        self._train_step_cache[donate] = fn
        return fn

    def make_parallel_train_step(self, mesh, axis: str = "data"):
        """shard_map data-parallel step over ``mesh`` (Trainer devices>1);
        requires the task to have been built with ``axis_name == axis``."""
        key = ("parallel", id(mesh))
        if key not in self._train_step_cache:
            from nerf_downstream_tpu.parallel.train import (
                make_parallel_train_step,
            )

            self._train_step_cache[key] = make_parallel_train_step(
                self, mesh, axis
            )
        return self._train_step_cache[key]

    def make_parallel_eval_step(self, mesh, axis: str = "data"):
        key = ("parallel_eval", id(mesh))
        if key not in self._train_step_cache:
            from nerf_downstream_tpu.parallel.train import (
                make_parallel_eval_step,
            )

            self._train_step_cache[key] = make_parallel_eval_step(
                self, mesh, axis
            )
        return self._train_step_cache[key]

    def make_eval_step(self):
        if self._eval_step_cache is not None:
            return self._eval_step_cache

        def eval_step(state: TrainState, batch):
            logits, _ = self._apply(
                state.params, state.batch_stats, batch, train=False
            )
            loss, mets = self.loss_and_metrics(logits, batch)
            return logits, dict(mets, loss=loss)

        self._eval_step_cache = jax.jit(eval_step)
        return self._eval_step_cache

    # epoch-level aggregation hooks (trainer calls these)
    def on_validation_start(self):
        pass

    def validation_batch_end(self, logits, batch):
        pass

    def validation_epoch_end(self, step_results: list, root_dir: str) -> dict:
        raise NotImplementedError

    def validation_sums(self):
        """Host-side validation accumulators as a pytree of SUMS (or None).
        Under multi-process the Trainer allgathers+adds these across
        processes before ``validation_epoch_end`` (each process only
        scored its local rows) — the reference relies on torchmetrics'
        distributed-sum state for the same (src/metrics.py:5-58)."""
        return None

    def set_validation_sums(self, sums):
        pass


def _weighted_ce(logits, labels, valid, class_weight, axis_name=None):
    """torch-style weighted cross entropy: sum(w_y * nll) / sum(w_y).

    With ``axis_name`` the denominator is the *global* weight sum, so that
    psum-ing the resulting gradients across the mesh axis reproduces the
    exact global-batch gradient (every point weighted equally — the
    reference's use_sync_grad semantics, segmentation_training.py:112-120).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    c = logits.shape[-1]
    lab = jnp.clip(labels, 0, c - 1)
    nll = -jnp.take_along_axis(logp, lab[:, None], axis=-1)[:, 0]
    w = class_weight[lab] * valid.astype(jnp.float32)
    denom = jnp.sum(w)
    if axis_name is not None:
        denom = jax.lax.psum(denom, axis_name)
    return jnp.sum(nll * w) / jnp.maximum(denom, 1e-8)


@cfg.configurable("SegmentationTraining")
class SegmentationTraining(BaseTask):
    """Per-point segmentation (reference segmentation_training.py:47-228)."""

    def __init__(self, model, **kwargs):
        super().__init__(model, **kwargs)
        self.num_labels = cfg.query_parameter(
            "get_model.out_channel", default=model.out_channel
        )
        self.void_label = cfg.query_parameter(
            "PlenoxelScannetDataset.void_label", default=None
        )
        w = np.ones(self.num_labels, np.float32)
        if self.void_weight is not None and self.void_weight > 0:
            w[-1] = self.void_weight
        self.class_weight = jnp.asarray(w)
        self.iou_state = M.IoUMeterState.create(self.num_labels)
        self.best_miou = -1.0

    def loss_and_metrics(self, logits, batch):
        labels = jnp.asarray(batch["labels"], jnp.int32)
        mask = jnp.asarray(batch["mask"], bool)
        valid = mask & (labels != self.ignore_label)
        loss = _weighted_ce(
            logits, labels, valid, self.class_weight, self.axis_name
        )
        pred = jnp.argmax(logits, axis=-1)
        correct = jnp.sum((pred == labels) & valid)
        total = jnp.sum(valid)
        if self.axis_name is not None:
            correct = jax.lax.psum(correct, self.axis_name)
            total = jax.lax.psum(total, self.axis_name)
        oa = 100.0 * correct / jnp.maximum(total, 1)
        hist = M.fast_hist(
            jnp.where(valid, pred, self.num_labels + 1),
            jnp.where(valid, labels, self.num_labels + 1),
            self.num_labels,
        )
        n_ignored = jnp.sum(mask & (labels == self.ignore_label))
        n_rows = jnp.sum(mask)
        if self.axis_name is not None:
            # in-step mIoU/ignore_ratio must aggregate the *global* batch —
            # these flow out of shard_map through replicated out_specs
            # (parallel/train.py), so shard-local values would silently be
            # presented as global.
            hist = jax.lax.psum(hist, self.axis_name)
            n_ignored = jax.lax.psum(n_ignored, self.axis_name)
            n_rows = jax.lax.psum(n_rows, self.axis_name)
        ious = M.per_class_iu(hist) * 100
        ignore_ratio = 100.0 * n_ignored / jnp.maximum(n_rows, 1)
        return loss, {
            "OA": oa,
            "mIoU": jnp.mean(ious),
            "ignore_ratio": ignore_ratio,
        }

    def on_validation_start(self):
        self.iou_state = M.IoUMeterState.create(self.num_labels)
        self._val_batch_idx = 0

    def validation_batch_end(self, logits, batch):
        labels = jnp.asarray(batch["labels"], jnp.int32)
        mask = jnp.asarray(batch["mask"], bool)
        valid = mask & (labels != self.ignore_label)
        pred = jnp.argmax(logits, axis=-1)
        self.iou_state = M.iou_update(
            self.iou_state, pred, labels, valid, self.num_labels
        )
        # prediction dumping every 2nd scene (reference
        # segmentation_training.py:143-158)
        if self.save_pred and self._val_batch_idx % 2 == 0:
            assert self.save_pred_path is not None
            os.makedirs(self.save_pred_path, exist_ok=True)
            meta = batch.get("metadata", [{}])
            inst = meta[0].get("file", f"batch{self._val_batch_idx}")
            np.savez(
                os.path.join(self.save_pred_path, f"{inst}.npz"),
                coordinates=np.asarray(batch["coordinates"]),
                logits=np.asarray(logits),
                dists=np.asarray(batch.get("dists", np.zeros(0))),
                labels=np.asarray(labels),
            )
            logging.info(f"saved prediction for {inst}")
        self._val_batch_idx += 1

    def validation_sums(self):
        return self.iou_state

    def set_validation_sums(self, sums):
        self.iou_state = sums

    def validation_epoch_end(self, step_results, root_dir):
        assert len(step_results) > 0
        out = {}
        for k in ["OA", "loss", "iter_time", "flops"]:
            vals = [r[k] for r in step_results if k in r]
            if vals:
                out[f"val/{k}"] = float(np.mean(vals))
        res = M.iou_compute(self.iou_state, void_label=self.void_label)
        from nerf_downstream_tpu.data.scannet import CLASS_LABELS

        labels = list(CLASS_LABELS[: self.num_labels])
        while len(labels) < self.num_labels:
            labels.append(f"class{len(labels)}")
        argsort = np.argsort(labels)
        class_labels = np.array(labels)[argsort]
        ious = res["iou_per_class"][argsort] * 100
        accs = res["acc_per_class"][argsort] * 100
        print(" & ".join(class_labels))
        print(" & ".join(f"{i:.1f}" for i in ious))
        print(" & ".join(class_labels))
        print(" & ".join(f"{a:.1f}" for a in accs))
        print(f"miou: {res['mIoU']}")
        print(f"macc: {res['mAcc']}")
        result_dict = dict(
            labels=class_labels.tolist(),
            iou=[*ious.tolist(), res["mIoU"]],
            acc=[*accs.tolist(), res["mAcc"]],
        )
        if root_dir:
            with open(os.path.join(root_dir, "eval_results.json"), "w") as f:
                json.dump(result_dict, f)
        out["val/mIoU"] = res["mIoU"] * 100
        out["val/mAcc"] = res["mAcc"] * 100
        if out["val/mIoU"] > self.best_miou:
            self.best_miou = out["val/mIoU"]
        out["val/best_mIoU"] = self.best_miou
        return out


@cfg.configurable("ClassificationTraining")
class ClassificationTraining(BaseTask):
    """Whole-sample classification (reference classification_training.py)."""

    def __init__(self, model, **kwargs):
        super().__init__(model, **kwargs)
        self.num_classes = cfg.query_parameter(
            "get_model.out_channel", default=model.out_channel
        )
        self._val_correct1 = 0
        self._val_correct5 = 0
        self._val_count = 0

    def loss_and_metrics(self, logits, batch):
        labels = jnp.asarray(batch["labels"], jnp.int32)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        if "sample_mask" in batch:  # ragged final val batch padding
            w = jnp.asarray(batch["sample_mask"], jnp.float32)
        else:
            w = jnp.ones_like(nll)
        denom = jnp.sum(w)
        if self.axis_name is not None:
            denom = jax.lax.psum(denom, self.axis_name)
        loss = jnp.sum(nll * w) / jnp.maximum(denom, 1)
        accs = M.topk_accuracy(logits, labels, ks=(1, 5))
        if self.axis_name is not None:
            accs = {
                k: jax.lax.pmean(v, self.axis_name) for k, v in accs.items()
            }
        return loss, accs

    def on_validation_start(self):
        self._val_correct1 = 0
        self._val_correct5 = 0
        self._val_count = 0

    def validation_batch_end(self, logits, batch):
        labels = np.asarray(batch["labels"])
        lg = np.asarray(logits)
        valid = np.asarray(
            batch.get("sample_mask", np.ones(len(labels), bool))
        )
        order = np.argsort(-lg, axis=-1)
        self._val_correct1 += int(((order[:, 0] == labels) & valid).sum())
        self._val_correct5 += int(
            ((order[:, :5] == labels[:, None]).any(-1) & valid).sum()
        )
        self._val_count += int(valid.sum())

    def validation_sums(self):
        return np.array(
            [self._val_correct1, self._val_correct5, self._val_count],
            np.int64,
        )

    def set_validation_sums(self, sums):
        self._val_correct1, self._val_correct5, self._val_count = (
            int(x) for x in np.asarray(sums)
        )

    def validation_epoch_end(self, step_results, root_dir):
        assert len(step_results) > 0
        n = max(self._val_count, 1)
        out = {
            "val/acc1": 100.0 * self._val_correct1 / n,
            "val/acc5": 100.0 * self._val_correct5 / n,
            "val/loss": float(
                np.mean([r["loss"] for r in step_results if "loss" in r])
            ),
        }
        return out


@cfg.configurable("EnsembleClassificationTraining")
class EnsembleClassificationTraining(ClassificationTraining):
    """Joint 2D+3D classification over ``models/ensemble.py::Ensemble2D3D``
    (BASELINE.json stretch config #5). Batches carry BOTH ``images`` and the
    sparse-voxel fields (``data/joint.py``); the fused model jits into one
    step and data-parallelizes with the same shard_map machinery."""

    def create_state(self, rng, example_batch):
        field = process_input(example_batch)
        images = jnp.asarray(example_batch["images"], jnp.float32)
        variables = jax.jit(
            lambda r, im, f: self.model.init(r, im, f, train=False)
        )(rng, images, field)
        from nerf_downstream_tpu.train.state import TrainState

        state = TrainState.create(
            self.model.apply,
            variables["params"],
            variables.get("batch_stats", {}),
            self.make_tx(),
        )
        return self._maybe_load_checkpoint(state)

    def _apply(self, params, batch_stats, batch, train: bool, rng=None):
        field = process_input(batch)
        images = jnp.asarray(batch["images"], jnp.float32)
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            rngs = {"dropout": rng} if rng is not None else None
            out, mut = self.model.apply(
                variables, images, field, train=True,
                mutable=["batch_stats"], rngs=rngs,
            )
            return out, mut["batch_stats"]
        out = self.model.apply(variables, images, field, train=False)
        return out, batch_stats


MODULES = {
    "SegmentationTraining": SegmentationTraining,
    "ClassificationTraining": ClassificationTraining,
    "EnsembleClassificationTraining": EnsembleClassificationTraining,
}


def get_training_module(name: str):
    """reference src/modules/__init__.py:13-17."""
    # ExceptionSafe variant maps to the standard one: XLA static shapes make
    # the reference's per-step sparse-OOM catching (segmentation_training.py:
    # 231-328) structurally unnecessary — memory is fixed at compile time.
    if name == "ExceptionSafeSegmentationTraining":
        name = "SegmentationTraining"
    if name not in MODULES:
        raise ValueError(f"unknown training module {name!r}")
    return MODULES[name]
