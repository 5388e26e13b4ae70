"""End-to-end trainer smoke: synthetic seg task, Res16UNet14, ckpt roundtrip."""

import os

import numpy as np
import pytest

from nerf_downstream_tpu import config as cfg
from nerf_downstream_tpu.models import get_model
from nerf_downstream_tpu.train.loggers import CSVLogger
from nerf_downstream_tpu.train.loop import Trainer
from nerf_downstream_tpu.train.modules import (
    ClassificationTraining,
    SegmentationTraining,
    get_training_module,
)


class SyntheticSegDM:
    """Two blobs with different labels; fixed capacity batches."""

    def __init__(self, capacity=128, n_valid=96, c=3, num_classes=4, seed=0):
        self.rng = np.random.default_rng(seed)
        self.capacity = capacity
        self.n_valid = n_valid
        self.c = c
        self.num_classes = num_classes

    def _make(self):
        cap, n = self.capacity, self.n_valid
        coords = np.zeros((cap, 4), np.float32)
        lin = self.rng.choice(2 * 12**3, size=n, replace=False)
        coords[:n, 0] = lin // 12**3
        rem = lin % 12**3
        coords[:n, 1] = rem // 144
        coords[:n, 2] = (rem // 12) % 12
        coords[:n, 3] = rem % 12
        labels = np.full(cap, -100, np.int32)
        # label = quadrant of x: learnable from coords-as-features
        labels[:n] = (coords[:n, 1] // 3).astype(np.int32) % self.num_classes
        feats = np.zeros((cap, self.c), np.float32)
        feats[:n] = coords[:n, 1:4] / 12.0
        mask = np.arange(cap) < n
        return {
            "coordinates": coords,
            "features": feats,
            "mask": mask,
            "labels": labels,
        }

    def train_batches(self):
        while True:
            yield self._make()

    def val_batches(self, phase="val"):
        for _ in range(2):
            yield self._make()


@pytest.fixture(autouse=True)
def _clean_cfg():
    cfg.clear_config()
    yield
    cfg.clear_config()


def test_segmentation_training_loop(tmp_path):
    cfg.parse_config("train.max_steps = 6\nget_model.out_channel = 4")
    model = get_model(
        name="Res16UNet14",
        out_channel=4,
        num_batches=2,
        planes=(8, 8, 8, 8, 8, 8, 8, 8),
    )
    task = SegmentationTraining(
        model,
        optimizer_name="SGD",
        scheduler_name="CosineAnnealingLR",
        lr=0.1,
        warmup_steps=2,
        ignore_label=-100,
    )
    dm = SyntheticSegDM()
    tr = Trainer(
        task,
        dm,
        max_steps=6,
        val_every_n_steps=3,
        log_every_n_steps=2,
        loggers=[CSVLogger(str(tmp_path), "run")],
        default_root_dir=str(tmp_path),
        monitor_metric="val/mIoU",
    )
    state = tr.fit()
    assert int(state.step) == 6
    assert os.path.exists(tmp_path / "last.ckpt")
    assert os.path.exists(tmp_path / "best.ckpt")
    assert os.path.exists(tmp_path / "eval_results.json")
    assert os.path.exists(tmp_path / "run" / "metrics.csv")
    # test() reloads best ckpt and evaluates
    out = tr.test(state, ckpt_path="best", phase="val")
    assert "val/mIoU" in out


def test_seg_learns_synthetic(tmp_path):
    """A few hundred steps must push OA well above chance."""
    cfg.parse_config("train.max_steps = 80\nget_model.out_channel = 4")

    class EasySegDM(SyntheticSegDM):
        def _make(self):
            b = super()._make()
            lab = b["labels"]
            b["labels"] = np.where(
                lab >= 0, (b["coordinates"][:, 1] >= 6).astype(np.int32), lab
            )
            return b

    model = get_model(
        name="Res16UNet14",
        out_channel=4,
        num_batches=2,
        planes=(8, 8, 8, 8, 8, 8, 8, 8),
    )
    task = SegmentationTraining(
        model, optimizer_name="Adam", scheduler_name="CosineAnnealingLR",
        lr=0.01, ignore_label=-100,
    )
    dm = EasySegDM()
    tr = Trainer(
        task, dm, max_steps=80, default_root_dir=str(tmp_path),
        log_every_n_steps=1000,
    )
    state = tr.fit()
    out = tr.validate(state)
    assert out["val/OA"] > 75.0, out


def test_classification_training_loop(tmp_path):
    cfg.parse_config("train.max_steps = 4\nget_model.out_channel = 3")

    class ClsDM(SyntheticSegDM):
        def _make(self):
            b = super()._make()
            b["labels"] = np.array([0, 1], np.int32)  # per-sample labels
            return b

    model = get_model(name="ResNet14", out_channel=3, num_batches=2)
    task = ClassificationTraining(
        model, optimizer_name="SGD", scheduler_name="PolyLR", lr=0.01
    )
    cfg.parse_config("PolyLR.poly_exp = 0.9")
    dm = ClsDM()
    tr = Trainer(
        task, dm, max_steps=4, val_every_n_steps=2,
        default_root_dir=str(tmp_path), monitor_metric="val/acc1",
    )
    state = tr.fit()
    out = tr.validate(state)
    assert "val/acc1" in out and "val/acc5" in out


def test_checkpoint_load_modes(tmp_path):
    cfg.parse_config("train.max_steps = 2\nget_model.out_channel = 3")
    model = get_model(name="ResNet14", out_channel=3, num_batches=2)
    task = ClassificationTraining(model, lr=0.05, scheduler_name="none")

    class ClsDM(SyntheticSegDM):
        def _make(self):
            b = super()._make()
            b["labels"] = np.array([0, 1], np.int32)
            return b

    dm = ClsDM()
    tr = Trainer(task, dm, max_steps=2, default_root_dir=str(tmp_path))
    state = tr.fit()

    # load_weights mode
    task2 = ClassificationTraining(
        model, lr=0.05, scheduler_name="none",
        load_weights=True, checkpoint_path=str(tmp_path / "last.ckpt"),
    )
    import jax

    state2 = task2.create_state(jax.random.PRNGKey(1), dm._make())
    a = np.asarray(
        jax.tree_util.tree_leaves(state.params)[0]
    )
    b = np.asarray(jax.tree_util.tree_leaves(state2.params)[0])
    np.testing.assert_array_equal(a, b)


def test_get_training_module_registry():
    assert get_training_module("SegmentationTraining") is SegmentationTraining
    assert (
        get_training_module("ExceptionSafeSegmentationTraining")
        is SegmentationTraining
    )
    with pytest.raises(ValueError):
        get_training_module("Nope")
