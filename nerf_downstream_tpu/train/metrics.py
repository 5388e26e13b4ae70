"""Metrics: IoU meter as a pytree of sums, fast_hist, accuracy.

The reference's IoUMeter is a torchmetrics.Metric with distributed-sum state
(total_seen/total_correct/total_positive, src/metrics.py:5-58) and fast_hist
/ per_class_iu numpy helpers (src/utils/__init__.py). In JAX the meter is a
pure pytree of per-class sum arrays; distributed reduction is a ``psum`` (or
is implicit under pjit when updates are computed from global arrays).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


def fast_hist(pred, label, n: int):
    """Confusion matrix counts [n, n]: rows = label, cols = pred
    (reference src/utils/__init__.py fast_hist)."""
    k = (label >= 0) & (label < n)
    idx = jnp.where(k, n * label + pred, n * n)
    counts = jnp.bincount(idx.astype(jnp.int32), length=n * n + 1)[: n * n]
    return counts.reshape(n, n)


def per_class_iu(hist):
    """IoU per class from a confusion matrix (numpy or jnp)."""
    inter = jnp.diag(hist)
    union = hist.sum(1) + hist.sum(0) - inter
    return inter / jnp.maximum(union, 1)


def precision_at_one(pred, target, ignore_label: int = 255):
    """Overall accuracy excluding ignore_label (reference utils)."""
    valid = target != ignore_label
    correct = (pred == target) & valid
    denom = jnp.maximum(valid.sum(), 1)
    return 100.0 * correct.sum() / denom


@flax.struct.dataclass
class IoUMeterState:
    """Per-class accumulation sums; add states across batches/replicas."""

    total_seen: jax.Array  # [C] label count per class
    total_correct: jax.Array  # [C] correct predictions per class
    total_positive: jax.Array  # [C] predicted count per class

    @classmethod
    def create(cls, num_classes: int) -> "IoUMeterState":
        z = jnp.zeros((num_classes,), jnp.int32)
        return cls(total_seen=z, total_correct=z, total_positive=z)

    def merge(self, other: "IoUMeterState") -> "IoUMeterState":
        return jax.tree_util.tree_map(lambda a, b: a + b, self, other)


def iou_update(
    state: IoUMeterState,
    pred: jax.Array,
    label: jax.Array,
    valid: jax.Array,
    num_classes: int,
) -> IoUMeterState:
    """Update sums from flat predictions/labels under a validity mask
    (reference metrics.py:29-39 update())."""
    c = num_classes
    lab = jnp.where(valid, label, c).astype(jnp.int32)
    prd = jnp.where(valid, pred, c).astype(jnp.int32)
    seen = jnp.bincount(lab, length=c + 1)[:c]
    positive = jnp.bincount(prd, length=c + 1)[:c]
    correct_mask = valid & (pred == label)
    correct = jnp.bincount(
        jnp.where(correct_mask, label, c).astype(jnp.int32), length=c + 1
    )[:c]
    return IoUMeterState(
        total_seen=state.total_seen + seen,
        total_correct=state.total_correct + correct,
        total_positive=state.total_positive + positive,
    )


def iou_compute(state: IoUMeterState, void_label: int | None = None):
    """Per-class IoU/acc and means, excluding the void class from the mean
    (reference metrics.py:41-58)."""
    seen = np.asarray(state.total_seen).astype(np.float64)
    correct = np.asarray(state.total_correct).astype(np.float64)
    positive = np.asarray(state.total_positive).astype(np.float64)
    union = seen + positive - correct
    iou = correct / np.maximum(union, 1)
    acc = correct / np.maximum(seen, 1)
    c = len(seen)
    keep = np.ones(c, bool)
    if void_label is not None and 0 <= void_label < c:
        keep[void_label] = False
    # classes never seen do not count toward the mean
    keep &= seen > 0
    miou = float(iou[keep].mean()) if keep.any() else 0.0
    macc = float(acc[keep].mean()) if keep.any() else 0.0
    return {
        "iou_per_class": iou,
        "acc_per_class": acc,
        "mIoU": miou,
        "mAcc": macc,
    }


def topk_accuracy(logits, labels, ks=(1, 5)):
    """top-1/top-5 accuracy in percent (reference
    classification_training.py:14-15 and __accuracy)."""
    results = {}
    order = jnp.argsort(-logits, axis=-1)
    for k in ks:
        hit = jnp.any(order[:, :k] == labels[:, None], axis=-1)
        results[f"acc{k}"] = 100.0 * jnp.mean(hit.astype(jnp.float32))
    return results
