"""2D classification task: the reference LitModel re-designed as a JAX task
(reference co3d_2d/src/modules/classification.py:42-163).

Behavior parity:
- CE with label_smoothing=0.005 (:60)
- manual decoupled weight decay as an L2-*norm* penalty over conv/fc/
  downsample kernels (:79-90) added to the loss
- hand-rolled LR schedule: linear warmup over the first 10% of steps, then
  quarter-cosine decay (:129-151)
- SGD momentum 0.9; val/test accuracy over all frames (:109-127)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_downstream_tpu import config as cfg
from nerf_downstream_tpu.train.state import TrainState


def warmup_quarter_cosine(base_lr: float, total_steps: int):
    peak = max(int(total_steps * 0.1), 1)

    def schedule(step):
        warm = base_lr * step / peak
        decay = base_lr * jnp.cos(
            (step - peak) / max(total_steps - peak, 1) * jnp.pi / 2
        )
        return jnp.where(step <= peak, warm, jnp.maximum(decay, 0.0))

    return schedule


@cfg.configurable("LitModel")
class LitModel:
    def __init__(
        self,
        model_name: Optional[str] = None,
        lr: float = 0.1,
        weight_decay: float = 1e-4,
        label_smoothing: float = 0.005,
        num_training_steps: int = 10000,
        axis_name: Optional[str] = None,
        use_sync_batchnorm: bool = False,
    ):
        from nerf_downstream_tpu.models.image import select_model

        self.model_name = model_name
        self.lr = lr
        self.weight_decay = weight_decay
        self.label_smoothing = label_smoothing
        self.num_training_steps = num_training_steps
        # data-parallel axis (Trainer devices>1); sync BN when asked, like
        # the reference's accelerator="ddp" + sync_batchnorm
        # (co3d_2d/train.py:93-103)
        self.axis_name = axis_name
        self.model = select_model(
            model_name,
            bn_axis_name=axis_name if use_sync_batchnorm else None,
        )
        self._train_step_cache = None
        self._eval_step_cache = None
        self.schedule = warmup_quarter_cosine(lr, num_training_steps)
        # epoch-end accuracy state
        self._val_correct = 0
        self._val_count = 0
        self._val_losses: list[float] = []

    def set_num_training_steps(self, n: int):
        self.num_training_steps = n
        self.schedule = warmup_quarter_cosine(self.lr, n)
        self._train_step_cache = None  # schedule is baked into the step

    def current_lr(self, step) -> float:
        return float(self.schedule(step))

    def make_tx(self):
        return optax.sgd(self.schedule, momentum=0.9)

    def create_state(self, rng, example_batch) -> TrainState:
        imgs = jnp.asarray(example_batch["images"], jnp.float32)
        variables = jax.jit(
            lambda r, x: self.model.init(
                {"params": r, "dropout": r}, x, train=False
            )
        )(rng, imgs)
        if getattr(self.model, "pretrained", False):
            from nerf_downstream_tpu.models.image.torch_weights import (
                apply_pretrained,
            )

            variables = apply_pretrained(
                dict(variables),
                self.model.pretrained_arch,
                self.model.pretrained_submodule,
            )
        return TrainState.create(
            self.model.apply,
            variables["params"],
            variables.get("batch_stats", {}),
            self.make_tx(),
        )

    def _celoss(self, logits, labels, sample_mask=None):
        c = logits.shape[-1]
        eps = self.label_smoothing
        onehot = jax.nn.one_hot(labels, c) * (1 - eps) + eps / c
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.sum(onehot * logp, -1)
        if sample_mask is not None:
            w = sample_mask.astype(jnp.float32)
            return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1)
        return jnp.mean(nll)

    def _wdloss(self, params):
        total = 0.0
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            names = [str(getattr(p, "key", p)).lower() for p in path]
            if names[-1] == "kernel" and any(
                "conv" in n or n == "fc" or "downsample" in n or "dense" in n
                for n in names
            ):
                total = total + jnp.linalg.norm(
                    leaf.astype(jnp.float32).reshape(-1)
                )
        return self.weight_decay * total

    def make_train_step(self):
        if self._train_step_cache is not None:
            return self._train_step_cache
        base_key = jax.random.PRNGKey(0)

        def train_step(state: TrainState, batch):
            dropout_key = jax.random.fold_in(base_key, state.step)
            return self._train_step_body(state, batch, dropout_key)

        self._train_step_cache = jax.jit(train_step, donate_argnums=(0,))
        return self._train_step_cache

    def _train_step_body(self, state: TrainState, batch, dropout_key):
        """Uncompiled step body shared by the single-device and shard_map
        paths (the parallel path pmeans grads across the data axis)."""
        imgs = batch["images"]
        labels = batch["labels"]

        def loss_fn(params):
            variables = {"params": params}
            # mutable=False (not []) when stat-less: flax returns the bare
            # output only for mutable=False — an empty LIST still returns
            # an (out, vars) tuple, which broke the ViT (no batch_stats) path
            mutable = False
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = state.apply_fn(
                variables, imgs, train=True, mutable=mutable,
                rngs={"dropout": dropout_key},
            )
            logits, mut = out if mutable else (out, {})
            celoss = self._celoss(logits, labels)
            wdloss = self._wdloss(params)
            acc = 100.0 * jnp.mean(
                (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
            )
            new_stats = mut.get("batch_stats", state.batch_stats)
            return celoss + wdloss, (new_stats, celoss, wdloss, acc)

        (loss, (new_stats, celoss, wdloss, acc)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        )
        if self.axis_name is not None:
            # equal per-device batch sizes -> the global-batch gradient is
            # the mean of per-device means (DDP's all-reduce average)
            grads = jax.lax.pmean(grads, self.axis_name)
            loss, celoss, wdloss, acc = jax.lax.pmean(
                (loss, celoss, wdloss, acc), self.axis_name
            )
        new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return new_state, {
            "loss": loss, "celoss": celoss, "wdloss": wdloss, "acc": acc,
        }

    def make_parallel_train_step(self, mesh, axis: str = "data"):
        from jax.sharding import PartitionSpec as P

        assert self.axis_name == axis, (
            f"LitModel.axis_name={self.axis_name!r} must equal mesh axis "
            f"{axis!r} for data-parallel training"
        )
        base_key = jax.random.PRNGKey(0)

        def step(state, batch):
            dropout_key = jax.random.fold_in(base_key, state.step)
            return self._train_step_body(state, batch, dropout_key)

        def wrapped(state, batch):
            specs = jax.tree_util.tree_map(
                lambda v: P(axis) if np.ndim(v) >= 1 else P(), batch
            )
            return jax.shard_map(
                step, mesh=mesh, in_specs=(P(), specs),
                out_specs=(P(), P()), check_vma=False,
            )(state, batch)

        return jax.jit(wrapped, donate_argnums=(0,))

    def make_parallel_eval_step(self, mesh, axis: str = "data"):
        from jax.sharding import PartitionSpec as P

        def step(state, batch):
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            logits = state.apply_fn(variables, batch["images"], train=False)
            mask = batch.get("sample_mask")
            if mask is None:
                mask = jnp.ones(logits.shape[0], jnp.float32)
            w = jnp.asarray(mask, jnp.float32)
            c = logits.shape[-1]
            eps = self.label_smoothing
            onehot = (
                jax.nn.one_hot(batch["labels"], c) * (1 - eps) + eps / c
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            nll = -jnp.sum(onehot * logp, -1)
            num = jax.lax.psum(jnp.sum(nll * w), axis)
            den = jax.lax.psum(jnp.sum(w), axis)
            return logits, {"loss": num / jnp.maximum(den, 1)}

        def wrapped(state, batch):
            specs = jax.tree_util.tree_map(
                lambda v: P(axis) if np.ndim(v) >= 1 else P(), batch
            )
            return jax.shard_map(
                step, mesh=mesh, in_specs=(P(), specs),
                out_specs=(P(axis), P()), check_vma=False,
            )(state, batch)

        return jax.jit(wrapped)

    def make_eval_step(self):
        if self._eval_step_cache is not None:
            return self._eval_step_cache

        def eval_step(state: TrainState, batch):
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            logits = state.apply_fn(variables, batch["images"], train=False)
            mask = batch.get("sample_mask")
            loss = self._celoss(
                logits, batch["labels"],
                None if mask is None else jnp.asarray(mask),
            )
            return logits, {"loss": loss}

        self._eval_step_cache = jax.jit(eval_step)
        return self._eval_step_cache

    # trainer hooks ---------------------------------------------------------
    def on_validation_start(self):
        self._val_correct = 0
        self._val_count = 0
        self._val_losses = []

    def validation_batch_end(self, logits, batch):
        labels = np.asarray(batch["labels"])
        valid = np.asarray(batch.get("sample_mask", np.ones(len(labels), bool)))
        pred = np.argmax(np.asarray(logits), -1)
        self._val_correct += int(((pred == labels) & valid).sum())
        self._val_count += int(valid.sum())

    def validation_epoch_end(self, step_results, root_dir) -> dict:
        acc = 100.0 * self._val_correct / max(self._val_count, 1)
        loss = float(np.mean([r["loss"] for r in step_results]))
        return {"val/acc": acc, "val/loss": loss}

    def loss_and_metrics(self, logits, batch):  # trainer API compat
        labels = jnp.asarray(batch["labels"], jnp.int32)
        mask = batch.get("sample_mask")
        loss = self._celoss(
            logits, labels, None if mask is None else jnp.asarray(mask)
        )
        return loss, {}
