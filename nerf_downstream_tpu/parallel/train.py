"""Data-parallel train step over a device mesh via shard_map + psum.

Each device runs the full model on its local shard of the batch (whole
samples per shard — kernel maps never cross devices, exactly DDP's
decomposition), then gradients are psum-reduced over the ``data`` axis.
With the task's global-denominator loss this reproduces the exact
global-batch gradient; BN statistics sync through the masked-BN
``axis_name`` (SyncBatchNorm). This is the TPU-native replacement for
Lightning DDP + NCCL (reference co3d_3d/train.py:184, SURVEY §2.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def make_parallel_train_step(task, mesh: Mesh, axis: str = "data"):
    """Build a jitted shard_map train step: (state, batch) -> (state, metrics).

    ``state`` is replicated; ``batch`` arrays are sharded on their leading
    dim (whole samples per shard). The task must have ``axis_name == axis``
    (so its loss uses the global denominator) and the model must be built
    with ``bn_axis_name=axis``.
    """
    assert task.axis_name == axis, (
        f"task.axis_name={task.axis_name!r} must equal mesh axis {axis!r}"
    )

    base_key = jax.random.PRNGKey(0)

    def step(state, batch):
        from flax import traverse_util

        from nerf_downstream_tpu.train.modules import (
            merge_ema_state,
            split_ema_state,
        )

        rng = jax.random.fold_in(base_key, state.step)
        flat_stats, ema = split_ema_state(state.batch_stats)

        def loss_fn(params, ema_in):
            bs = dict(flat_stats)
            bs.update(ema_in)
            logits, new_stats = task._apply(
                params, traverse_util.unflatten_dict(bs), batch,
                train=True, rng=rng,
            )
            loss, mets = task.loss_and_metrics(logits, batch)
            return loss, (new_stats, mets)

        if ema:
            (loss, (new_stats, mets)), (grads, new_ema) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, ema)
            # new_ema is already psum-synced inside the PowerNorm VJP
            # (axis_name) — it's an absolute state value, NOT a gradient;
            # keep it out of the grad psum below.
            new_stats = merge_ema_state(new_stats, new_ema)
        else:
            (loss, (new_stats, mets)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, ema)
        # global-batch gradient: local grads of the global-denominator loss
        # summed across shards
        grads = jax.lax.psum(grads, axis)
        loss = jax.lax.psum(loss, axis)
        new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return new_state, dict(mets, loss=loss)

    def batch_specs(batch):
        import numpy as np

        return jax.tree_util.tree_map(
            lambda v: P(axis) if np.ndim(v) >= 1 else P(), batch
        )

    def wrapped(state, batch):
        sharded = jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), batch_specs(batch)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return sharded(state, batch)

    return jax.jit(wrapped, donate_argnums=(0,))


def make_parallel_eval_step(task, mesh: Mesh, axis: str = "data"):
    def step(state, batch):
        logits, _ = task._apply(
            state.params, state.batch_stats, batch, train=False
        )
        loss, mets = task.loss_and_metrics(logits, batch)
        # metrics from loss_and_metrics are already globally reduced (psum
        # under axis_name); the loss is local-numerator/global-denominator —
        # psum it so the P() out_spec really is replicated
        loss = jax.lax.psum(loss, axis)
        return logits, dict(mets, loss=loss)

    def wrapped(state, batch):
        import numpy as np

        specs = jax.tree_util.tree_map(
            lambda v: P(axis) if np.ndim(v) >= 1 else P(), batch
        )
        return jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), specs),
            out_specs=(P(axis), P()),
            check_vma=False,
        )(state, batch)

    return jax.jit(wrapped)
