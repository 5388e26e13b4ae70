"""GSPMD (pjit) data x tensor parallel training over a 2-D device mesh.

Where ``parallel/train.py`` replays the reference's DDP decomposition with
``shard_map`` + explicit ``psum``, this module expresses the same train
step through SHARDING ANNOTATIONS and lets XLA insert the collectives
(scaling-book recipe: pick a mesh, annotate, let GSPMD do the rest):

- mesh ``(data, model)``: batch rows shard over ``data``; every conv/dense
  kernel shards its OUTPUT-channel dim over ``model`` (tensor parallelism
  for the wide decoder layers), biases/norm params shard over ``model``
  alike.
- BatchNorm "sync" needs no axis_name: the masked sums reduce over the
  row axis, which is sharded over ``data``, so GSPMD emits the all-reduce
  automatically — SyncBN by construction.
- gradient all-reduce over ``data`` likewise falls out of the loss being a
  full reduction of sharded rows.

Production guidance: the shard_map DDP step keeps kernel-map builds local
per shard (no cross-device coordinate traffic) and is the throughput path;
this GSPMD step is the mesh-native expression that additionally shards
model memory — use it when channel widths or optimizer state outgrow one
chip. Config-selectable from every 3D CLI: ``train.parallel_mode =
"gspmd"`` + ``train.model_parallel = M`` with ``--gpus N`` builds the
(N/M, M) mesh through ``Trainer`` (train/loop.py). Validated on virtual
meshes in ``tests/test_gspmd.py`` and end-to-end vs a single-device run
in ``tests/test_cli_3d.py::test_train_cli_gspmd_matches_single``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh2d(n_data: int, n_model: int) -> Mesh:
    devices = np.array(jax.devices()[: n_data * n_model]).reshape(
        n_data, n_model
    )
    return Mesh(devices, ("data", "model"))


def _param_spec(path, leaf, n_model: int = 2) -> P:
    """Output-channel sharding rule: last dim of kernels/scales/biases goes
    to ``model`` when it divides evenly AND each shard keeps >= 16 lanes —
    small heads (a 20-wide classifier bias) and narrow stats replicate
    rather than splitting into sub-tile slivers."""
    if leaf.ndim == 0:
        return P()
    names = [str(getattr(p, "key", p)) for p in path]
    last = leaf.shape[-1]
    if last % n_model == 0 and last >= 16 * n_model and any(
        n in ("kernel", "scale", "bias", "mean", "var", "running_phi",
              "ema_gz")
        for n in names[-1:]
    ):
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()


def param_shardings(mesh: Mesh, tree):
    n_model = int(mesh.shape.get("model", 2))
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _param_spec(path, leaf, n_model)
        ),
        tree,
    )


def batch_shardings(mesh: Mesh, batch):
    return jax.tree_util.tree_map(
        lambda v: NamedSharding(
            mesh, P("data") if np.ndim(v) >= 1 else P()
        ),
        batch,
    )


def place(tree, shardings):
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(jnp.asarray(x), s), tree, shardings
    )


def make_gspmd_train_step(task, mesh: Mesh):
    """jit with in/out shardings; the body is the plain single-device step —
    GSPMD derives the distributed program."""
    assert task.axis_name is None, (
        "GSPMD step wants axis_name=None: collectives come from shardings, "
        "not psum"
    )
    base_key = jax.random.PRNGKey(0)

    def step(state, batch):
        from flax import traverse_util

        from nerf_downstream_tpu.train.modules import (
            merge_ema_state,
            split_ema_state,
        )

        rng = jax.random.fold_in(base_key, state.step)
        # PowerNorm ema_gz is updated during the backward pass (smuggled out
        # as a cotangent) — same split/merge plumbing as the single-device
        # and shard_map steps, otherwise the buffer would silently freeze.
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
            new_stats = merge_ema_state(new_stats, new_ema)
        else:
            (loss, (new_stats, mets)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, ema)
        new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return new_state, dict(mets, loss=loss)

    return jax.jit(step, donate_argnums=(0,))


def shard_state(mesh: Mesh, state):
    """Place a TrainState: params/opt_state/batch_stats under the
    output-channel rule, scalars replicated."""
    pshard = param_shardings(mesh, state.params)
    sshard = param_shardings(mesh, state.batch_stats)

    n_model = int(mesh.shape.get("model", 2))

    def opt_shard(tree):
        # optimizer state mirrors param tree structure where it does;
        # anything else replicates
        try:
            return jax.tree_util.tree_map_with_path(
                lambda path, leaf: NamedSharding(
                    mesh, _param_spec(path, leaf, n_model)
                ),
                tree,
            )
        except Exception:
            return jax.tree_util.tree_map(
                lambda _: NamedSharding(mesh, P()), tree
            )

    return state.replace(
        params=place(state.params, pshard),
        batch_stats=place(state.batch_stats, sshard),
        opt_state=place(state.opt_state, opt_shard(state.opt_state)),
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
    )
