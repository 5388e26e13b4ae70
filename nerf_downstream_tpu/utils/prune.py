"""Pruning utilities (reference co3d_3d/src/utils/prune.py:11-77).

Functional JAX port of the torch.nn.utils.prune workflow: masks are arrays
mirroring conv kernels, stored under a ``pruning_masks`` entry in
checkpoints. ``fold_pruning_masks`` makes pruning permanent (the analogue of
``torch_prune.remove``); parameter counting reports exact zeros in kernels
(what the reference's mask counting measures after folding).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _is_kernel(path) -> bool:
    last = path[-1]
    name = getattr(last, "key", getattr(last, "name", str(last)))
    return name == "kernel"


def get_parameters_to_prune(params) -> list:
    """Paths of prunable conv kernels (reference prune.py:34-57 enumerates
    sparse-conv layers)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [path for path, leaf in flat if _is_kernel(path) and leaf.ndim == 3]


def count_parameters_tree(params) -> dict:
    """{"total": N, "pruned": zeros-in-kernels} (reference prune.py:11-22)."""
    total = 0
    pruned = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        n = int(np.prod(leaf.shape))
        total += n
        if _is_kernel(path):
            pruned += int(np.sum(np.asarray(leaf) == 0))
    return {"total": total, "pruned": pruned}


def magnitude_prune(params, amount: float):
    """Zero the smallest-|w| ``amount`` fraction of every conv kernel;
    returns (pruned_params, masks)."""

    def prune_leaf(path, leaf):
        if not (_is_kernel(path) and leaf.ndim == 3):
            return leaf, None
        w = np.asarray(leaf)
        k = int(w.size * amount)
        if k == 0:
            return leaf, np.ones_like(w, bool)
        ths = np.partition(np.abs(w).ravel(), k - 1)[k - 1]
        mask = np.abs(w) > ths
        return jnp.asarray(w * mask), mask

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    new_leaves, masks = [], {}
    for path, leaf in flat:
        new_leaf, mask = prune_leaf(path, leaf)
        new_leaves.append(new_leaf)
        if mask is not None:
            masks["/".join(str(getattr(p, "key", p)) for p in path)] = mask
    return jax.tree_util.tree_unflatten(treedef, new_leaves), masks


def apply_masks(params, masks: dict):
    """Re-apply stored masks onto kernels (identity-prune load path,
    reference eval.py:49-57)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        if key in masks:
            out.append(leaf * jnp.asarray(np.asarray(masks[key]), leaf.dtype))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def fold_pruning_masks(state) -> tuple[Any, dict]:
    """Fold any checkpoint-carried masks into weights (torch_prune.remove
    equivalent). With no masks present this is a no-op."""
    masks = getattr(state, "pruning_masks", None)
    if not masks:
        return state, {}
    params = apply_masks(state.params, masks)
    return state.replace(params=params), {"folded": len(masks)}


def count_flops(flops_records: list) -> float:
    """Aggregate per-layer FLOP records (reference prune.py:25-31 reads
    layer ``_flops``; here layers report via sparse_conv_real_flops)."""
    return float(sum(flops_records))


def pruned_offsets_map(params) -> dict:
    """{conv module path -> live offset tuple} from pruned conv kernels.

    Walks the param tree for [K, Cin, Cout] conv kernels (K > 1) and
    records layers where pruning killed whole offsets — the reference's
    per-layer ``valid_kernel`` (sparse_conv.py:346-379). Consumed by
    mode-1 (SPARSE) convs via CoordinateContext.valid_offsets_map.
    """
    import numpy as np
    from flax import traverse_util

    from nerf_downstream_tpu.ops.weight_sparse import (
        valid_offsets_from_weights,
    )

    out = {}
    for path, leaf in traverse_util.flatten_dict(dict(params)).items():
        if (
            path[-1] == "kernel"
            and getattr(leaf, "ndim", 0) == 3
            and leaf.shape[0] > 1
        ):
            live = valid_offsets_from_weights(np.asarray(leaf))
            if 0 < len(live) < leaf.shape[0]:
                out["/".join(path[:-1])] = live
    return out


def block_live_map(params, block: int = 128) -> dict:
    """{conv module path -> bool[K, nbi, nbo]} per-offset weight-block
    liveness at MXU granularity — the intra-offset structured-sparsity
    tier (reference csr/coo spmm, sparse_conv.py:122-152). Only layers
    where block pruning actually skips compute are recorded: at least one
    dead block in a kernel with more than one block per matrix (below
    128x128 the MXU runs the tile dense regardless). Consumed by windowed
    convs via CoordinateContext.block_live_map."""
    import numpy as np
    from flax import traverse_util

    from nerf_downstream_tpu.ops.weight_sparse import (
        block_live_from_weights,
    )

    out = {}
    for path, leaf in traverse_util.flatten_dict(dict(params)).items():
        if (
            path[-1] == "kernel"
            and getattr(leaf, "ndim", 0) == 3
            and leaf.shape[0] > 1
        ):
            live = block_live_from_weights(np.asarray(leaf), block=block)
            if live[:, 0, 0].size and live.size > live.shape[0] and (
                not live.all()
            ):
                out["/".join(path[:-1])] = live
    return out
