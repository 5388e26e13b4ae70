"""A/B: intra-offset block-structured sparse eval vs dense-masked eval
(VERDICT r4 #8 — measured, beyond offset-level wins).

Workload: Res16UNet18C (the reference's 256-channel variant — the
flagship 18A tops out at 96/128 channels where a 128-granular block
tier cannot bite by construction) at bench scale, with a synthetically
block-pruned checkpoint: in every conv matrix wider than one MXU tile,
~60% of 128x128 blocks are zeroed but block (0, 0) of every offset is
kept alive — NO offset dies, so the offset-level tier
(valid_offsets_map) sees nothing to skip and any speedup is purely the
intra-offset tier (CoordinateContext.block_live_map).

Run (needs the TPU):  python scratch/bench_blocksparse.py [--prob 0.6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prob", type=float, default=0.6)
    ap.add_argument("--arch", type=str, default="Res16UNet18C")
    # --wide: a 256-channel-decoder Res16UNet (planes kwarg, same family/
    # constructor the test suite uses). On the stock 18C the multi-block
    # convs (the only place a 128-granular tier CAN bite — below one MXU
    # tile the hardware runs dense regardless) are ~10% of eval time:
    # measured 1.04x at 43% dead blocks. Wide decoders put the L0 rows on
    # multi-block convs, which is where block-pruned serving would deploy
    # the tier.
    ap.add_argument("--wide", action="store_true")
    args = ap.parse_args()

    from nerf_downstream_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache(os.path.join(_REPO_ROOT, ".jax_cache"))

    import jax
    import jax.numpy as jnp

    import bench
    from nerf_downstream_tpu import config as cfg
    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.train.loop import array_batch
    from nerf_downstream_tpu.train.modules import SegmentationTraining
    from nerf_downstream_tpu.utils.prune import block_live_map

    eval_bindings = (
        bench.BLOCK_BINDINGS
        + "field_to_sparse.assume_unique = True\n"
        + "CoordinateContext.grid_extent = 128\n"
    )

    rng = np.random.default_rng(0)

    def build_state(sparse=None):
        kwargs = {"sparse": sparse} if sparse else {}
        if args.wide:
            kwargs["planes"] = (64, 96, 128, 256, 256, 256, 256, 256)
        model = get_model(
            name=args.arch, out_channel=bench.NUM_CLASSES,
            num_batches=bench.SCENES, compute_dtype=jnp.bfloat16, **kwargs,
        )
        task = SegmentationTraining(
            model, optimizer_name="SGD", scheduler_name="none", lr=0.1,
            ignore_label=-100,
        )
        return task

    cfg.clear_config()
    cfg.parse_config(eval_bindings)
    batch = array_batch(bench.make_batch(rng))
    task = build_state()
    state = task.create_state(jax.random.PRNGKey(0), batch)

    # block-prune: every conv matrix wider than one 128 tile loses
    # ~prob of its blocks, EXCEPT block (0,0) per offset (no offset-level
    # liveness change => the offset tier cannot contribute to the delta).
    # The kill pattern is COLUMN-structured per (dx, dy) offset-group
    # (whole Cin-blocks die for every member of the group): that is the
    # pattern whose savings reach the dispatch matmul — purely random
    # per-pair kills leave every Cin-block union full and only skip
    # weight matmuls (~1/6 of conv FLOPs; measured 0.82x, i.e. a loss,
    # before the full-union copy fix).
    from flax import traverse_util

    from nerf_downstream_tpu.ops.window_conv import group_offsets
    from nerf_downstream_tpu.sparse import kernel_offsets

    prng = np.random.default_rng(11)
    blk = 128
    offs = kernel_offsets(3, 1)
    groups = group_offsets(offs)
    flat = traverse_util.flatten_dict(dict(state.params))
    pruned = {}
    killed = total = 0
    for path, leaf in flat.items():
        arr = np.asarray(leaf)
        if path[-1] == "kernel" and arr.ndim == 3 and arr.shape[0] > 1:
            nbi = -(-arr.shape[1] // blk)
            nbo = -(-arr.shape[2] // blk)
            if nbi * nbo > 1:
                arr = arr.copy()
                grps = groups if arr.shape[0] == 27 else [
                    (k,) for k in range(arr.shape[0])
                ]
                for g in grps:
                    for bi in range(nbi):
                        total += nbo * len(g)
                        if bi == 0 or prng.random() >= args.prob:
                            continue
                        for k in g:
                            arr[k, bi * blk:(bi + 1) * blk, :] = 0
                            killed += nbo
        pruned[path] = jnp.asarray(arr)
    params = traverse_util.unflatten_dict(pruned)
    state = state.replace(params=params)
    bmap = block_live_map(dict(state.params))
    n_live = sum(int(v.sum()) for v in bmap.values())
    n_all = sum(v.size for v in bmap.values())
    print(
        f"block-pruned: {killed}/{total} multi-block blocks killed; "
        f"map: {len(bmap)} layers, {n_live}/{n_all} live"
    )
    assert bmap, "no block map entries"

    feats = batch["features"]

    def timed_eval(task_, state_):
        estep = task_.make_eval_step()

        @jax.jit
        def multi(s, f):
            def body(carry, i):
                logits, _ = estep(
                    s, dict(batch, features=f * (1 + 0.01 * i))
                )
                return carry, jnp.sum(logits)

            return jax.lax.scan(
                body, 0, jnp.arange(bench.ITERS, dtype=jnp.float32)
            )[1]

        np.asarray(multi(state_, feats))  # compile + warm
        best = None
        for r in range(bench.REPEATS):
            t0 = time.perf_counter()
            sums = np.asarray(multi(state_, feats * (1 + 0.001 * r)))
            dt = (time.perf_counter() - t0) / bench.ITERS
            best = dt if best is None else min(best, dt)
            assert np.isfinite(sums).all(), "poisoned eval"
            assert len(set(sums.tolist())) == bench.ITERS, "deduped"
        return best * 1e3

    dense_ms = timed_eval(task, state)
    print(f"dense-masked eval: {dense_ms:.2f} ms")

    # B: same weights, block tier on (mode-1 convs consult the map)
    cfg.clear_config()
    cfg.parse_config(eval_bindings)
    cfg.bind("CoordinateContext", "block_live_map", bmap)
    task_bs = build_state(sparse=[1] * 9)
    state_bs = task_bs.create_state(jax.random.PRNGKey(0), batch)
    state_bs = state_bs.replace(
        params=jax.tree_util.tree_map(lambda a: a, params)
    )
    bs_ms = timed_eval(task_bs, state_bs)
    print(f"block-sparse eval: {bs_ms:.2f} ms")
    print(
        f"speedup: {dense_ms / bs_ms:.3f}x "
        f"(block density {n_live}/{n_all} = {n_live / n_all:.2f})"
    )
    cfg.clear_config()


if __name__ == "__main__":
    main()
