"""3D evaluation CLI (reference co3d_3d/eval.py).

Interface parity: ``--ginc/--ginb``, ``--load_path``, ``--save_path``,
``--sparsify --sparse_mode a,b,...(9)``, ``--layout {csr,coo,strided}``,
``--tag``, ``--replace``, ``--profile``; writes ``{tag}.json`` and skips
existing tags (idempotent sweeps, reference eval.py:41-44).

Pruned-checkpoint handling: checkpoints whose kernels carry pruning masks
are loaded with masks folded into the weights; ``--sparsify`` switches the
selected stages to the weight-sparse conv path.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time
from typing import Optional

from nerf_downstream_tpu import config as gin
from nerf_downstream_tpu.data.data_module import DataModule
from nerf_downstream_tpu.models import get_model
from nerf_downstream_tpu.train.loop import Trainer
from nerf_downstream_tpu.train.modules import get_training_module
from nerf_downstream_tpu.utils.prune import (
    count_parameters_tree,
    fold_pruning_masks,
    pruned_offsets_map,
)


@gin.configurable
def evaluate(
    save_path: Optional[str] = None,
    load_path: Optional[str] = None,
    ignore_label: int = -100,
    training_module: str = "SegmentationTraining",
    log_every_n_steps: int = 5,
    device: str = "tpu",
    convert_powernorm: bool = False,
    layout: str = "csr",
    tag: str = "default",
    visualize: bool = False,
    replace: bool = False,
    profile: bool = False,
    val_phase: str = "val",
    val_batch_size: int = 1,
):
    os.makedirs(save_path, exist_ok=True)
    json_path = os.path.join(save_path, f"{tag}.json")
    if not replace and os.path.isfile(json_path):
        print("====== skip existing experiment =====")
        return

    model = get_model(num_batches=val_batch_size)
    data_module = DataModule(
        val_batch_size=val_batch_size, val_phase=val_phase,
        ignore_label=ignore_label,
    )
    task = get_training_module(training_module)(
        model,
        export_path=save_path,
        datamodule=data_module,
        save_pred=visualize,
        save_pred_path=os.path.join(save_path, "figure", tag),
        ignore_label=ignore_label,
        checkpoint_path=load_path,
        load_weights=True,
        scheduler_name="none",
    )

    import jax

    from nerf_downstream_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    first = next(iter(data_module.val_batches(val_phase)))
    state = task.create_state(jax.random.PRNGKey(0), first)
    state, prune_stats = fold_pruning_masks(state)
    # --sparsify csr/coo/strided (mode 1): derive each conv's live offsets
    # from its pruned weights (the reference's per-layer valid_kernel,
    # sparse_conv.py:346-379) and publish the map for mode-1 convs — they
    # then ride the windowed path with zero-weight group padding, so
    # offset-level pruning buys real compute savings for any layout
    sparse_mode = gin.query_parameter("get_model.sparse", default=None)
    if sparse_mode and 1 in list(sparse_mode):
        vmap_ = pruned_offsets_map(state.params)
        if vmap_:
            gin.bind("CoordinateContext", "valid_offsets_map", vmap_)
            print(
                "pruned offset map:",
                {k: len(v) for k, v in vmap_.items()},
            )
        if layout in ("csr", "coo"):
            # intra-offset tier for the intra-matrix layouts: dead
            # 128x128 weight blocks skip their dispatch + weight matmuls
            # in the windowed convs (reference's per-offset spmm,
            # sparse_conv.py:122-152, at MXU granularity)
            from nerf_downstream_tpu.utils.prune import block_live_map

            blk = int(
                gin.query_parameter(
                    "CoordinateContext.block_live_granularity", default=128
                )
            )
            bmap_ = block_live_map(state.params, block=blk)
            if bmap_:
                gin.bind("CoordinateContext", "block_live_map", bmap_)
                print(
                    "block-live map:",
                    {
                        k: f"{int(v.sum())}/{v.size}"
                        for k, v in bmap_.items()
                    },
                )
    if convert_powernorm:
        # BN -> PN statistics transfer (reference powernorm.py:291-329);
        # applies when the model was built with NORM_TYPE="PN" but the
        # checkpoint carries BN stats
        def convert(stats):
            if isinstance(stats, dict) and "var" in stats and "mean" in stats:
                return {"running_phi": stats["var"],
                        "iters": jax.numpy.zeros((), jax.numpy.int32)}
            if isinstance(stats, dict):
                return {k: convert(v) for k, v in stats.items()}
            return stats

        state = state.replace(batch_stats=convert(state.batch_stats))
    num_params = count_parameters_tree(state.params)
    nz = num_params["total"] - num_params["pruned"]
    print(
        f"num_params, total={num_params['total']}, net={nz}, "
        f"ratio={nz / max(num_params['total'], 1) * 100:.2f}"
    )

    trainer = Trainer(
        task,
        data_module,
        default_root_dir=save_path,
        log_every_n_steps=log_every_n_steps,
    )
    if profile:
        from nerf_downstream_tpu.train.profilers import device_trace

        with device_trace(os.path.join(save_path, "trace")):
            ts = time.time()
            val_results = trainer.validate(state, phase=val_phase)
            elapsed = time.time() - ts
    else:
        ts = time.time()
        val_results = trainer.validate(state, phase=val_phase)
        elapsed = time.time() - ts
    logging.info(f"elapsed time: {elapsed} s")
    val_results = {k: float(v) for k, v in val_results.items()}
    with open(json_path, "w") as f:
        f.write(json.dumps([val_results], indent=4))
    return val_results


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ginc", action="append", help="gin config file")
    parser.add_argument("--ginb", action="append", help="gin bindings")
    parser.add_argument(
        "--training_module", type=str, default="SegmentationTraining"
    )
    parser.add_argument("--save_path", type=str, default=None)
    parser.add_argument("--load_path", type=str, default=None)
    parser.add_argument(
        "--device", type=str, choices=["cpu", "cuda", "tpu"], default="tpu"
    )
    parser.add_argument("--seed", type=int, default=777)
    parser.add_argument("--convert_powernorm", action="store_true")
    parser.add_argument("--sparsify", action="store_true")
    parser.add_argument("--sparse_mode", type=str, default="0,0,0,0,0,0,0,0,0")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--visualize", action="store_true")
    parser.add_argument("--replace", action="store_true")
    parser.add_argument("--profile", action="store_true")
    parser.add_argument(
        "--layout", type=str, choices=["csr", "coo", "strided"], default="csr"
    )
    parser.add_argument("--tag", type=str)
    args = parser.parse_args(argv)
    ginbs = list(args.ginb or [])

    if args.sparsify:
        sparse_mode = [int(n) for n in args.sparse_mode.split(",")]
        assert len(sparse_mode) == 9, "sparse mode should have length 9."
        assert 0 not in sparse_mode, (
            "sparse_mode should be positive when sparsify is on."
        )
    else:
        sparse_mode = [0] * 9
    ginbs.append(f"get_model.sparse={sparse_mode}")

    logging.info(f"Gin configuration files: {args.ginc}")
    logging.info(f"Gin bindings: {ginbs}")
    gin.parse_config_files_and_bindings(args.ginc, ginbs)

    dataset_name = gin.query_parameter("get_dataset.dataset_name")
    ignore_label = gin.query_parameter(
        f"{dataset_name}.ignore_label", default=-100
    )

    if args.tag is None:
        tag = args.load_path.split("/")[-2]
        tag = f"{tag}-{args.device}-{args.sparsify}"
    else:
        tag = args.tag
    logging.info(tag)

    save_path = args.save_path or os.path.dirname(args.load_path)
    return evaluate(
        save_path=save_path,
        load_path=args.load_path,
        ignore_label=ignore_label,
        training_module=args.training_module,
        device=args.device,
        convert_powernorm=args.convert_powernorm,
        layout=args.layout,
        tag=tag,
        visualize=args.visualize,
        replace=args.replace,
        profile=args.profile,
    )


if __name__ == "__main__":
    main()
