"""Worker for the two-process distributed rehearsal test (not collected by
pytest — invoked as a subprocess by tests/test_multiprocess.py).

Rehearses the real multi-host path this environment can't otherwise reach
(reference: SLURM multi-node DDP, sbatch.sh:1-44): two OS processes join a
jax.distributed coordination service, each contributes 4 virtual CPU
devices to one 8-device global mesh, loads ITS OWN process-strided share
of the scenes (the per-host filelist sharding that replaces
DistributedSampler), assembles the global batch with
jax.make_array_from_process_local_data, and runs ONE shard_map train step
with psum'd gradients/metrics. Process 0 writes the psum'd loss/metrics as
JSON; the test compares them against a single-process 8-device run of the
same global batch (the loss is scene-partition-invariant by the
global-denominator construction).
"""

from __future__ import annotations

import json
import os
import sys


def make_sample(i: int):
    import numpy as np

    from nerf_downstream_tpu.data.plenoxel import make_synthetic_scene

    rng = np.random.default_rng(1000 + i)
    sc = make_synthetic_scene(
        rng, n_voxels=128, reso=(32, 32, 32), with_labels=True, num_classes=8
    )
    return {
        "coordinates": sc["coords"].astype(np.float32),
        "features": np.concatenate([sc["density"], sc["sh"]], 1).astype(
            np.float32
        ),
        "labels": sc["labels"],
    }


N_SCENES = 8
CAP_PER_SHARD = 256


def build_task(axis_name, num_batches: int):
    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.train.modules import SegmentationTraining

    model = get_model(
        name="Res16UNet14", out_channel=8, num_batches=num_batches,
        planes=(8,) * 8, bn_axis_name=axis_name,
    )
    return SegmentationTraining(
        model, optimizer_name="SGD", scheduler_name="none", lr=0.1,
        ignore_label=-100, axis_name=axis_name,
    )


def main():
    port, pid, nprocs, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from nerf_downstream_tpu.data.utils import collate_mink_sharded
    from nerf_downstream_tpu.parallel.train import make_parallel_train_step

    # process-strided scene share (the per-host filelist sharding,
    # DataModule.train_batches: files[process_index::process_count])
    local_ids = list(range(jax.process_index(), N_SCENES, nprocs))
    local = collate_mink_sharded(
        [make_sample(i) for i in local_ids],
        shards=len(local_ids),
        capacity_per_shard=CAP_PER_SHARD,
    )
    local.pop("metadata", None)
    local.pop("shards", None)

    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    data_sh = NamedSharding(mesh, P("data"))
    repl_sh = NamedSharding(mesh, P())
    batch = {
        k: (
            jax.make_array_from_process_local_data(data_sh, np.asarray(v))
            if np.ndim(v) >= 1
            else jax.make_array_from_process_local_data(
                repl_sh, np.asarray(v)
            )
        )
        for k, v in local.items()
    }

    task = build_task("data", num_batches=1)
    # deterministic init on every process, then replicated placement
    local_example = {
        k: v[: CAP_PER_SHARD] if np.ndim(v) >= 1 else v
        for k, v in local.items()
    }
    state = task.create_state(jax.random.PRNGKey(0), local_example)
    state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            repl_sh, np.asarray(x)
        ),
        state,
    )

    step = make_parallel_train_step(task, mesh)
    new_state, mets = step(state, batch)
    loss = float(np.asarray(mets["loss"]))
    oa = float(np.asarray(mets["OA"]))
    # a replicated post-step param leaf, to prove the update applied
    # identically across processes
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    leaf_sum = float(np.asarray(jnp_sum(leaf)))
    if jax.process_index() == 0:
        with open(out_path, "w") as f:
            json.dump({"loss": loss, "OA": oa, "leaf_sum": leaf_sum}, f)
    jax.distributed.shutdown()


def jnp_sum(x):
    import jax.numpy as jnp

    return jnp.sum(x)


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    main()
