"""Two-process jax.distributed rehearsal (the closest this single-host
environment gets to the reference's SLURM multi-node DDP, sbatch.sh:1-44).

Spawns two OS processes that each contribute 4 virtual CPU devices to one
8-device mesh via a real coordination service, feed process-strided scene
shares through the sharded collate + make_array_from_process_local_data,
and run one psum'd shard_map train step. The psum'd global loss must equal
a single-process 8-device run of the same global batch — the
global-denominator loss makes the result scene-partition-invariant, so the
comparison is tight.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_rehearsal(tmp_path):
    # bounded by the communicate(timeout=560) below, no plugin needed
    port = _free_port()
    out = tmp_path / "mp0.json"
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PALLAS_AXON_POOL_IPS="",  # skip remote-TPU plugin registration
        PYTHONPATH=_ROOT,
    )
    env.pop("JAX_PLATFORM_NAME", None)
    script = os.path.join(_ROOT, "tests", "mp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(port), str(pid), "2", str(out)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=_ROOT,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=560)
        logs.append(stdout.decode(errors="replace"))
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{log[-4000:]}"
    res = json.loads(out.read_text())

    # single-process reference on the 8-device conftest mesh: the SAME
    # eight scenes as one global batch
    import jax
    from tests.mp_worker import CAP_PER_SHARD, N_SCENES, build_task, make_sample

    from nerf_downstream_tpu.data.utils import collate_mink_sharded
    from nerf_downstream_tpu.parallel.mesh import (
        make_mesh,
        replicate,
        shard_leading,
    )
    from nerf_downstream_tpu.parallel.train import make_parallel_train_step

    batch = collate_mink_sharded(
        [make_sample(i) for i in range(N_SCENES)],
        shards=N_SCENES,
        capacity_per_shard=CAP_PER_SHARD,
    )
    batch.pop("metadata", None)
    batch.pop("shards", None)
    task = build_task("data", num_batches=1)
    local = {
        k: v[:CAP_PER_SHARD] if np.ndim(v) >= 1 else v
        for k, v in batch.items()
    }
    state = task.create_state(jax.random.PRNGKey(0), local)
    mesh = make_mesh(8)
    step = make_parallel_train_step(task, mesh)
    _, mets = step(replicate(mesh, state), shard_leading(mesh, batch))

    np.testing.assert_allclose(
        res["loss"], float(np.asarray(mets["loss"])), rtol=1e-5
    )
    np.testing.assert_allclose(
        res["OA"], float(np.asarray(mets["OA"])), rtol=1e-4, atol=1e-4
    )
