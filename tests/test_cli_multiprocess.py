"""Two-process CLI rehearsal: the FULL co3d_3d.train fit/val/checkpoint
cycle under jax.distributed (the behavior the reference gets from SLURM
multi-node DDP, sbatch.sh:1-44 — srun launches one process per node and
Lightning coordinates them).

Two OS processes each run the real ``co3d_3d.train`` CLI with
``--dist_*`` flags (4 virtual CPU devices each, one 8-device global mesh),
process-strided filelists, global-batch assembly, psum'd step + metrics,
rank-0 best/last checkpoints and eval_results.json. The workload is
partition-invariant by construction (batch_size == dataset size, so every
step consumes every scene; global-denominator loss; sync BN), so the
2-process trajectory must match a single-process 8-device run of the same
config bit-for-noise: same final params (up to psum accumulation order)
and same eval metrics.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from nerf_downstream_tpu import config as cfg
from tests.test_cli_3d import CFG, write_scannet_tree

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(autouse=True)
def _clean_cfg():
    cfg.clear_config()
    yield
    cfg.clear_config()


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _common_args(root):
    return [
        "--ginc", f"{CFG}/scannet_plenoxel.gin",
        "--ginc", f"{CFG}/scannet_feature_sh.gin",
        "--ginb", f'PlenoxelScannetDataset.data_root = "{root}"',
        "--ginb", "PlenoxelScannetDataset.downsample_stride = 1",
        # no host/device augmentation: partition-invariance needs
        # RNG-free inputs
        "--ginb", "PlenoxelScannetDataset.train_transformations = []",
        "--ginb", "train.device_transforms = []",
        "--ginb", "Res16UNet.PLANES = (8, 8, 8, 8, 8, 8, 8, 8)",
        "--ginb", "Res16UNet.LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)",
        # capless row conv path: compiles several times faster than the
        # windowed path — per-rank compile skew beyond the Gloo collective
        # rendezvous timeout (~30 s) kills CPU multi-process runs, and
        # this test exercises the DISTRIBUTED machinery, not the conv path
        "--ginb", 'CoordinateContext.method = "row"',
        "--ginb", "train.max_steps = 3",
        "--ginb", "train.val_every_n_steps = 2",
        "--ginb", "train.batch_size = 8",
        "--ginb", "train.val_batch_size = 8",
        "--ginb", "train.capacity = 8192",
        "--ginb", "train.train_num_workers = 1",
        "--ginb", "train.val_num_workers = 1",
        "--ginb", "train.use_sync_batchnorm = True",
        "--ginb", "train.evaluate = True",
        "--ginb", 'train.test_phase = "val"',
    ]


def test_two_process_cli_matches_single(tmp_path, rng):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    root = write_scannet_tree(tmp_path, rng, n_scenes=8)

    # --- single-process reference: 8 local virtual devices -------------
    from co3d_3d import train as train_cli
    from nerf_downstream_tpu.train import checkpoints

    out_s = tmp_path / "exp_single"
    train_cli.main(
        _common_args(root)
        + ["--save_path", str(out_s), "--seed", "3", "--gpus", "8"]
    )
    assert (out_s / "eval_results.json").exists()

    # --- two real processes through the SAME CLI ------------------------
    port = _free_port()
    out_p = tmp_path / "exp_mp"  # shared save_path: rank 0 writes
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PALLAS_AXON_POOL_IPS="",  # skip remote-TPU plugin registration
        PYTHONPATH=_ROOT,
    )
    env.pop("JAX_PLATFORM_NAME", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "co3d_3d.train"]
            + _common_args(root)
            + [
                "--save_path", str(out_p), "--seed", "3", "--gpus", "8",
                "--dist_coordinator", f"127.0.0.1:{port}",
                "--dist_num_processes", "2",
                "--dist_process_id", str(pid),
            ],
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
        assert p.returncode == 0, f"rank {pid} failed:\n{log[-6000:]}"

    # rank-0 artifacts on the shared path
    assert (out_p / "last.ckpt").exists()
    assert (out_p / "best.ckpt").exists()
    assert (out_p / "eval_results.json").exists()

    ck_s = checkpoints.load_checkpoint(str(out_s / "last.ckpt"))
    ck_p = checkpoints.load_checkpoint(str(out_p / "last.ckpt"))
    jax.tree_util.tree_map(
        lambda a, b: (
            np.testing.assert_equal(np.isfinite(np.asarray(a)).all(), True),
            # psum accumulation-order noise only; a broken cross-process
            # grad sync is off by O(1)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
            ),
        ),
        ck_s["params"], ck_p["params"],
    )
    res_s = json.loads((out_s / "eval_results.json").read_text())
    res_p = json.loads((out_p / "eval_results.json").read_text())
    for k in ("val/mIoU", "val/OA", "val/loss"):
        assert np.isfinite(res_s[k]), (k, res_s)
        np.testing.assert_allclose(
            res_s[k], res_p[k], rtol=1e-3, atol=1e-3, err_msg=k
        )
