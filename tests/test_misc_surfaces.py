"""Small untested surfaces: run_all sweep generator, TensorBoard logger
(via torch's SummaryWriter), eval --sparsify CLI flag plumbing."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_all_generates_sweep():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "co3d_3d", "run_all.py")],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert out.returncode == 0, out.stderr
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 3 * 4 * 3  # models x features x seeds
    assert all("co3d_3d.eval" in l and "--tag" in l for l in lines)
    assert any("feature_sh" in l and "resnet34" in l for l in lines)


def test_tensorboard_logger_writes_events(tmp_path):
    torch = pytest.importorskip("torch")  # tb rides torch's SummaryWriter
    pytest.importorskip("torch.utils.tensorboard")
    from nerf_downstream_tpu.train.loggers import get_logger

    lg = get_logger("tensorboard", str(tmp_path), "run1", "proj")
    lg.log_metrics({"train/loss": 1.25, "train/OA": 50.0}, step=3)
    lg.log_hyperparams({"lr": 0.1})
    lg.finalize()
    found = []
    for root, _, files in os.walk(tmp_path):
        found += [f for f in files if "tfevents" in f]
    assert found, "no tensorboard event files written"


def test_eval_sparsify_flag_builds_sparse_model(tmp_path, rng):
    """--sparsify --sparse_mode plumbs the 9-slot list into get_model."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_cli_3d import write_scannet_tree

    from co3d_3d import eval as eval_cli
    from co3d_3d import train as train_cli

    root = write_scannet_tree(tmp_path, rng)
    args_common = [
        "--ginc", "co3d_3d/configs/scannet_plenoxel.gin",
        "--ginc", "co3d_3d/configs/scannet_feature_sh.gin",
        "--ginb", f'PlenoxelScannetDataset.data_root = "{root}"',
        "--ginb", "PlenoxelScannetDataset.downsample_stride = 2",
        "--ginb", "PlenoxelScannetDataset.train_transformations = []",
        "--ginb", "Res16UNet.PLANES = (4, 4, 4, 4, 4, 4, 4, 4)",
        "--ginb", "Res16UNet.LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)",
    ]
    train_cli.main(args_common + [
        "--ginb", "train.max_steps = 2",
        "--ginb", "train.val_every_n_steps = 10",
        "--ginb", "train.batch_size = 1",
        "--ginb", "train.val_batch_size = 1",
        "--save_path", str(tmp_path / "exp"), "--seed", "1",
    ])
    res = eval_cli.main(args_common + [
        "--ginb", "train.val_batch_size = 1",
        "--load_path", str(tmp_path / "exp" / "last.ckpt"),
        "--sparsify", "--sparse_mode", "2,2,2,2,2,2,2,2,2",
        "--tag", "zaxis", "--device", "cpu",
    ])
    assert os.path.exists(tmp_path / "exp" / "zaxis.json")
