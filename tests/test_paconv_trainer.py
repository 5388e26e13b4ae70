"""PAConv standalone trainer CLI smoke on synthetic ModelNet40 h5."""

import numpy as np
import pytest

from nerf_downstream_tpu import config as cfg


@pytest.fixture(autouse=True)
def _clean():
    cfg.clear_config()
    yield
    cfg.clear_config()


def _write_modelnet(tmp_path, rng, n=16, pts=64):
    import h5py

    root = tmp_path / "mn40"
    root.mkdir()
    for phase in ("train", "test"):
        with h5py.File(root / f"ply_data_{phase}0.h5", "w") as f:
            f["data"] = rng.normal(size=(n, pts, 3)).astype(np.float32)
            f["label"] = rng.integers(0, 40, (n, 1)).astype(np.int64)
    return str(root)


def test_paconv_trainer_smoke(tmp_path, rng):
    root = _write_modelnet(tmp_path, rng)
    from co3d_3d import paconv_train

    res = paconv_train.main([
        "--model", "PAConvPointNet",
        "--data_root", root,
        "--batch_size", "4",
        "--val_batch_size", "4",
        "--epochs", "1",
        "--num_points", "64",
        "--workers", "1",
        "--save_path", str(tmp_path / "out"),
        "--ginb", "PAConvPointNet.k = 8",
        "--ginb", "PAConvPointNet.num_matrices = (2, 2, 2)",
    ])
    assert "val/acc1" in res


def test_modelnet40_dataset(tmp_path, rng):
    root = _write_modelnet(tmp_path, rng)
    from nerf_downstream_tpu.data.modelnet40 import ModelNet40H5Dataset

    ds = ModelNet40H5Dataset("train", data_root=root, num_points=64,
                             train_transformations=())
    assert len(ds) == 16
    s = ds[0]
    assert s["coordinates"].shape == (64, 3)
    assert s["labels"].shape == (1,)
