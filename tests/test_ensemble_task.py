"""Joint 2D+3D ensemble: dataset pairing, collate, and a full train step."""

import os

import jax
import numpy as np
import pytest

from nerf_downstream_tpu import config as cfg


@pytest.fixture(autouse=True)
def _clean():
    cfg.clear_config()
    yield
    cfg.clear_config()


def _joint_tree(tmp_path, rng, n=3):
    from PIL import Image

    from nerf_downstream_tpu.data import plenoxel
    from nerf_downstream_tpu.data.co3d import CLASSES

    root3d = tmp_path / "co3d3d"
    root2d = tmp_path / "frames"
    fdir = tmp_path / "filelist"
    os.makedirs(fdir)
    lines = []
    for i in range(n):
        inst = f"inst{i}"
        cls = CLASSES[i % 3]
        sc = plenoxel.make_synthetic_scene(rng, n_voxels=300)
        plenoxel.save_npz(
            str(root3d / f"plenoxel_co3d_{inst}" / "data.npz"),
            sc["coords"], sc["density"], sc["sh"], sc["reso"],
        )
        os.makedirs(root2d / cls / inst / "fgbg")
        Image.fromarray(
            rng.integers(0, 255, size=(48, 48, 3)).astype(np.uint8)
        ).save(root2d / cls / inst / "fgbg" / "image000.jpg")
        lines.append(f"{cls} {inst}")
    for phase in ("train", "test"):
        (fdir / f"{phase}.txt").write_text("\n".join(lines) + "\n")
    return str(root3d), str(root2d), str(fdir)


def test_joint_dataset_and_train_step(tmp_path, rng):
    from nerf_downstream_tpu.data.joint import JointCo3DDataset, collate_joint
    from nerf_downstream_tpu.models.ensemble import Ensemble2D3D
    from nerf_downstream_tpu.train.modules import (
        EnsembleClassificationTraining,
        get_training_module,
    )

    root3d, root2d, fdir = _joint_tree(tmp_path, rng)
    ds = JointCo3DDataset(
        "train", data_root=root3d, frames_root=root2d, image_size=48,
        filelist_dir=fdir,
    )
    assert len(ds) == 3
    item = ds[0]
    assert item["image"].shape == (48, 48, 3)
    assert item["features"].shape[0] == item["coordinates"].shape[0]

    batch = collate_joint([ds[0], ds[1]], capacity=1024)
    assert batch["images"].shape == (2, 48, 48, 3)
    assert batch["coordinates"].shape[0] == 1024

    model = Ensemble2D3D(
        out_channel=6, image_model="resnet18", voxel_model="ResNet14",
        num_batches=2,
    )
    assert (
        get_training_module("EnsembleClassificationTraining")
        is EnsembleClassificationTraining
    )
    task = EnsembleClassificationTraining(
        model, optimizer_name="SGD", scheduler_name="none", lr=0.01,
    )
    batch["labels"] = np.asarray(
        [b["labels"][0] for b in (ds[0], ds[1])], np.int32
    )
    batch.pop("metadata", None)  # host-side strings stay out of jit
    state = task.create_state(jax.random.PRNGKey(0), batch)
    step = task.make_train_step(donate=False)
    new_state, mets = step(state, batch)
    assert np.isfinite(float(mets["loss"]))
    # both branches' params updated
    p0 = state.params
    p1 = new_state.params
    assert not np.allclose(
        np.asarray(p0["image"]["conv1"]["kernel"]),
        np.asarray(p1["image"]["conv1"]["kernel"]),
    )
    assert not np.allclose(
        np.asarray(p0["voxel"]["conv1"]["kernel"]),
        np.asarray(p1["voxel"]["conv1"]["kernel"]),
    )

    # eval step
    estep = task.make_eval_step()
    logits, emets = estep(new_state, batch)
    assert logits.shape == (2, 6)
