"""Long-tail surfaces exercised once each (VERDICT round-1 gap list):
SemanticKITTI save_prediction inverse remap, Stanford/S3DIS smoke,
vis.py PLY export, SegmentationTraining save_pred dump round trip."""

import os

import numpy as np
import pytest


def test_kitti_label_maps_golden():
    """Raw->train remap with moving-class folding, and the inverse map used
    for server submission (reference semantic_kitti.py:224-239)."""
    from nerf_downstream_tpu.data.semantic_kitti import (
        CLASS_LABELS,
        build_kitti_label_maps,
    )

    label_map, inv_map = build_kitti_label_maps(-100)
    # golden spot checks from the published SemanticKITTI mapping
    assert label_map[10] == CLASS_LABELS.index("car")
    assert label_map[252] == label_map[10]  # moving-car folds onto car
    assert label_map[254] == CLASS_LABELS.index("person")
    assert label_map[0] == -100  # unlabeled
    assert label_map[99] == -100  # other-object not in the 19 classes
    # inverse: train id -> raw id, for every class
    for train_id, name in enumerate(CLASS_LABELS):
        raw = int(inv_map[train_id])
        assert label_map[raw] == train_id, name


def test_kitti_dataset_and_save_prediction(tmp_path, rng):
    from nerf_downstream_tpu.data.semantic_kitti import SemanticKITTIDataset

    seq_dir = tmp_path / "dataset" / "sequences" / "08"
    os.makedirs(seq_dir / "velodyne")
    os.makedirs(seq_dir / "labels")
    n = 300
    xyzi = rng.normal(size=(n, 4)).astype(np.float32) * 5
    xyzi.tofile(seq_dir / "velodyne" / "000000.bin")
    raw_ids = np.asarray(
        rng.choice([10, 40, 48, 50, 70, 252, 0], size=n), np.int32
    )
    # upper 16 bits carry instance ids in the real format
    (raw_ids | (7 << 16)).astype(np.int32).tofile(
        seq_dir / "labels" / "000000.label"
    )

    ds = SemanticKITTIDataset("val", data_root=str(tmp_path))
    item = ds[0]
    assert item["features"].shape[1] == 4
    assert len(item["coordinates"]) == len(item["labels"])
    assert item["metadata"]["sequence"] == "08"

    pred = np.clip(np.asarray(item["labels"]), 0, 18)
    out = ds.save_prediction(pred, str(tmp_path / "subm"), item["metadata"])
    assert out.endswith("sequences/08/predictions/000000.label")
    written = np.fromfile(out, np.uint32)
    # round trip: submission raw ids remap back to the predicted train ids
    np.testing.assert_array_equal(ds.label_map[written & 0xFFFF], pred)


def test_stanford_smoke(tmp_path, rng):
    from nerf_downstream_tpu.data.ply import write_ply
    from nerf_downstream_tpu.data.stanford import StanfordDataset

    n = 200
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    colors = rng.integers(0, 255, size=(n, 3)).astype(np.uint8)
    labels = rng.integers(0, 13, size=n).astype(np.int32)
    os.makedirs(tmp_path / "area1")
    write_ply(str(tmp_path / "area1" / "room1.ply"), xyz, colors, labels)
    (tmp_path / "stanford_train.txt").write_text("area1/room1.ply\n")

    ds = StanfordDataset("train", data_root=str(tmp_path), voxel_size=0.1)
    item = ds[0]
    assert item["features"].shape[1] == 3
    assert (np.asarray(item["labels"]) < 13).all()
    assert len(ds) == 1


def test_vis_cli_ply_export(tmp_path, rng):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_cli_3d import write_scannet_tree

    from co3d_3d import vis

    root = write_scannet_tree(tmp_path, rng)
    out = str(tmp_path / "export.ply")
    vis.main([
        "--ginc", "co3d_3d/configs/scannet_plenoxel.gin",
        "--ginb", f'PlenoxelScannetDataset.data_root = "{root}"',
        "--ginb", "PlenoxelScannetDataset.train_transformations = []",
        "--phase", "train", "--index", "0",
        "--density_percentile", "0.2", "--out", out,
    ])
    assert os.path.exists(out)
    from nerf_downstream_tpu.data.ply import read_ply_vertices

    verts = read_ply_vertices(out)
    assert len(verts) > 0


def test_save_pred_round_trip(tmp_path, rng):
    """save_pred dumps {coordinates, logits, dists, labels} every 2nd scene
    (reference segmentation_training.py:143-158)."""
    import jax.numpy as jnp

    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.train.modules import SegmentationTraining

    model = get_model(name="Res16UNet14", out_channel=4, num_batches=1,
                      planes=(4,) * 8)
    task = SegmentationTraining(
        model, optimizer_name="SGD", scheduler_name="none", lr=0.1,
        ignore_label=-100, save_pred=True,
        save_pred_path=str(tmp_path / "preds"),
    )
    task.on_validation_start()
    n = 64
    batch = {
        "coordinates": rng.normal(size=(n, 4)).astype(np.float32),
        "mask": np.ones(n, bool),
        "labels": rng.integers(0, 4, n).astype(np.int32),
        "dists": rng.uniform(0, 1, n).astype(np.float32),
        "metadata": [{"file": "scene042"}],
    }
    logits = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    task.validation_batch_end(logits, batch)  # idx 0 -> dumped
    task.validation_batch_end(logits, batch)  # idx 1 -> skipped
    files = os.listdir(tmp_path / "preds")
    assert files == ["scene042.npz"]
    dump = np.load(tmp_path / "preds" / "scene042.npz")
    np.testing.assert_allclose(dump["logits"], np.asarray(logits))
    np.testing.assert_array_equal(dump["labels"], batch["labels"])
