"""Data pipeline tests: plenoxel decode, datasets on synthetic npz scenes,
transforms, collate, datamodule iteration."""

import os
import pickle

import numpy as np
import pytest

from nerf_downstream_tpu import config as cfg
from nerf_downstream_tpu.data import plenoxel
from nerf_downstream_tpu.data import transforms as T
from nerf_downstream_tpu.data.co3d import CLASSES, Co3DDataset
from nerf_downstream_tpu.data.scannet import PlenoxelScannetDataset
from nerf_downstream_tpu.data.utils import collate_mink, collate_pointnet


@pytest.fixture(autouse=True)
def _clean_cfg():
    cfg.clear_config()
    T.seed(0)
    yield
    cfg.clear_config()


def _write_co3d_tree(tmp_path, rng, n_scenes=4):
    root = tmp_path / "co3d"
    lines = []
    for i in range(n_scenes):
        inst = f"scene{i}"
        scene = plenoxel.make_synthetic_scene(rng, n_voxels=300)
        plenoxel.save_npz(
            str(root / f"plenoxel_co3d_{inst}" / "data.npz"),
            scene["coords"], scene["density"], scene["sh"], scene["reso"],
        )
        lines.append(f"{CLASSES[i % len(CLASSES)]} {inst}")
    fdir = tmp_path / "filelist"
    os.makedirs(fdir, exist_ok=True)
    for phase in ("train", "test"):
        (fdir / f"{phase}.txt").write_text("\n".join(lines) + "\n")
    return str(root), str(fdir)


def test_npz_roundtrip(tmp_path, rng):
    scene = plenoxel.make_synthetic_scene(rng, n_voxels=200, with_labels=True)
    path = str(tmp_path / "s" / "data.npz")
    plenoxel.save_npz(
        path, scene["coords"], scene["density"], scene["sh"], scene["reso"],
        labels=scene["labels"], dists=scene["dists"],
    )
    data = plenoxel.load_npz(path)
    np.testing.assert_array_equal(data["coords"], scene["coords"])
    np.testing.assert_allclose(np.asarray(data["density"]).reshape(-1, 1), scene["density"])
    # sh is uint8-quantized: tolerance = quantization step
    step = (scene["sh"].max() - scene["sh"].min()) / 255
    assert np.abs(data["sh"] - scene["sh"]).max() <= step
    np.testing.assert_array_equal(data["labels"], scene["labels"])


def test_co3d_dataset(tmp_path, rng):
    root, fdir = _write_co3d_tree(tmp_path, rng)
    ds = Co3DDataset(
        "train", data_root=root, filelist_dir=fdir,
        downsample_stride=1, features=["sh"],
    )
    assert len(ds) == 4
    s = ds[0]
    assert s["features"].shape[1] == 27
    assert s["labels"].shape == (1,)
    # feature selector combinations with matching widths
    for feats, width in [(["ones"], 1), (["density"], 1), (["xyzs"], 3),
                         (["sh", "density"], 28)]:
        ds2 = Co3DDataset(
            "train", data_root=root, filelist_dir=fdir,
            downsample_stride=1, features=feats,
        )
        assert ds2[0]["features"].shape[1] == width


def test_co3d_downsample_modes(tmp_path, rng):
    root, fdir = _write_co3d_tree(tmp_path, rng)
    full = Co3DDataset("train", data_root=root, filelist_dir=fdir,
                       downsample_stride=1)[0]
    mode1 = Co3DDataset("train", data_root=root, filelist_dir=fdir,
                        downsample_stride=2, downsample_mode=1)[0]
    mode0 = Co3DDataset("train", data_root=root, filelist_dir=fdir,
                        downsample_stride=2, downsample_mode=0)[0]
    assert len(mode1["coordinates"]) <= len(full["coordinates"])
    assert len(mode0["coordinates"]) <= len(full["coordinates"])


def _write_scannet_tree(tmp_path, rng, n_scenes=3):
    root = tmp_path / "perfception-scannet"
    split = tmp_path / "split"
    os.makedirs(split, exist_ok=True)
    scales = {}
    names = []
    for i in range(n_scenes):
        inst = f"scene{i:04d}_00"
        scene = plenoxel.make_synthetic_scene(
            rng, n_voxels=400, with_labels=True, num_classes=41
        )
        plenoxel.save_npz(
            str(root / f"plenoxel_torch_{inst}" / "data.npz"),
            scene["coords"], scene["density"], scene["sh"], scene["reso"],
            labels=scene["labels"], dists=scene["dists"],
        )
        scales[inst] = 1.0
        names.append(inst)
    for phase in ("train", "val"):
        (split / f"scannet_256_{phase}.txt").write_text("\n".join(names))
    with open(split / "scene_scales.data", "wb") as f:
        pickle.dump(scales, f)
    return str(root)


def test_plenoxel_scannet_dataset(tmp_path, rng):
    root = _write_scannet_tree(tmp_path, rng)
    ds = PlenoxelScannetDataset(
        "train", data_root=root, downsample_stride=1,
        features=["sh"], valid_thres=0.05, void_label=None,
    )
    s = ds[0]
    assert s["features"].shape[1] == 27
    labs = s["labels"]
    # all labels in [-100] + [0, 20)
    assert set(np.unique(labs)) <= set(range(20)) | {-100}
    # void labeling: with void_label set, far voxels get class 20
    ds_void = PlenoxelScannetDataset(
        "train", data_root=root, downsample_stride=1,
        features=["sh"], valid_thres=0.0, void_label=50,
    )
    s2 = ds_void[0]
    assert (s2["labels"] == 20).all()  # every voxel farther than 0 -> void


def test_scannet_feature_density_norm(tmp_path, rng):
    root = _write_scannet_tree(tmp_path, rng)
    ds = PlenoxelScannetDataset(
        "train", data_root=root, downsample_stride=1,
        features=["sh", "density"],
    )
    s = ds[0]
    assert s["features"].shape[1] == 28
    assert np.abs(s["features"][:, -1]).max() <= 1.0 + 1e-5


def test_collate_rejects_out_of_extent_span(rng):
    """ADVICE round-1: build_grid_index silently drops coords beyond
    grid_extent — the collate now fails loudly at batch build."""
    import pytest

    from nerf_downstream_tpu import config as cfg
    from nerf_downstream_tpu.data.utils import collate_mink

    sample = {
        "coordinates": np.array([[0, 0, 0], [200, 0, 0]], np.float32),
        "features": np.ones((2, 3), np.float32),
        "labels": np.array([0, 1]),
    }
    cfg.clear_config()
    cfg.parse_config("CoordinateContext.grid_extent = 128\n")
    with pytest.raises(ValueError, match="grid_extent"):
        collate_mink([sample], capacity=64)
    cfg.clear_config()
    collate_mink([sample], capacity=64)  # no extent configured: fine


def test_collate_mink_padding(rng):
    def mk(n, c=4, per_point=True):
        return {
            "coordinates": rng.normal(size=(n, 3)).astype(np.float32),
            "features": rng.normal(size=(n, c)).astype(np.float32),
            "labels": (
                rng.integers(0, 5, n).astype(np.int32)
                if per_point else np.array([2], np.int32)
            ),
        }

    batch = collate_mink([mk(10), mk(20)], capacity=64)
    assert batch["coordinates"].shape == (64, 4)
    assert batch["mask"].sum() == 30
    assert (batch["labels"][30:] == -100).all()
    assert batch["coordinates"][:10, 0].max() == 0
    assert batch["coordinates"][10:30, 0].min() == 1

    cls = collate_mink(
        [mk(10, per_point=False), mk(20, per_point=False)], capacity=64
    )
    assert cls["labels"].shape == (2,)

    padded = collate_mink([mk(10, per_point=False)], capacity=64, pad_to_batch=4)
    assert padded["labels"].shape == (4,)
    assert padded["sample_mask"].tolist() == [True, False, False, False]


def test_transform_pipeline_runs(rng):
    coords = rng.normal(size=(100, 3)).astype(np.float32) * 20
    feats = np.abs(rng.normal(size=(100, 31)).astype(np.float32)) * 100
    labels = rng.integers(0, 5, 100).astype(np.int32)
    pipeline = T.build([
        "RandomRotation", "RandomCrop", "RandomAffine", "CoordinateDropout",
        "RandomFeatureJitter", "RandomHorizontalFlip", "RandomTranslation",
        "ElasticDistortion", "RandomScale", "CoordinateJitter",
        "CoordinateUniformTranslation", "PerlinNoise",
    ])
    c, f, l = pipeline(coords, feats, labels)
    assert c.shape[1] == 3
    assert len(c) == len(f) == len(l)
    assert np.isfinite(c).all() and np.isfinite(f).all()


def test_transform_rotation_preserves_norms(rng):
    coords = rng.normal(size=(50, 3)).astype(np.float64)
    rot = T.RandomRotation(application_ratio=1.0)
    c, _, _ = rot(coords.copy(), None, None)
    np.testing.assert_allclose(
        np.linalg.norm(c, axis=1), np.linalg.norm(coords, axis=1), rtol=1e-6
    )


def test_voxel_downsample_simple(rng):
    coords = rng.integers(0, 10, (200, 3)).astype(np.float32)
    feats = rng.normal(size=(200, 2)).astype(np.float32)
    labels = rng.integers(0, 3, 200)
    t = T.VoxelDownsampleSimple(stride=2)
    c, f, l = t(coords, feats, labels)
    assert (np.mod(c, 2) == 0).all()


def test_density_based_sample(rng):
    feats = rng.normal(size=(1000, 5)).astype(np.float32)
    coords = rng.normal(size=(1000, 3)).astype(np.float32)
    t = T.DensityBasedSample(percentile=0.95, density_dim=3)
    c, f, l = t(coords, feats, None)
    assert len(c) <= 60  # ~5% kept


def test_datamodule_iteration(tmp_path, rng):
    root, fdir = _write_co3d_tree(tmp_path, rng, n_scenes=6)
    cfg.parse_config(
        'get_dataset.dataset_name = "Co3DDataset"\n'
        f'Co3DDatasetBase.data_root = "{root}"\n'
        f'Co3DDatasetBase.filelist_dir = "{fdir}"\n'
        "Co3DDatasetBase.downsample_stride = 1\n"
    )
    from nerf_downstream_tpu.data.data_module import DataModule

    dm = DataModule(batch_size=2, val_batch_size=2, train_num_workers=2,
                    val_num_workers=1)
    it = dm.train_batches()
    b = next(it)
    assert b["coordinates"].shape[0] == b["features"].shape[0]
    assert b["labels"].shape == (2,)
    vals = list(dm.val_batches("val"))
    assert len(vals) == 3


def test_native_decoder_matches_numpy(tmp_path, rng):
    """C++ decoder output == numpy decoder output (built on demand)."""
    from nerf_downstream_tpu import runtime

    scene = plenoxel.make_synthetic_scene(rng, n_voxels=300, with_labels=True)
    path = str(tmp_path / "s" / "data.npz")
    plenoxel.save_npz(
        path, scene["coords"], scene["density"], scene["sh"], scene["reso"],
        labels=scene["labels"], dists=scene["dists"],
    )
    if not runtime.native_available():
        pytest.skip("native decoder toolchain unavailable")
    native = runtime.load_scene_native(path)
    ref = np.load(path)
    np.testing.assert_array_equal(native["coords"], scene["coords"])
    np.testing.assert_allclose(
        native["density"][:, 0], scene["density"][:, 0], rtol=1e-6
    )
    sh_ref = ref["sh"].astype(np.float32) * ref["sh_scale"] + ref["sh_min"]
    np.testing.assert_allclose(native["sh"], sh_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(native["labels"], scene["labels"])
    np.testing.assert_allclose(
        native["dists"], scene["dists"].astype(np.float32), rtol=1e-3
    )


def test_native_decoder_compressed(tmp_path, rng):
    """Deflate-compressed npz (savez_compressed) decodes identically."""
    from nerf_downstream_tpu import runtime

    if not runtime.native_available():
        pytest.skip("native decoder toolchain unavailable")
    scene = plenoxel.make_synthetic_scene(rng, n_voxels=200)
    reso = np.asarray(scene["reso"])
    links = (
        scene["coords"][:, 0] * reso[1] + scene["coords"][:, 1]
    ) * reso[2] + scene["coords"][:, 2]
    path = str(tmp_path / "c.npz")
    np.savez_compressed(
        path, links=links, density=scene["density"], sh=scene["sh"],
        sh_min=np.float32(0), sh_scale=np.float32(1), reso=reso,
    )
    native = runtime.load_scene_native(path)
    np.testing.assert_array_equal(native["coords"], scene["coords"])
    np.testing.assert_allclose(native["sh"], scene["sh"], rtol=1e-6)


def test_prune_batches(tmp_path, rng):
    root, fdir = _write_co3d_tree(tmp_path, rng, n_scenes=6)
    cfg.parse_config(
        'get_dataset.dataset_name = "Co3DDataset"\n'
        f'Co3DDatasetBase.data_root = "{root}"\n'
        f'Co3DDatasetBase.filelist_dir = "{fdir}"\n'
        "Co3DDatasetBase.downsample_stride = 1\n"
    )
    from nerf_downstream_tpu.data.data_module import DataModule

    dm = DataModule(batch_size=2, val_batch_size=2, train_num_workers=1,
                    val_num_workers=1)
    batches = list(dm.prune_batches(num_batches=2))
    assert len(batches) == 2
    assert batches[0]["coordinates"].shape[1] == 4


def test_trilinear_uniform_matches_scipy(rng):
    """The hand-rolled uniform trilinear interpolation (ElasticDistortion /
    PerlinNoise hot path) == scipy RegularGridInterpolator with
    fill_value=0, including out-of-bounds points."""
    import scipy.interpolate

    from nerf_downstream_tpu.data.transforms import _trilinear_uniform

    dims = (7, 9, 5)
    step = 4.0
    gmin = np.array([-3.0, 2.0, 1.5])
    noise = rng.normal(size=(*dims, 3)).astype(np.float32)
    ax = [gmin[d] + step * np.arange(dims[d]) for d in range(3)]
    ref = scipy.interpolate.RegularGridInterpolator(
        ax, noise, bounds_error=False, fill_value=0
    )
    # points inside, on edges, and far outside
    pts = np.concatenate([
        gmin + rng.uniform(0, step * (np.array(dims) - 1), (200, 3)),
        gmin[None, :] + 0.0,
        (gmin + step * (np.array(dims) - 1))[None, :],
        gmin + np.array([[-50.0, 0, 0], [0, 1e3, 0], [4.0, 4.0, -0.01]]),
    ]).astype(np.float32)
    got = _trilinear_uniform(noise, gmin, step, pts)
    np.testing.assert_allclose(
        got, ref(pts).astype(np.float32), rtol=1e-4, atol=1e-5
    )


def test_datamodule_process_workers(tmp_path, rng):
    """worker_mode="process" (fork pool, the reference's DataLoader worker
    model) yields the same batch count/shapes as threads, and the
    per-worker transform-RNG reseed decorrelates augmented batches."""
    root, fdir = _write_co3d_tree(tmp_path, rng, n_scenes=6)
    cfg.parse_config(
        'get_dataset.dataset_name = "Co3DDataset"\n'
        f'Co3DDatasetBase.data_root = "{root}"\n'
        f'Co3DDatasetBase.filelist_dir = "{fdir}"\n'
        "Co3DDatasetBase.downsample_stride = 1\n"
        'Co3DDatasetBase.train_transformations = ["RandomFeatureJitter"]\n'
        "RandomFeatureJitter.application_ratio = 1.0\n"
        "RandomFeatureJitter.start_ind = 0\n"
        "RandomFeatureJitter.feature_dim = 4\n"
    )
    from nerf_downstream_tpu.data.data_module import DataModule

    dm = DataModule(
        batch_size=2, val_batch_size=2, train_num_workers=2,
        val_num_workers=2, worker_mode="process",
    )
    it = dm.train_batches()
    b0, b1 = next(it), next(it)
    assert b0["coordinates"].shape[0] == b0["features"].shape[0]
    assert b0["labels"].shape == (2,)
    # different worker RNG streams -> different augmented features
    assert not np.array_equal(b0["features"], b1["features"])
    vals = list(dm.val_batches("val"))
    assert len(vals) == 3
