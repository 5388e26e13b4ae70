"""Data-layer parity against the REFERENCE'S OWN CODE on identical bytes.

The reference's dataset classes import MinkowskiEngine/gin/plyfile (absent
here), but their decode paths only need torch+numpy — so each test runs the
reference module in a subprocess with those imports stubbed, feeds it the
same ``data.npz``/``last.ckpt`` fixture our pipeline reads, and compares
outputs element-wise. This is the strongest parity evidence available
without the real PeRFception download: byte-identical inputs through both
pipelines.

Covered: preprocess (last.ckpt -> data.npz), PlenoxelScannetDataset
(the mIoU flagship: decode, void/dists, downsample, scene scales, label
remap, feature select), Co3DDatasetBase (classification decode).
"""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# injected before any reference import: stub the deps this env lacks
STUB_PRELUDE = r"""
import sys, types

def _configurable(*a, **k):
    if a and callable(a[0]) and len(a) == 1 and not k:
        return a[0]
    def deco(x):
        return x
    return deco

gin = types.ModuleType("gin")
gin.configurable = _configurable
sys.modules["gin"] = gin

ME = types.ModuleType("MinkowskiEngine")
ME.utils = types.SimpleNamespace(batched_coordinates=None)
ME.MinkowskiAvgPooling = None
ME.SparseTensor = None
ME.TensorField = None
sys.modules["MinkowskiEngine"] = ME

plyfile = types.ModuleType("plyfile")
plyfile.PlyData = None
sys.modules["plyfile"] = plyfile

# the reference's package __init__ applies an mpl style removed in newer
# matplotlib ("seaborn-colorblind"); cosmetic only — neutralize
import matplotlib
import matplotlib.style
matplotlib.style.use = lambda *a, **k: None
matplotlib.rcParams = dict(matplotlib.rcParams)  # accept any legacy key
import matplotlib.pyplot
matplotlib.pyplot.style.use = lambda *a, **k: None
"""


def _run_ref(code: str, cwd: str) -> None:
    env = dict(os.environ)
    env["PYTHONPATH"] = REF  # reference package root; axon site scrubbed
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c", STUB_PRELUDE + code],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"reference subprocess failed:\n{proc.stdout}\n{proc.stderr}"
    )


def _write_raw_ckpt(path, rng, n=500):
    """Raw Plenoxel last.ckpt in the PeRFception schema the reference's
    preprocess.py consumes (preprocess.py:33-48)."""
    reso = 256
    links = np.sort(
        rng.choice(reso ** 3, size=n, replace=False).astype(np.int64)
    )
    sh = rng.integers(0, 256, size=(n, 27)).astype(np.uint8)
    ckpt = {
        "state_dict": {
            "model.links_idx": torch.from_numpy(links),
            "model.density_data": torch.from_numpy(
                rng.normal(size=(n, 1)).astype(np.float32)
            ),
            "model.sh_data": torch.from_numpy(sh),
        },
        "model.sh_data_min": torch.tensor(-1.5, dtype=torch.float32),
        "model.sh_data_scale": torch.tensor(0.011, dtype=torch.float32),
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    torch.save(ckpt, path)


def test_preprocess_matches_reference(tmp_path, rng):
    """Our preprocess and the reference's preprocess.py produce equal
    data.npz from the same raw checkpoint."""
    ref_dir = tmp_path / "ref_ds"
    our_dir = tmp_path / "our_ds"
    for d in (ref_dir, our_dir):
        _write_raw_ckpt(
            str(d / "plenoxel_co3d_s1" / "last.ckpt"),
            np.random.default_rng(7),
        )

    _run_ref(
        f"""
import runpy, sys
sys.argv = ["preprocess.py", "--datadir", {str(ref_dir)!r},
            "--outdir", {str(ref_dir)!r}]
runpy.run_path({os.path.join(REF, "co3d_3d/scripts/preprocess.py")!r},
               run_name="__main__")
""",
        cwd=str(tmp_path),
    )

    from co3d_3d.scripts.preprocess import preprocess_scene

    assert preprocess_scene(str(our_dir / "plenoxel_co3d_s1"))

    ref = np.load(ref_dir / "plenoxel_co3d_s1" / "data.npz")
    ours = np.load(our_dir / "plenoxel_co3d_s1" / "data.npz")
    np.testing.assert_array_equal(ref["links"], ours["links"])
    np.testing.assert_array_equal(ref["density"], ours["density"])
    # reference stores the raw quantized sh + original min/scale; ours
    # re-quantizes the dequantized values — compare in dequantized space
    ref_sh = ref["sh"].astype(np.float32) * ref["sh_scale"] + ref["sh_min"]
    our_sh = ours["sh"].astype(np.float32) * ours["sh_scale"] + ours["sh_min"]
    q = float(ours["sh_scale"])  # our uint8 re-quantization step
    np.testing.assert_allclose(our_sh, ref_sh, atol=q / 2 + 1e-6)


def _scannet_tree(tmp_path, rng):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_cli_3d import write_scannet_tree

    return write_scannet_tree(tmp_path, rng)


DUMP_KEYS = ("coordinates", "features", "labels", "dists", "xyzs")


def test_scannet_dataset_matches_reference(tmp_path, rng):
    root = _scannet_tree(tmp_path, rng)
    out = str(tmp_path / "ref_item.npz")
    # ignore_thres=None: the reference's own ignore_thres>0 path raises
    # (scannet.py:577 indexes 1-D links with a [N,1] mask — its shipped
    # scannet_plenoxel_ignore.gin config cannot run as written); parity is
    # checked on the working path, our loader implements the evident intent.
    _run_ref(
        f"""
import numpy as np
from co3d_3d.src.data.scannet import PlenoxelScannetDataset
ds = PlenoxelScannetDataset(
    "train", {root!r}, downsample_stride=2, void_label=-333,
    ignore_thres=None, features=["dists", "density", "sh"],
)
item = ds[0]
np.savez({out!r}, **{{k: np.asarray(v) for k, v in item.items()
                      if k != "metadata"}})
""",
        cwd=str(tmp_path),
    )

    from nerf_downstream_tpu.data.scannet import PlenoxelScannetDataset

    ds = PlenoxelScannetDataset(
        "train", root, downsample_stride=2, void_label=-333,
        ignore_thres=None, features=["dists", "density", "sh"],
    )
    ours = ds[0]
    ref = np.load(out)
    for k in ("coordinates", "features", "labels", "dists"):
        np.testing.assert_allclose(
            np.asarray(ours[k], np.float32),
            np.asarray(ref[k], np.float32),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )


def test_co3d_dataset_matches_reference(tmp_path, rng):
    from nerf_downstream_tpu.data import plenoxel

    root = tmp_path / "co3d_root"
    names = []
    for i in range(2):
        inst = f"inst{i}"
        sc = plenoxel.make_synthetic_scene(np.random.default_rng(10 + i))
        plenoxel.save_npz(
            str(root / f"plenoxel_co3d_{inst}" / "data.npz"),
            sc["coords"], sc["density"], sc["sh"], sc["reso"],
        )
        names.append(inst)
    # the reference reads filelist/{phase}.txt relative to CWD (co3d.py:102)
    fdir = tmp_path / "filelist"
    os.makedirs(fdir, exist_ok=True)
    from nerf_downstream_tpu.data.co3d import CLASSES

    lines = [f"{CLASSES[i]} {n}" for i, n in enumerate(names)]
    for phase in ("train", "test"):
        (fdir / f"{phase}.txt").write_text("\n".join(lines) + "\n")

    out = str(tmp_path / "ref_item.npz")
    _run_ref(
        f"""
import numpy as np
from co3d_3d.src.data.co3d import Co3DDatasetBase
ds = Co3DDatasetBase("train", {str(root)!r},
                     features=["xyzs", "density", "sh"])
item = ds[0]
np.savez({out!r}, **{{k: np.asarray(v) for k, v in item.items()
                      if k != "metadata"}})
""",
        cwd=str(tmp_path),
    )

    from nerf_downstream_tpu.data.co3d import Co3DDatasetBase

    ds = Co3DDatasetBase(
        "train", str(root), features=["xyzs", "density", "sh"],
        filelist_dir=str(fdir),
    )
    ours = ds[0]
    ref = np.load(out)
    for k in ("coordinates", "features", "labels", "xyzs"):
        np.testing.assert_allclose(
            np.asarray(ours[k], np.float32),
            np.asarray(ref[k], np.float32),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )
