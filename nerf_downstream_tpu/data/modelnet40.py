"""ModelNet40 HDF5 classification dataset (reference
co3d_3d/src/data/modelnet40.py:28-110): 2048-point clouds from
``ply_data_{phase}*.h5`` files, optional transform pipeline, voxel_size
scaling. Download is gated (zero-egress images skip it)."""

from __future__ import annotations

import glob
import logging
import os

import numpy as np

from nerf_downstream_tpu import config as cfg
from nerf_downstream_tpu.data import transforms as T


@cfg.configurable
class ModelNet40H5Dataset:
    def __init__(
        self,
        phase: str,
        data_root: str = "modelnet40h5",
        train_transformations=("CoordinateUniformTranslation",),
        eval_transformations=(),
        num_points: int = 2048,
        voxel_size: float = 0.05,
        download: bool = False,
    ):
        phase = "test" if phase in ("val", "test") else "train"
        if download and not os.path.exists(data_root):
            logging.warning(
                "ModelNet40 download requested but this build has no network "
                "egress; place ply_data_*.h5 under %s", data_root,
            )
        self.data, self.label = self._load(data_root, phase)
        names = train_transformations if phase == "train" else eval_transformations
        self.transformations = T.build(names, device_ok=(phase == "train"))
        self.phase = phase
        self.voxel_size = voxel_size
        self.num_points = num_points

    @staticmethod
    def _load(data_root: str, phase: str):
        import h5py

        assert os.path.exists(data_root), f"{data_root} does not exist"
        files = sorted(glob.glob(os.path.join(data_root, f"ply_data_{phase}*.h5")))
        assert files, f"no ply_data_{phase}*.h5 under {data_root}"
        data, labels = [], []
        for name in files:
            with h5py.File(name, "r") as f:
                data.append(f["data"][:].astype(np.float32))
                labels.append(f["label"][:].astype(np.int64))
        return np.concatenate(data, 0), np.concatenate(labels, 0)

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, i: int) -> dict:
        xyz = self.data[i]
        if len(xyz) > self.num_points > 0:
            xyz = xyz[: self.num_points]
        if self.transformations is not None:
            xyz, _, _ = self.transformations(xyz, None, None)
        xyz = xyz.astype(np.float32)
        return {
            "coordinates": xyz / self.voxel_size,
            "features": xyz,
            "labels": np.asarray(self.label[i]).reshape(-1).astype(np.int32),
        }


# alias
ModelNet40H5 = ModelNet40H5Dataset
