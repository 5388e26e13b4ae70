"""Stanford/S3DIS indoor segmentation (reference
co3d_3d/src/data/stanford.py:62-164): ScannetDataset subclass with 13-class
tables and its own split files."""

from __future__ import annotations

from nerf_downstream_tpu import config as cfg
from nerf_downstream_tpu.data.scannet import ScannetDataset, build_label_map

CLASS_LABELS = (
    "clutter", "beam", "board", "bookcase", "ceiling", "chair", "column",
    "door", "floor", "sofa", "table", "wall", "window",
)
VALID_CLASS_IDS = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 12, 13)


@cfg.configurable
class StanfordDataset(ScannetDataset):
    NUM_LABELS = 14
    DATA_PATH_FILE = {
        "train": "stanford_train.txt",
        "val": "stanford_val.txt",
        "test": "stanford_test.txt",
    }
    CLASS_LABELS = CLASS_LABELS
    VALID_CLASS_IDS = VALID_CLASS_IDS
