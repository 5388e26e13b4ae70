"""PeRFception-ScanNet + raw ScanNet datasets (full loaders land with the
data-pipeline milestone; class tables live here).

Reference: co3d_3d/src/data/scannet.py — 20-class remap tables (:21-146),
PlenoxelScannetDataset (:449-660).
"""

# The 20 evaluated ScanNet benchmark classes (reference scannet.py CLASS_LABELS)
CLASS_LABELS = (
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "shower curtain", "toilet", "sink", "bathtub",
    "otherfurniture",
)

# nyu40 ids of the evaluated classes, in label order (reference VALID_CLASS_IDS)
VALID_CLASS_IDS = (
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39,
)
