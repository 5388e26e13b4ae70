"""nerf_downstream_tpu: TPU-native framework for PeRFception downstream tasks.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of
POSTECH-CVLab/NeRF-Downstream: sparse-voxel 3D networks (MinkowskiNet family)
over Plenoxel radiance-field grids, and 2D CNN/ViT classifiers over rendered
frames — designed for TPU (static shapes, MXU-shaped matmuls, mesh sharding)
rather than translated from the reference's CUDA/MinkowskiEngine stack.

Subpackages
-----------
- ``config``:   gin-compatible configuration engine (``--ginc``/``--ginb``).
- ``sparse``:   fixed-capacity sparse voxel sets, coordinate hashing,
                sort/binary-search kernel maps (replaces MinkowskiEngine's
                CoordinateManager).
- ``ops``:      sparse convolution (gather-GEMM-scatter), masked norms,
                poolings, interpolation, PAConv — XLA reference paths plus
                Pallas TPU kernels.
- ``models``:   MinkowskiNet family (ResNet/Res16UNet/ResUNet/FCNN/PointNet/
                DGCNN), PAConv nets, 2D ResNet/ViT.
- ``data``:     Plenoxel decode, datasets, augmentations, fixed-capacity
                batching.
- ``train``:    optimizers/schedulers, task modules, metrics, trainer,
                loggers, checkpointing.
- ``parallel``: device-mesh setup and collectives for data/model parallelism.
"""

__version__ = "0.1.0"

DATA_FORMAT = None  # set from env like the reference's src/__init__.py:9-10
import os as _os

DATA_FORMAT = _os.environ.get("DATA_FORMAT", "npz")
DATA_NUM_WORKERS = int(_os.environ.get("DATA_NUM_WORKERS", "8"))
