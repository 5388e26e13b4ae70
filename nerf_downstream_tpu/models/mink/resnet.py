"""Sparse ResNet classifier family (reference
co3d_3d/src/models/mink/resnet.py:25-202).

Structure parity: conv3 stem -> BN -> ReLU -> SumPool(2) -> 4 residual
stages (first block stride 2) -> GlobalAvgPool -> linear head. Variants
ResNet14/18/34 (BasicBlock) and 50/101 (Bottleneck) share the reference's
LAYERS/PLANES constants.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_downstream_tpu.models.mink.blocks import BLOCKS
from nerf_downstream_tpu.models.mink.layers import (
    GlobalPool,
    MaskedBatchNorm,
    SparseConv,
    SparsePool,
    get_nonlinearity,
    make_norm,
)
from nerf_downstream_tpu.sparse import field_to_sparse
from nerf_downstream_tpu.sparse.context import CoordinateContext
from nerf_downstream_tpu.sparse.types import PointField, SparseVoxels


class MinkResNetBase(nn.Module):
    out_channel: int
    block: str = "BasicBlock"
    layers: Sequence[int] = (1, 1, 1, 1)
    planes: Sequence[int] = (64, 128, 256, 512)
    init_dim: int = 64
    norm_type: str = "BN"
    nonlinearity: str = "MinkowskiReLU"
    bn_momentum: float = 0.1
    num_batches: int = 1
    bn_axis_name: str | None = None
    compute_dtype: Any = jnp.float32

    def _stage(self, sv, ctx, train, planes, blocks, stage_idx):
        block_cls = BLOCKS[self.block]
        sv = block_cls(
            planes=planes,
            stride=2,
            norm_type=self.norm_type,
            nonlinearity=self.nonlinearity,
            bn_momentum=self.bn_momentum,
            num_batches=self.num_batches,
            bn_axis_name=self.bn_axis_name,
            compute_dtype=self.compute_dtype,
            name=f"layer{stage_idx}_block0",
        )(sv, ctx, train)
        for i in range(1, blocks):
            sv = block_cls(
                planes=planes,
                stride=1,
                norm_type=self.norm_type,
                nonlinearity=self.nonlinearity,
                bn_momentum=self.bn_momentum,
                num_batches=self.num_batches,
                bn_axis_name=self.bn_axis_name,
                compute_dtype=self.compute_dtype,
                name=f"layer{stage_idx}_block{i}",
            )(sv, ctx, train)
        return sv

    @nn.compact
    def __call__(self, field: PointField, train: bool = False) -> jax.Array:
        ctx = CoordinateContext(num_batches=self.num_batches)
        sv, _ = field_to_sparse(field)
        non = get_nonlinearity(self.nonlinearity)

        sv = SparseConv(
            self.init_dim, 3, 1, compute_dtype=self.compute_dtype, name="conv1"
        )(sv, ctx)
        sv = make_norm(
            self.norm_type,
            bn_momentum=self.bn_momentum,
            num_batches=self.num_batches,
            axis_name=self.bn_axis_name,
        )(sv, train)
        sv = non(sv)
        sv = SparsePool(2, 2, "sum", name="pool")(sv, ctx)

        for i, (p, l) in enumerate(zip(self.planes, self.layers), start=1):
            sv = self._stage(sv, ctx, train, p, l, i)

        pooled = GlobalPool(mode="avg", num_batches=self.num_batches)(sv)
        logits = nn.Dense(self.out_channel, use_bias=True, name="final")(
            pooled
        )
        return logits


_VARIANTS = {
    "ResNet14": ("BasicBlock", (1, 1, 1, 1)),
    "ResNet18": ("BasicBlock", (2, 2, 2, 2)),
    "ResNet34": ("BasicBlock", (3, 4, 6, 3)),
    "ResNet50": ("Bottleneck", (3, 4, 6, 3)),
    "ResNet101": ("Bottleneck", (3, 4, 23, 3)),
}


def make_resnet(name: str, out_channel: int, **kwargs) -> MinkResNetBase:
    block, layers = _VARIANTS[name]
    return MinkResNetBase(
        out_channel=out_channel, block=block, layers=layers, **kwargs
    )
