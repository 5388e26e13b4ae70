"""Residual blocks over SparseVoxels (reference
co3d_3d/src/models/mink/modules/resnet_block.py:11-156)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from nerf_downstream_tpu.models.mink.layers import (
    SparseConv,
    as_rows,
    get_nonlinearity,
    make_norm,
)
from nerf_downstream_tpu.ops.block_resident import BlockVoxels


def _aligned(out, residual):
    """Residual adds need both branches in the same representation: a
    stride-2 main branch (k3/s2 -> row fallback) can meet a block-resident
    shortcut (k1/s2 stays in-block) — materialize both to rows then."""
    if isinstance(out, BlockVoxels) != isinstance(residual, BlockVoxels):
        return as_rows(out), as_rows(residual)
    return out, residual
from nerf_downstream_tpu.sparse.context import CoordinateContext
from nerf_downstream_tpu.sparse.types import SparseVoxels


class BasicBlock(nn.Module):
    """conv3-norm-act-conv3-norm (+skip) — expansion 1."""

    planes: int
    stride: int = 1
    dilation: int = 1
    norm_type: str = "BN"
    nonlinearity: str = "MinkowskiReLU"
    bn_momentum: float = 0.1
    num_batches: int = 1
    bn_axis_name: str | None = None
    compute_dtype: Any = jnp.float32
    conv_mode: int = 0

    expansion = 1

    @nn.compact
    def __call__(
        self, sv: SparseVoxels, ctx: CoordinateContext, train: bool
    ) -> SparseVoxels:
        non = get_nonlinearity(self.nonlinearity)
        inplanes = sv.num_channels

        def norm(name):
            return make_norm(
                self.norm_type,
                bn_momentum=self.bn_momentum,
                num_batches=self.num_batches,
                axis_name=self.bn_axis_name,
            )

        out = SparseConv(
            self.planes, 3, self.stride, self.dilation,
            compute_dtype=self.compute_dtype, conv_mode=self.conv_mode,
            name="conv1",
        )(sv, ctx)
        out = norm("norm1")(out, train)
        out = non(out)
        out = SparseConv(
            self.planes, 3, 1, self.dilation,
            compute_dtype=self.compute_dtype, conv_mode=self.conv_mode,
            name="conv2",
        )(out, ctx)
        out = norm("norm2")(out, train)

        if self.stride != 1 or inplanes != self.planes * self.expansion:
            residual = SparseConv(
                self.planes * self.expansion, 1, self.stride,
                compute_dtype=self.compute_dtype, name="downsample_conv",
            )(sv, ctx)
            residual = norm("downsample_norm")(residual, train)
        else:
            residual = sv

        out, residual = _aligned(out, residual)
        out = out.replace(feats=out.feats + residual.feats)
        return non(out)


class Bottleneck(nn.Module):
    """1-3-1 bottleneck, expansion 4."""

    planes: int
    stride: int = 1
    dilation: int = 1
    norm_type: str = "BN"
    nonlinearity: str = "MinkowskiReLU"
    bn_momentum: float = 0.1
    num_batches: int = 1
    bn_axis_name: str | None = None
    compute_dtype: Any = jnp.float32
    conv_mode: int = 0

    expansion = 4

    @nn.compact
    def __call__(
        self, sv: SparseVoxels, ctx: CoordinateContext, train: bool
    ) -> SparseVoxels:
        non = get_nonlinearity(self.nonlinearity)
        inplanes = sv.num_channels

        def norm():
            return make_norm(
                self.norm_type,
                bn_momentum=self.bn_momentum,
                num_batches=self.num_batches,
                axis_name=self.bn_axis_name,
            )

        out = SparseConv(
            self.planes, 1, 1, compute_dtype=self.compute_dtype, name="conv1"
        )(sv, ctx)
        out = norm()(out, train)
        out = non(out)
        out = SparseConv(
            self.planes, 3, self.stride, self.dilation,
            compute_dtype=self.compute_dtype, conv_mode=self.conv_mode,
            name="conv2",
        )(out, ctx)
        out = norm()(out, train)
        out = non(out)
        out = SparseConv(
            self.planes * self.expansion, 1, 1,
            compute_dtype=self.compute_dtype, name="conv3",
        )(out, ctx)
        out = norm()(out, train)

        if self.stride != 1 or inplanes != self.planes * self.expansion:
            residual = SparseConv(
                self.planes * self.expansion, 1, self.stride,
                compute_dtype=self.compute_dtype, name="downsample_conv",
            )(sv, ctx)
            residual = norm()(residual, train)
        else:
            residual = sv

        out, residual = _aligned(out, residual)
        out = out.replace(feats=out.feats + residual.feats)
        return non(out)


BLOCKS = {"BasicBlock": BasicBlock, "Bottleneck": Bottleneck}
