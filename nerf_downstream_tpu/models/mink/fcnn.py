"""MinkowskiFCNN / MinkowskiSplatFCNN classification networks
(reference co3d_3d/src/models/mink/fcnn.py:21-208).

MLP stem on the point field -> 4 conv+maxpool branches at strides
1/2/4/8 -> multi-scale slice-concat back onto the points -> conv5 stack ->
global max+avg pool -> MLP head. The splat variant replaces
``.sparse()``/``.slice()`` with trilinear ``splat()``/``interpolate()``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_downstream_tpu.models.mink.layers import (
    MaskedBatchNorm,
    SparseConv,
    SparsePool,
)
from nerf_downstream_tpu.ops.interpolate import interpolate, splat
from nerf_downstream_tpu.ops.pool import global_pool
from nerf_downstream_tpu.sparse import (
    field_to_sparse,
    unique_coords,
)
from nerf_downstream_tpu.sparse.context import CoordinateContext
from nerf_downstream_tpu.sparse.kernels import slice_field
from nerf_downstream_tpu.sparse.types import PointField, SparseVoxels


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.01)


class PointMLPBlock(nn.Module):
    """MinkowskiLinear + BN + LeakyReLU on a point field / sparse rows."""

    out_channels: int
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, feats, mask, train: bool):
        feats = nn.Dense(self.out_channels, use_bias=False)(feats)
        sv_like = SparseVoxels(
            coords=jnp.zeros((feats.shape[0], 4), jnp.int32),
            feats=feats, mask=mask, stride=1,
        )
        sv_like = MaskedBatchNorm(axis_name=self.bn_axis_name)(sv_like, train)
        return _leaky(sv_like.feats)


class MinkowskiFCNN(nn.Module):
    out_channel: int
    kernel_size: int = 3
    embedding_channel: int = 1024
    channels: Sequence[int] = (32, 48, 64, 96, 128)
    num_batches: int = 1
    bn_axis_name: str | None = None
    compute_dtype: Any = jnp.float32
    use_splat: bool = False

    def _conv_block(self, sv, ctx, train, out_ch, kernel, stride, name):
        sv = SparseConv(
            out_ch, kernel, stride, use_bias=True,
            compute_dtype=self.compute_dtype, name=f"{name}_conv",
        )(sv, ctx)
        sv = MaskedBatchNorm(
            axis_name=self.bn_axis_name, name=f"{name}_bn"
        )(sv, train)
        return sv.replace(feats=_leaky(sv.feats))

    @nn.compact
    def __call__(self, field: PointField, train: bool = False) -> jax.Array:
        ctx = CoordinateContext(num_batches=self.num_batches)
        ch = self.channels
        k = self.kernel_size

        feats = PointMLPBlock(
            ch[0], self.bn_axis_name, name="mlp1"
        )(field.feats, field.mask, train)
        field1 = PointField(coords=field.coords, feats=feats, mask=field.mask)

        if self.use_splat:
            # splat: points scatter onto their 8 corner voxels
            corners = jnp.floor(field1.coords[:, 1:]).astype(jnp.int32)
            coords = jnp.concatenate(
                [field1.coords[:, :1].astype(jnp.int32), corners], 1
            )
            uc, um, _ = unique_coords(coords, field1.mask)
            y = SparseVoxels(
                coords=uc, feats=splat(field1, uc, um, 1), mask=um, stride=1
            )
        else:
            y, _ = field_to_sparse(field1)

        y = self._conv_block(y, ctx, train, ch[1], k, 1, "conv1")
        y1 = SparsePool(3, 2, "max", name="pool1")(y, ctx)
        y = self._conv_block(y1, ctx, train, ch[2], k, 2, "conv2")
        y2 = SparsePool(3, 2, "max", name="pool2")(y, ctx)
        y = self._conv_block(y2, ctx, train, ch[3], k, 2, "conv3")
        y3 = SparsePool(3, 2, "max", name="pool3")(y, ctx)
        y = self._conv_block(y3, ctx, train, ch[4], k, 2, "conv4")
        y4 = SparsePool(3, 2, "max", name="pool4")(y, ctx)

        if self.use_splat:
            xs = [
                interpolate(t.coords, t.mask, t.feats, t.stride, field1)
                for t in (y1, y2, y3, y4)
            ]
        else:
            xs = [slice_field(t, field1).feats for t in (y1, y2, y3, y4)]
        cat_field = PointField(
            coords=field1.coords,
            feats=jnp.concatenate(xs, axis=1),
            mask=field1.mask,
        )
        y, _ = field_to_sparse(cat_field)
        e = self.embedding_channel
        y = self._conv_block(y, ctx, train, e // 4, 3, 2, "conv5a")
        y = self._conv_block(y, ctx, train, e // 2, 3, 2, "conv5b")
        y = self._conv_block(y, ctx, train, e, 3, 2, "conv5c")

        bid = y.batch_ids(self.num_batches)
        gmax = global_pool(y.masked_feats(), bid, self.num_batches, "max")
        gavg = global_pool(y.masked_feats(), bid, self.num_batches, "avg")
        x = jnp.concatenate([gmax, gavg], axis=1)

        x = nn.Dense(512, use_bias=False, name="head1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="head1_bn"
        )(x)
        x = _leaky(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(512, use_bias=False, name="head2")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="head2_bn"
        )(x)
        x = _leaky(x)
        return nn.Dense(self.out_channel, use_bias=True, name="final")(x)


def make_fcnn(name: str, in_channel: int, out_channel: int, **kwargs):
    return MinkowskiFCNN(
        out_channel=out_channel,
        use_splat=(name == "MinkowskiSplatFCNN"),
        **kwargs,
    )
