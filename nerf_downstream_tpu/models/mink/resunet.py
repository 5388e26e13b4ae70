"""ResUNet2 family: 4-level sparse UNet for registration / feature learning
(reference co3d_3d/src/models/mink/resunet.py:10-285).

Encoder: conv(k=conv1_kernel_size) + 3x stride-2 conv3, each followed by a
residual block; decoder: 3x transpose conv3 + skip concat; 1x1 head;
optional L2-normalized output features. BN/IN norm variants with the
reference CHANNELS/TR_CHANNELS tables.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_downstream_tpu.models.mink.blocks import BasicBlock
from nerf_downstream_tpu.models.mink.layers import (
    SparseConv,
    SparseConvTranspose,
    cat,
    make_norm,
)
from nerf_downstream_tpu.sparse import field_to_sparse
from nerf_downstream_tpu.sparse.context import CoordinateContext
from nerf_downstream_tpu.sparse.types import PointField


class ResUNet2(nn.Module):
    out_channel: int = 32
    channels: Sequence[int] = (32, 64, 128, 256)
    tr_channels: Sequence[int] = (32, 64, 64, 128)
    norm_type: str | None = None  # norm after top-level convs
    block_norm_type: str = "BN"
    bn_momentum: float = 0.1
    normalize_feature: bool = False
    conv1_kernel_size: int = 3
    num_batches: int = 1
    bn_axis_name: str | None = None
    compute_dtype: Any = jnp.float32

    def _norm(self, sv, train, name):
        if self.norm_type is None:
            return sv
        return make_norm(
            self.norm_type, bn_momentum=self.bn_momentum,
            num_batches=self.num_batches, axis_name=self.bn_axis_name,
        )(sv, train)

    def _block(self, sv, ctx, train, name):
        return BasicBlock(
            planes=sv.num_channels, stride=1,
            norm_type=self.block_norm_type, nonlinearity="MinkowskiReLU",
            bn_momentum=self.bn_momentum, num_batches=self.num_batches,
            bn_axis_name=self.bn_axis_name, compute_dtype=self.compute_dtype,
            name=name,
        )(sv, ctx, train)

    @nn.compact
    def __call__(self, field: PointField, train: bool = False):
        ctx = CoordinateContext(num_batches=self.num_batches)
        sv, p2v = field_to_sparse(field)
        ch, tr = self.channels, self.tr_channels
        relu = lambda t: t.replace(feats=jax.nn.relu(t.feats))

        levels = []
        out = sv
        for i in range(4):
            k = self.conv1_kernel_size if i == 0 else 3
            stride = 1 if i == 0 else 2
            out = SparseConv(
                ch[i], k, stride, compute_dtype=self.compute_dtype,
                name=f"conv{i + 1}",
            )(out, ctx)
            out = self._norm(out, train, f"norm{i + 1}")
            out = self._block(out, ctx, train, f"block{i + 1}")
            levels.append(out)
            out = relu(out)

        # decoder
        for i in range(3, 0, -1):
            target = levels[i - 1]
            out = SparseConvTranspose(
                tr[i], 3, 2, compute_dtype=self.compute_dtype,
                name=f"conv{i + 1}_tr",
            )(out, ctx, target)
            out = self._norm(out, train, f"norm{i + 1}_tr")
            out = self._block(out, ctx, train, f"block{i + 1}_tr")
            out = relu(out)
            out = cat(out, levels[i - 1])

        out = SparseConv(
            tr[0], 1, 1, compute_dtype=self.compute_dtype, name="conv1_tr"
        )(out, ctx)
        out = relu(out)
        out = SparseConv(
            self.out_channel, 1, 1, use_bias=True,
            compute_dtype=self.compute_dtype, name="final",
        )(out, ctx)
        from nerf_downstream_tpu.models.mink.layers import as_rows

        out = as_rows(out)
        feats = out.feats
        if self.normalize_feature:
            feats = feats / jnp.maximum(
                jnp.linalg.norm(feats, axis=1, keepdims=True), 1e-8
            )
        return out.replace(feats=feats)


_VARIANTS = {
    "ResUNet2": dict(norm_type=None),
    "ResUNetBN2": dict(norm_type="BN"),
    "ResUNetBN2B": dict(norm_type="BN", tr_channels=(64, 64, 64, 64)),
    "ResUNetBN2C": dict(norm_type="BN", tr_channels=(64, 64, 64, 128)),
    "ResUNetBN2D": dict(norm_type="BN", tr_channels=(64, 64, 128, 128)),
    "ResUNetBN2E": dict(
        norm_type="BN", channels=(128, 128, 128, 256),
        tr_channels=(64, 128, 128, 128),
    ),
}
for bn_name, spec in list(_VARIANTS.items()):
    if bn_name.startswith("ResUNetBN2") or bn_name == "ResUNet2":
        in_name = bn_name.replace("BN2", "IN2") if "BN2" in bn_name else "ResUNetIN2"
        _VARIANTS[in_name] = dict(spec, norm_type="BN", block_norm_type="IN")


def make_resunet(name: str, in_channel: int, out_channel: int, **kwargs):
    if name in ("ResUNet14", "ResUNet18", "ResUNet34"):
        # configs/resunet*.gin actually alias Res16UNet variants
        from nerf_downstream_tpu.models.mink.res16unet import make_res16unet

        alias = {
            "ResUNet14": "Res16UNet14A",
            "ResUNet18": "Res16UNet18A",
            "ResUNet34": "Res16UNet34C",
        }[name]
        return make_res16unet(alias, out_channel, **kwargs)
    spec = dict(_VARIANTS[name])
    spec.update(kwargs)
    return ResUNet2(out_channel=out_channel, **spec)
