"""Res16UNet sparse U-Net family — the segmentation workhorse (reference
co3d_3d/src/models/mink/res16unet.py:25-795).

Encoder: 2-conv stem (stride 1) then 4x [stride-2 conv -> residual stage];
decoder: 4x [transpose conv -> skip concat -> residual stage]; 1x1 head;
slice back to the point field. The coordinate pyramid is carried explicitly
and transpose convs target the cached encoder levels (the TPU-native
equivalent of ME's coordinate-manager reuse).

Variants: Res16UNet{14,18,34,50,101}{,A,B,C,D,...} share the reference's
LAYERS/PLANES tables; default PLANES=(32,48,64,96,96,96,64,64),
LAYERS=(2,)*8 (res16unet.py:34-36).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_downstream_tpu.models.mink.blocks import BLOCKS
from nerf_downstream_tpu.models.mink.layers import (
    SparseConv,
    SparseConvTranspose,
    as_rows,
    cat,
    get_nonlinearity,
    make_norm,
)
from nerf_downstream_tpu.sparse import field_to_sparse, sparse_to_field
from nerf_downstream_tpu.sparse.context import CoordinateContext
from nerf_downstream_tpu.sparse.types import PointField


class Res16UNet(nn.Module):
    out_channel: int
    planes: Sequence[int] = (32, 48, 64, 96, 96, 96, 64, 64)
    layers: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1, 1, 1, 1, 1)
    block: str = "BasicBlock"
    norm_type: str = "BN"
    nonlinearity: str = "MinkowskiReLU"
    bn_momentum: float = 0.1
    num_batches: int = 1
    bn_axis_name: str | None = None
    compute_dtype: Any = jnp.float32
    insseg: bool = False
    # per-stage conv-impl selector (reference sparse_mode 9-slot list,
    # res16unet.py:42; SparseConvMode: 0 dense, 1 sparse(valid-offset
    # subset from pruned weights), 2 zaxis, 3 native(=dense here), 4 skip)
    sparse_mode: Sequence[int] = (0,) * 9

    def _norm(self):
        return make_norm(
            self.norm_type,
            bn_momentum=self.bn_momentum,
            num_batches=self.num_batches,
            axis_name=self.bn_axis_name,
        )

    def _conv_mode(self, slot: int) -> int:
        m = self.sparse_mode[slot] if slot < len(self.sparse_mode) else 0
        # SPARSE(1) convs consult the per-layer pruned-offset map
        # (ctx.valid_offsets_map, eval --sparsify); NATIVE(3) has no
        # separate impl on TPU (dense masked == optimal for unstructured
        # sparsity); SKIP(4) not applicable to residual stages
        return m if m in (1, 2) else 0

    def _stage(self, sv, ctx, train, idx):
        block_cls = BLOCKS[self.block]
        planes = self.planes[idx]
        for i in range(self.layers[idx]):
            sv = block_cls(
                planes=planes,
                stride=1,
                dilation=self.dilations[idx],
                norm_type=self.norm_type,
                nonlinearity=self.nonlinearity,
                bn_momentum=self.bn_momentum,
                num_batches=self.num_batches,
                bn_axis_name=self.bn_axis_name,
                compute_dtype=self.compute_dtype,
                conv_mode=self._conv_mode(idx + 1),
                name=f"block{idx + 1}_{i}",
            )(sv, ctx, train)
        return sv

    def _conv_norm_non(self, sv, ctx, train, ch, *, kernel, stride, name,
                       input_grad=True):
        non = get_nonlinearity(self.nonlinearity)
        sv = SparseConv(
            ch, kernel, stride, compute_dtype=self.compute_dtype,
            conv_mode=self._conv_mode(0), name=f"{name}_conv",
            input_grad=input_grad,
        )(sv, ctx)
        sv = self._norm()(sv, train)
        return non(sv)

    def _convtr_norm_non(self, sv, ctx, train, target, ch, *, name):
        non = get_nonlinearity(self.nonlinearity)
        sv = SparseConvTranspose(
            ch, 2, 2, compute_dtype=self.compute_dtype, name=f"{name}_conv"
        )(sv, ctx, target)
        sv = self._norm()(sv, train)
        return non(sv)

    @nn.compact
    def __call__(self, field: PointField, train: bool = False):
        ctx = CoordinateContext(num_batches=self.num_batches)
        sv, p2v = field_to_sparse(field)
        p = self.planes

        # stem (stride 1): two conv3-norm-act
        # conv0a consumes the raw input field: no gradient flows into the
        # data, so its backward is d_w-only (layers.SparseConv.input_grad)
        out = self._conv_norm_non(
            sv, ctx, train, p[0], kernel=3, stride=1, name="conv0a",
            input_grad=False,
        )
        out_p1 = self._conv_norm_non(out, ctx, train, p[0], kernel=3, stride=1, name="conv0b")

        # encoder
        out = self._conv_norm_non(out_p1, ctx, train, p[0], kernel=2, stride=2, name="conv1")
        out_b1p2 = self._stage(out, ctx, train, 0)
        out = self._conv_norm_non(out_b1p2, ctx, train, out_b1p2.num_channels, kernel=2, stride=2, name="conv2")
        out_b2p4 = self._stage(out, ctx, train, 1)
        out = self._conv_norm_non(out_b2p4, ctx, train, out_b2p4.num_channels, kernel=2, stride=2, name="conv3")
        out_b3p8 = self._stage(out, ctx, train, 2)
        out = self._conv_norm_non(out_b3p8, ctx, train, out_b3p8.num_channels, kernel=2, stride=2, name="conv4")
        out = self._stage(out, ctx, train, 3)

        # decoder: convtr -> concat skip -> stage
        out = self._convtr_norm_non(out, ctx, train, out_b3p8, p[4], name="convtr4")
        out = cat(out, out_b3p8)
        out = self._stage(out, ctx, train, 4)

        out = self._convtr_norm_non(out, ctx, train, out_b2p4, p[5], name="convtr5")
        out = cat(out, out_b2p4)
        out = self._stage(out, ctx, train, 5)

        out = self._convtr_norm_non(out, ctx, train, out_b1p2, p[6], name="convtr6")
        out = cat(out, out_b1p2)
        out = self._stage(out, ctx, train, 6)

        out = self._convtr_norm_non(out, ctx, train, out_p1, p[7], name="convtr7")
        out = cat(out, out_p1)
        out = self._stage(out, ctx, train, 7)

        logits_sv = as_rows(SparseConv(
            self.out_channel, 1, 1, use_bias=True,
            compute_dtype=self.compute_dtype, name="final",
        )(out, ctx))

        if self.insseg:
            off = SparseConv(
                out.num_channels, 1, 1, use_bias=True,
                compute_dtype=self.compute_dtype, name="offset_conv1",
            )(out, ctx)
            off = self._norm()(off, train)
            off = get_nonlinearity(self.nonlinearity)(off)
            off = as_rows(SparseConv(
                3, 1, 1, use_bias=True, compute_dtype=self.compute_dtype,
                name="offset_conv2",
            )(off, ctx))
            off_field = sparse_to_field(off, field, p2v)
            logits_field = sparse_to_field(logits_sv, field, p2v)
            return off_field.feats, logits_field.feats

        logits_field = sparse_to_field(logits_sv, field, p2v)
        return logits_field.feats


# Variant tables (reference res16unet.py:438-601)
_BASE = {
    "Res16UNet14": ("BasicBlock", (1,) * 8),
    "Res16UNet18": ("BasicBlock", (2,) * 8),
    "Res16UNet34": ("BasicBlock", (2, 3, 4, 6, 2, 2, 2, 2)),
    "Res16UNet50": ("Bottleneck", (2, 3, 4, 6, 2, 2, 2, 2)),
    "Res16UNet101": ("Bottleneck", (2, 3, 4, 23, 2, 2, 2, 2)),
}

_PLANES = {
    "A": (32, 64, 128, 256, 128, 128, 96, 96),
    "B": (32, 64, 128, 256, 128, 128, 128, 128),
    "C": (32, 64, 128, 256, 192, 192, 128, 128),
    "D": (32, 64, 128, 256, 384, 384, 384, 384),
}
# C-variant differs between 18 and others (reference :125-126 vs :141-142)
_PLANES_18C = (32, 64, 128, 256, 256, 128, 96, 96)
_PLANES_34A = (32, 64, 128, 256, 256, 128, 64, 64)
_PLANES_34B = (32, 64, 128, 256, 256, 128, 64, 32)
_PLANES_34C = (32, 64, 128, 256, 256, 128, 96, 96)

_LAYER_OVERRIDES = {
    "Res16UNet14A2": (1, 1, 1, 1, 2, 2, 2, 2),
    "Res16UNet14B2": (1, 1, 1, 1, 2, 2, 2, 2),
    "Res16UNet14B3": (2, 2, 2, 2, 1, 1, 1, 1),
}


def _variant_table():
    table = {}
    for base, (block, layers) in _BASE.items():
        table[base] = dict(block=block, layers=layers)
        for suffix, planes in _PLANES.items():
            table[base + suffix] = dict(block=block, layers=layers, planes=planes)
    table["Res16UNet18C"] = dict(
        block="BasicBlock", layers=(2,) * 8, planes=_PLANES_18C
    )
    table["Res16UNet34A"] = dict(
        block="BasicBlock", layers=_BASE["Res16UNet34"][1], planes=_PLANES_34A
    )
    table["Res16UNet34B"] = dict(
        block="BasicBlock", layers=_BASE["Res16UNet34"][1], planes=_PLANES_34B
    )
    table["Res16UNet34C"] = dict(
        block="BasicBlock", layers=_BASE["Res16UNet34"][1], planes=_PLANES_34C
    )
    for name in ["Res16UNet14A2", "Res16UNet14B2", "Res16UNet14B3"]:
        base = table[name[:-1]]
        table[name] = dict(base, layers=_LAYER_OVERRIDES[name])
    # instance-seg variants (reference :145-160)
    for name in ["Res16UNet14A", "Res16UNet14B", "Res16UNet18A", "Res16UNet18B"]:
        table[name + "Ins"] = dict(table[name], insseg=True)
    # common alias used by configs: MinkUNet-ish names
    table["MinkUNet14"] = table["Res16UNet14"]
    table["MinkUNet18"] = table["Res16UNet18"]
    table["MinkUNet34"] = table["Res16UNet34"]
    return table


VARIANTS = _variant_table()


def make_res16unet(name: str, out_channel: int, **kwargs) -> Res16UNet:
    spec = dict(VARIANTS[name])
    spec.update(kwargs)
    return Res16UNet(out_channel=out_channel, **spec)
