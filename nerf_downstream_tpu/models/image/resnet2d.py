"""2D ResNet/ResNeXt/WideResNet family in flax (NHWC, bf16-friendly).

The reference pulls torchvision models via torch.hub with
``zero_init_residual=True`` (co3d_2d/src/model/models.py:8-34); here the
same architectures are native flax so the whole forward is one XLA program.
Variants match the torchvision registry names used by
co3d_2d/src/modules/classification.py:14-18.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class BasicBlock2D(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name, scale_init=nn.initializers.ones: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name=name,
            scale_init=scale_init, dtype=self.dtype,
            axis_name=self.bn_axis_name,
        )
        residual = x
        y = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        # zero-init the residual branch's last BN scale
        y = norm("bn2", scale_init=nn.initializers.zeros)(y)
        if residual.shape[-1] != self.planes or self.stride != 1:
            residual = nn.Conv(self.planes, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck2D(nn.Module):
    planes: int
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name, scale_init=nn.initializers.ones: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name=name,
            scale_init=scale_init, dtype=self.dtype,
            axis_name=self.bn_axis_name,
        )
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * self.expansion
        residual = x
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(width, (3, 3), (self.stride, self.stride), padding=1,
                    use_bias=False, feature_group_count=self.groups,
                    dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = norm("bn3", scale_init=nn.initializers.zeros)(y)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = nn.Conv(out_ch, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet2D(nn.Module):
    """Backbone returning pooled features [B, C]."""

    block: str = "basic"  # basic | bottleneck
    layers: Sequence[int] = (2, 2, 2, 2)
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32
    # SyncBatchNorm under shard_map data parallelism (reference
    # co3d_2d/train.py:93-103 sync_batchnorm=True): set to the mesh axis
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1",
                         axis_name=self.bn_axis_name)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        planes = (64, 128, 256, 512)
        for stage, (p, n) in enumerate(zip(planes, self.layers)):
            for i in range(n):
                stride = 2 if (stage > 0 and i == 0) else 1
                if self.block == "basic":
                    x = BasicBlock2D(
                        p, stride, dtype=self.dtype,
                        bn_axis_name=self.bn_axis_name,
                        name=f"layer{stage + 1}_{i}",
                    )(x, train)
                else:
                    x = Bottleneck2D(
                        p, stride, self.groups, self.base_width,
                        dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                        name=f"layer{stage + 1}_{i}",
                    )(x, train)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return x


RESNET_SPECS = {
    "resnet18": dict(block="basic", layers=(2, 2, 2, 2)),
    "resnet34": dict(block="basic", layers=(3, 4, 6, 3)),
    "resnet50": dict(block="bottleneck", layers=(3, 4, 6, 3)),
    "resnet101": dict(block="bottleneck", layers=(3, 4, 23, 3)),
    "resnet152": dict(block="bottleneck", layers=(3, 8, 36, 3)),
    "resnext50_32x4d": dict(
        block="bottleneck", layers=(3, 4, 6, 3), groups=32, base_width=4
    ),
    "resnext101_32x8d": dict(
        block="bottleneck", layers=(3, 4, 23, 3), groups=32, base_width=8
    ),
    "wide_resnet50_2": dict(
        block="bottleneck", layers=(3, 4, 6, 3), base_width=128
    ),
    "wide_resnet101_2": dict(
        block="bottleneck", layers=(3, 4, 23, 3), base_width=128
    ),
}
