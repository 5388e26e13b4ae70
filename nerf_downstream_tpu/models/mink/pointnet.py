"""MinkowskiPointNet + dense PointNet (reference
co3d_3d/src/models/mink/pointnet.py:25-109).

Per-point MLPs (linear+BN+ReLU) -> global max pool -> 512 head; variable
points per sample handled by the mask/segment machinery.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_downstream_tpu.models.mink.layers import MaskedBatchNorm
from nerf_downstream_tpu.ops.pool import global_pool
from nerf_downstream_tpu.sparse.types import PointField, SparseVoxels


class _PointBlock(nn.Module):
    out_channels: int
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, feats, mask, train: bool):
        feats = nn.Dense(self.out_channels, use_bias=False)(feats)
        sv = SparseVoxels(
            coords=jnp.zeros((feats.shape[0], 4), jnp.int32),
            feats=feats, mask=mask, stride=1,
        )
        sv = MaskedBatchNorm(axis_name=self.bn_axis_name)(sv, train)
        return jax.nn.relu(sv.feats)


class MinkowskiPointNet(nn.Module):
    out_channel: int
    embedding_channel: int = 1024
    num_batches: int = 1
    bn_axis_name: str | None = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, field: PointField, train: bool = False) -> jax.Array:
        f, m = field.feats, field.mask
        for i, ch in enumerate([64, 64, 64, 128, self.embedding_channel]):
            f = _PointBlock(ch, self.bn_axis_name, name=f"conv{i + 1}")(
                f, m, train
            )
        bid = jnp.where(
            m, field.coords[:, 0].astype(jnp.int32), self.num_batches
        )
        x = global_pool(
            jnp.where(m[:, None], f, 0), bid, self.num_batches, "max"
        )
        x = nn.Dense(512, use_bias=False, name="linear1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="linear1_bn"
        )(x)
        x = jax.nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.out_channel, use_bias=True, name="linear2")(x)


class PointNet(nn.Module):
    """Dense reference PointNet over [B, N, C] clouds (pointnet.py:25-53)."""

    out_channel: int
    embedding_channel: int = 1024

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        # x: [B, N, C]
        for i, ch in enumerate([64, 64, 64, 128, self.embedding_channel]):
            x = nn.Dense(ch, use_bias=False, name=f"conv{i + 1}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                name=f"bn{i + 1}", axis_name=None,
            )(x)
            x = jax.nn.relu(x)
        x = jnp.max(x, axis=1)
        x = nn.Dense(512, use_bias=False, name="linear1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="linear1_bn"
        )(x)
        x = jax.nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.out_channel, name="linear2")(x)


def make_pointnet(name: str, in_channel: int, out_channel: int, **kwargs):
    if name == "PointNet":
        kwargs.pop("num_batches", None)
        return PointNet(out_channel=out_channel, **kwargs)
    return MinkowskiPointNet(out_channel=out_channel, **kwargs)
