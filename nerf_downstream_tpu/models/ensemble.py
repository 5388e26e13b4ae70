"""Fused 2D+3D ensemble classifier (BASELINE.json stretch config #5:
"joint image CNN + sparse-conv features, data-parallel").

A flax module holding a 2D image backbone and a 3D sparse-voxel classifier
over the same scene; logits fuse by learned convex combination (or feature
concat + head). Both branches are plain XLA programs, so the ensemble jits
into one step and data-parallelizes with the same shard_map machinery.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_downstream_tpu import config as cfg
from nerf_downstream_tpu.models.image.resnet2d import RESNET_SPECS, ResNet2D
from nerf_downstream_tpu.models.mink.resnet import MinkResNetBase, _VARIANTS
from nerf_downstream_tpu.sparse.types import PointField


class Ensemble2D3D(nn.Module):
    out_channel: int = 51
    image_model: str = "resnet18"
    voxel_model: str = "ResNet14"
    num_batches: int = 1
    fusion: str = "logit"  # "logit" (learned mix) | "feature" (concat+head)
    bn_axis_name: str | None = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, field: PointField, train: bool = False):
        img_feats = ResNet2D(
            **RESNET_SPECS[self.image_model], dtype=self.compute_dtype,
            name="image",
        )(images, train)

        block, layers = _VARIANTS[self.voxel_model]
        vox_logits = MinkResNetBase(
            out_channel=self.out_channel, block=block, layers=layers,
            num_batches=self.num_batches, bn_axis_name=self.bn_axis_name,
            compute_dtype=self.compute_dtype, name="voxel",
        )(field, train)

        if self.fusion == "feature":
            cat = jnp.concatenate(
                [img_feats, vox_logits.astype(img_feats.dtype)], axis=-1
            )
            return nn.Dense(self.out_channel, name="head")(cat)

        img_logits = nn.Dense(self.out_channel, name="image_head")(img_feats)
        alpha = self.param(
            "fusion_alpha", nn.initializers.zeros, ()
        )
        mix = jax.nn.sigmoid(alpha)
        return (1 - mix) * img_logits + mix * vox_logits


@cfg.configurable("Ensemble2D3D")
def make_ensemble(out_channel: int = 51, image_model: str = "resnet18",
                  voxel_model: str = "ResNet14", fusion: str = "logit",
                  **kwargs):
    return Ensemble2D3D(
        out_channel=out_channel, image_model=image_model,
        voxel_model=voxel_model, fusion=fusion, **kwargs,
    )
