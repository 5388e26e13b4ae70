"""2D model registry: ResNetBased / ViTBased / select_model
(reference co3d_2d/src/modules/classification.py:14-38,
co3d_2d/src/model/models.py:8-54)."""

from __future__ import annotations

import logging
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from nerf_downstream_tpu import config as cfg
from nerf_downstream_tpu.models.image.resnet2d import RESNET_SPECS, ResNet2D
from nerf_downstream_tpu.models.image.vit import VIT_SPECS, ViT

RESNET_LIST = list(RESNET_SPECS)
VIT_LIST = list(VIT_SPECS)


class _ResNetBased(nn.Module):
    """Backbone -> Dropout(0.2) -> Linear(51)."""

    model: str = "resnet18"
    dropout_rate: float = 0.2
    num_classes: int = 51
    pretrained: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None

    # weight-import metadata (models/image/torch_weights.py)
    pretrained_arch = property(lambda self: self.model)
    pretrained_submodule = "model"

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNet2D(
            **RESNET_SPECS[self.model], dtype=self.dtype,
            bn_axis_name=self.bn_axis_name, name="model",
        )(x, train)
        feats = nn.Dropout(self.dropout_rate, deterministic=not train)(feats)
        return nn.Dense(self.num_classes, name="fc")(feats)


@cfg.configurable("ResNetBased")
def ResNetBased(model: str = "resnet18", dropout_rate: float = 0.2,
                pretrained: bool = False, num_classes: int = 51,
                dtype=jnp.float32, bn_axis_name: str | None = None):
    # pretrained weights load from the local converted store at state
    # creation (LitModel.create_state -> torch_weights.apply_pretrained);
    # the reference's torch.hub download (models.py:17-22) has no place in a
    # zero-egress build.
    return _ResNetBased(
        model=model, dropout_rate=dropout_rate, num_classes=num_classes,
        pretrained=pretrained, dtype=dtype, bn_axis_name=bn_axis_name,
    )


@cfg.configurable("ViTBased")
def ViTBased(model: str = "vit_small_patch16_224", pretrained: bool = False,
             num_classes: int = 51, dtype=jnp.float32):
    return ViT(
        num_classes=num_classes, dtype=dtype, pretrained=pretrained,
        pretrained_arch=model, **VIT_SPECS[model],
    )


def select_model(model_name: str, bn_axis_name: str | None = None):
    if model_name is None:
        raise NameError("model_name is required")
    if model_name in RESNET_LIST:
        return ResNetBased(model_name, bn_axis_name=bn_axis_name)
    if model_name in VIT_LIST:
        # ViTs carry no BatchNorm — nothing to sync
        return ViTBased(model_name)
    raise NameError(f"Unknown model name : {model_name}")
