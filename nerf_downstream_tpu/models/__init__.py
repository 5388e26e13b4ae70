"""Model registry.

The reference's registry resolves model classes from ``globals()`` with a
dead ``MODELS`` dict (src/models/__init__.py:15-20 — noted bug); here it is
an explicit table. ``get_model`` is gin-configurable with the same parameter
names (name, in_channel, out_channel, sparse) so all reference configs bind
unchanged.
"""

from __future__ import annotations

from nerf_downstream_tpu import config as cfg


@cfg.configurable("Res16UNet")
def res16unet_factory(
    out_channel: int = 20,
    PLANES=(32, 48, 64, 96, 96, 96, 64, 64),
    DILATIONS=(1, 1, 1, 1, 1, 1, 1, 1),
    LAYERS=(2, 2, 2, 2, 2, 2, 2, 2),
    BLOCK="BasicBlock",
    NORM_TYPE="BN",
    nonlinearity="MinkowskiReLU",
    bn_momentum: float = 0.1,
    sparse_mode=(0,) * 9,
    **kwargs,
):
    """gin surface of the reference Res16UNet ctor (res16unet.py:30-43):
    UPPERCASE hyperparameter names map onto the flax module fields."""
    from nerf_downstream_tpu.models.mink.res16unet import Res16UNet

    block = BLOCK if isinstance(BLOCK, str) else BLOCK.__name__
    return Res16UNet(
        out_channel=out_channel,
        planes=tuple(PLANES),
        dilations=tuple(DILATIONS),
        layers=tuple(LAYERS),
        block=block,
        norm_type=NORM_TYPE,
        nonlinearity=nonlinearity,
        bn_momentum=bn_momentum,
        sparse_mode=tuple(sparse_mode),
        **kwargs,
    )


def _build(name: str, in_channel: int, out_channel: int, sparse, kwargs):
    from nerf_downstream_tpu.models.mink import res16unet, resnet

    is_unet = name == "Res16UNet" or name in res16unet.VARIANTS
    if sparse is not None and any(sparse) and is_unet:
        # eval --sparsify: per-stage conv modes (reference eval.py:133-158)
        kwargs.setdefault("sparse_mode", tuple(sparse))
    if name in resnet._VARIANTS:
        return resnet.make_resnet(name, out_channel, **kwargs)
    if name == "Res16UNet":
        return res16unet_factory(out_channel=out_channel, **kwargs)
    if name in res16unet.VARIANTS:
        return res16unet.make_res16unet(name, out_channel, **kwargs)
    if name in ("EncodedRes16UNet", "EncodedRes16UNet2"):
        from nerf_downstream_tpu.models.mink.encoding import EncodedRes16UNet

        return EncodedRes16UNet(
            out_channel=out_channel,
            variant2=(name == "EncodedRes16UNet2"),
            **kwargs,
        )
    if name in ("MinkowskiFCNN", "MinkowskiSplatFCNN"):
        from nerf_downstream_tpu.models.mink import fcnn

        return fcnn.make_fcnn(name, in_channel, out_channel, **kwargs)
    if name in ("MinkowskiPointNet", "PointNet"):
        from nerf_downstream_tpu.models.mink import pointnet

        return pointnet.make_pointnet(name, in_channel, out_channel, **kwargs)
    if name in ("DGCNN_cls", "DGCNN_semseg", "DGCNN"):
        from nerf_downstream_tpu.models.mink import dgcnn

        return dgcnn.make_dgcnn(name, in_channel, out_channel, **kwargs)
    if name in ("ResUNet2", "ResUNetBN2", "ResUNetBN2B", "ResUNetBN2C",
                "ResUNetBN2D", "ResUNetBN2E", "ResUNetIN2", "ResUNetIN2B",
                "ResUNetIN2C", "ResUNetIN2D", "ResUNetIN2E",
                "ResUNet14", "ResUNet18", "ResUNet34"):
        from nerf_downstream_tpu.models.mink import resunet

        return resunet.make_resunet(name, in_channel, out_channel, **kwargs)
    if name in ("PAConvPointNet", "PAConvDGCNN"):
        from nerf_downstream_tpu.models import paconv

        return paconv.make_paconv(name, in_channel, out_channel, **kwargs)
    raise ValueError(f"unknown model {name!r}")


@cfg.configurable("get_model")
def get_model(
    name: str = "ResNet14",
    in_channel: int = 3,
    out_channel: int = 20,
    sparse=None,
    **kwargs,
):
    """Build a model by registry name (reference src/models/__init__.py:18-20).

    ``in_channel`` is accepted for config parity (JAX infers input width at
    init); ``sparse`` is the 9-slot per-stage sparse-conv mode list used by
    the pruning/eval path.
    """
    return _build(name, in_channel, out_channel, sparse, kwargs)
