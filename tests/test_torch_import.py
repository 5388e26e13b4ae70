"""Reference-checkpoint import: synthetic ME/Lightning state dicts map onto
every conv/norm leaf of the flax trees."""

import re

import jax
import numpy as np
import pytest

from nerf_downstream_tpu.models import get_model
from nerf_downstream_tpu.train.torch_import import (
    import_res16unet,
    import_resnet,
    merge_into,
)
from tests.test_models_mink import make_field


def _synthetic_unet_sd(planes=4, in_ch=3, out_ch=5):
    """Reference-style state dict for Res16UNet14 with tiny planes."""
    rng = np.random.default_rng(1)
    p = planes
    sd = {}

    def conv(name, k, ci, co):
        sd[f"model.{name}.kernel"] = (
            rng.normal(size=(ci, co)).astype(np.float32)
            if k == 1
            else rng.normal(size=(k**3, ci, co)).astype(np.float32)
        )

    def bn(name, c):
        sd[f"model.{name}.bn.weight"] = rng.normal(size=c).astype(np.float32)
        sd[f"model.{name}.bn.bias"] = rng.normal(size=c).astype(np.float32)
        sd[f"model.{name}.bn.running_mean"] = rng.normal(size=c).astype(
            np.float32
        )
        sd[f"model.{name}.bn.running_var"] = np.abs(
            rng.normal(size=c)
        ).astype(np.float32)

    conv("conv0p1s1.0", 3, in_ch, p); bn("conv0p1s1.1", p)
    conv("conv0p1s1.3", 3, p, p); bn("conv0p1s1.4", p)
    for i, name in enumerate(
        ["conv1p1s2", "conv2p2s2", "conv3p4s2", "conv4p8s2"]
    ):
        conv(f"{name}.0", 2, p, p); bn(f"{name}.1", p)
    # blocks 1-4: in == planes -> no downsample; blocks 5-8: concat input
    for b in range(1, 5):
        conv(f"block{b}.0.conv1", 3, p, p); bn(f"block{b}.0.norm1", p)
        conv(f"block{b}.0.conv2", 3, p, p); bn(f"block{b}.0.norm2", p)
    for b, tr in zip(range(5, 9), ["convtr4p16s2", "convtr5p8s2",
                                   "convtr6p4s2", "convtr7p2s2"]):
        conv(f"{tr}.0", 2, p, p); bn(f"{tr}.1", p)
        cin = 2 * p  # skip concat
        conv(f"block{b}.0.conv1", 3, cin, p); bn(f"block{b}.0.norm1", p)
        conv(f"block{b}.0.conv2", 3, p, p); bn(f"block{b}.0.norm2", p)
        conv(f"block{b}.0.downsample.0", 1, cin, p)
        bn(f"block{b}.0.downsample.1", p)
    conv("final", 1, p, out_ch)
    sd["model.final.bias"] = rng.normal(size=out_ch).astype(np.float32)
    return sd


def test_import_res16unet_full_coverage(rng):
    sd = _synthetic_unet_sd()
    ip, istats = import_res16unet(sd)

    field = make_field(rng, n_valid=80, capacity=96, c=3)
    model = get_model(name="Res16UNet14", out_channel=5, num_batches=2,
                      planes=(4,) * 8)
    v = model.init(jax.random.PRNGKey(0), field, train=False)
    params, stats = merge_into(v["params"], v["batch_stats"], ip, istats)

    # spot-check value placement
    np.testing.assert_array_equal(
        np.asarray(params["conv0a_conv"]["kernel"]),
        sd["model.conv0p1s1.0.kernel"],
    )
    np.testing.assert_array_equal(
        np.asarray(params["MaskedBatchNorm_0"]["scale"]),
        sd["model.conv0p1s1.1.bn.weight"],
    )
    np.testing.assert_array_equal(
        np.asarray(params["block5_0"]["downsample_conv"]["kernel"])[0],
        sd["model.block5.0.downsample.0.kernel"],
    )
    np.testing.assert_array_equal(
        np.asarray(stats["block8_0"]["MaskedBatchNorm_1"]["var"]),
        sd["model.block8.0.norm2.bn.running_var"],
    )
    np.testing.assert_array_equal(
        np.asarray(params["final"]["kernel"])[0], sd["model.final.kernel"]
    )

    # every imported leaf must actually have landed (non-default values):
    # the forward must run with the merged trees
    out = model.apply(
        {"params": params, "batch_stats": stats}, field, train=False
    )
    assert np.isfinite(np.asarray(out)).all()


def test_import_resnet(rng):
    rng2 = np.random.default_rng(2)
    sd = {
        "model.conv1.kernel": rng2.normal(size=(27, 3, 8)).astype(np.float32),
        "model.bn1.bn.weight": np.ones(8, np.float32),
        "model.bn1.bn.bias": np.zeros(8, np.float32),
        "model.bn1.bn.running_mean": np.zeros(8, np.float32),
        "model.bn1.bn.running_var": np.ones(8, np.float32),
        "model.final.kernel": rng2.normal(size=(8, 4)).astype(np.float32),
        "model.final.bias": np.zeros(4, np.float32),
    }
    # one basic block per stage, planes equal -> only layer1 mapping checked
    for li, cin in zip(range(1, 5), [8, 8, 8, 8]):
        sd[f"model.layer{li}.0.conv1.kernel"] = rng2.normal(
            size=(27, cin, 8)
        ).astype(np.float32)
        sd[f"model.layer{li}.0.conv2.kernel"] = rng2.normal(
            size=(27, 8, 8)
        ).astype(np.float32)
        for nm in ["norm1", "norm2"]:
            for f, sz in [("weight", 8), ("bias", 8), ("running_mean", 8),
                          ("running_var", 8)]:
                sd[f"model.layer{li}.0.{nm}.bn.{f}"] = np.ones(
                    sz, np.float32
                )
        sd[f"model.layer{li}.0.downsample.0.kernel"] = rng2.normal(
            size=(cin, 8)
        ).astype(np.float32)
        for f in ["weight", "bias", "running_mean", "running_var"]:
            sd[f"model.layer{li}.0.downsample.1.bn.{f}"] = np.ones(
                8, np.float32
            )

    ip, istats = import_resnet(sd)
    assert "conv1" in ip and "layer1_block0" in ip
    np.testing.assert_array_equal(
        ip["layer1_block0"]["downsample_conv"]["kernel"][0],
        sd["model.layer1.0.downsample.0.kernel"],
    )
    assert "MaskedBatchNorm_2" in ip["layer1_block0"]  # BasicBlock ds norm
