"""Import reference (MinkowskiEngine / Lightning) checkpoints.

Lets a user of the reference bring their trained weights over (SURVEY hard
part #6): maps the Lightning ``state_dict`` key space of
SegmentationTraining/ClassificationTraining checkpoints onto this repo's
flax param/batch_stats trees for the Res16UNet and ResNet families.

Layout compatibility notes:
- ME conv kernels are [K, Cin, Cout] with the RegionIterator's x-fastest
  offset order — identical to ours (sparse/kernels.py::kernel_offsets).
- ME stores kernel-volume-1 convs as 2D [Cin, Cout]; we keep [1, Cin, Cout].
- ME BatchNorm wraps torch BN as ``.bn``: weight->scale, bias->bias,
  running_mean/var->batch_stats.
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np


def load_torch_state_dict(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _strip(sd: Mapping[str, np.ndarray]) -> dict:
    """Drop the Lightning module prefix (``model.``)."""
    out = {}
    for k, v in sd.items():
        out[k[6:] if k.startswith("model.") else k] = np.asarray(v)
    return out


_BN_FIELDS = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}

# reference sequential name -> (our conv name, our top-level BN index)
_UNET_STEM = {
    "conv0p1s1.0": ("conv0a_conv", 0),
    "conv0p1s1.3": ("conv0b_conv", 1),
    "conv0p1s1.1": (None, 0),
    "conv0p1s1.4": (None, 1),
    "conv1p1s2.0": ("conv1_conv", 2),
    "conv1p1s2.1": (None, 2),
    "conv2p2s2.0": ("conv2_conv", 3),
    "conv2p2s2.1": (None, 3),
    "conv3p4s2.0": ("conv3_conv", 4),
    "conv3p4s2.1": (None, 4),
    "conv4p8s2.0": ("conv4_conv", 5),
    "conv4p8s2.1": (None, 5),
    "convtr4p16s2.0": ("convtr4_conv", 6),
    "convtr4p16s2.1": (None, 6),
    "convtr5p8s2.0": ("convtr5_conv", 7),
    "convtr5p8s2.1": (None, 7),
    "convtr6p4s2.0": ("convtr6_conv", 8),
    "convtr6p4s2.1": (None, 8),
    "convtr7p2s2.0": ("convtr7_conv", 9),
    "convtr7p2s2.1": (None, 9),
}


def _kernel3d(arr: np.ndarray) -> np.ndarray:
    a = np.asarray(arr)
    return a[None] if a.ndim == 2 else a


def _set(tree: dict, path: list, value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def import_res16unet(sd: Mapping[str, np.ndarray]):
    """Reference Res16UNet state_dict -> (params, batch_stats) nested dicts
    (keys match the flax tree; merge with ``flax.serialization``)."""
    sd = _strip(sd)
    params: dict = {}
    stats: dict = {}
    for key, value in sd.items():
        if "num_batches_tracked" in key:
            continue
        # stem / encoder / decoder sequential convs + norms
        m = re.match(r"(conv(?:tr)?\d?p?\d*s?\d*\.\d)\.(?:bn\.)?(\w+)$", key)
        if m and m.group(1) in _UNET_STEM:
            seq, field = m.groups()
            conv_name, bn_idx = _UNET_STEM[seq]
            if field == "kernel":
                _set(params, [conv_name, "kernel"], _kernel3d(value))
            elif field in _BN_FIELDS:
                col, leaf = _BN_FIELDS[field]
                tgt = params if col == "params" else stats
                _set(tgt, [f"MaskedBatchNorm_{bn_idx}", leaf], value)
            continue
        # residual blocks: block{i}.{j}.(conv1|conv2|conv3|norm1|norm2|
        # downsample.0|downsample.1).<field>
        m = re.match(
            r"block(\d)\.(\d+)\.(conv\d|norm\d|downsample\.\d)\.(?:bn\.)?(\w+)$",
            key,
        )
        if m:
            bi, bj, sub, field = m.groups()
            scope = f"block{bi}_{bj}"
            if sub.startswith("conv") and field == "kernel":
                _set(params, [scope, sub, "kernel"], _kernel3d(value))
            elif sub.startswith("norm"):
                idx = int(sub[-1]) - 1
                col, leaf = _BN_FIELDS[field]
                tgt = params if col == "params" else stats
                _set(tgt, [scope, f"MaskedBatchNorm_{idx}", leaf], value)
            elif sub == "downsample.0" and field == "kernel":
                _set(params, [scope, "downsample_conv", "kernel"],
                     _kernel3d(value))
            elif sub == "downsample.1":
                # downsample norm is created after norm1/norm2
                col, leaf = _BN_FIELDS[field]
                tgt = params if col == "params" else stats
                _set(tgt, [scope, "MaskedBatchNorm_2", leaf], value)
            continue
        if key.startswith("final."):
            field = key.split(".")[-1]
            if field == "kernel":
                _set(params, ["final", "kernel"], _kernel3d(value))
            elif field == "bias":
                _set(params, ["final", "bias"], value)
            continue
    return params, stats


def import_resnet(sd: Mapping[str, np.ndarray]):
    """Reference sparse-ResNet classifier -> (params, batch_stats)."""
    sd = _strip(sd)
    params: dict = {}
    stats: dict = {}
    for key, value in sd.items():
        if "num_batches_tracked" in key:
            continue
        if key == "conv1.kernel":
            _set(params, ["conv1", "kernel"], _kernel3d(value))
        elif key.startswith("bn1.bn."):
            field = key.split(".")[-1]
            col, leaf = _BN_FIELDS[field]
            tgt = params if col == "params" else stats
            _set(tgt, ["MaskedBatchNorm_0", leaf], value)
        elif key.startswith("final."):
            field = key.split(".")[-1]
            if field == "kernel":
                # 1x1 conv [Cin, Cout] -> Dense kernel [Cin, Cout]
                _set(params, ["final", "kernel"], np.asarray(value))
            else:
                _set(params, ["final", "bias"], value)
        else:
            m = re.match(
                r"layer(\d)\.(\d+)\.(conv\d|norm\d|downsample\.\d)\."
                r"(?:bn\.)?(\w+)$",
                key,
            )
            if not m:
                continue
            li, bj, sub, field = m.groups()
            scope = f"layer{li}_block{bj}"
            if sub.startswith("conv") and field == "kernel":
                _set(params, [scope, sub, "kernel"], _kernel3d(value))
            elif sub.startswith("norm"):
                idx = int(sub[-1]) - 1
                col, leaf = _BN_FIELDS[field]
                tgt = params if col == "params" else stats
                _set(tgt, [scope, f"MaskedBatchNorm_{idx}", leaf], value)
            elif sub == "downsample.0" and field == "kernel":
                _set(params, [scope, "downsample_conv", "kernel"],
                     _kernel3d(value))
            elif sub == "downsample.1":
                col, leaf = _BN_FIELDS[field]
                tgt = params if col == "params" else stats
                # downsample norm is created after the block's main norms:
                # index 2 for BasicBlock (2 norms), 3 for Bottleneck (3)
                is_bottleneck = any(
                    k.startswith(f"layer{li}.{bj}.conv3.") for k in sd
                )
                idx = 3 if is_bottleneck else 2
                _set(tgt, [scope, f"MaskedBatchNorm_{idx}", leaf], value)
    return params, stats


def merge_into(target_params, target_stats, imported_params, imported_stats):
    """Overlay imported leaves onto initialized trees, checking shapes."""
    import flax.serialization as fser
    import jax

    def overlay(target: dict, src: dict, path=""):
        out = {}
        for k, v in target.items():
            if k in src:
                if isinstance(v, dict):
                    out[k] = overlay(v, src[k], path + "/" + k)
                else:
                    arr = np.asarray(src[k])
                    tgt = np.asarray(v)
                    if arr.shape != tgt.shape:
                        raise ValueError(
                            f"shape mismatch at {path}/{k}: "
                            f"{arr.shape} vs {tgt.shape}"
                        )
                    out[k] = arr.astype(tgt.dtype)
            else:
                out[k] = v
        return out

    tp = fser.to_state_dict(target_params)
    ts = fser.to_state_dict(target_stats)
    new_p = overlay(tp, imported_params)
    new_s = overlay(ts, imported_stats)
    return (
        fser.from_state_dict(target_params, new_p),
        fser.from_state_dict(target_stats, new_s),
    )


def import_reference_checkpoint(path: str, model_name: str, params,
                                batch_stats):
    sd = load_torch_state_dict(path)
    if "Res16UNet" in model_name or "MinkUNet" in model_name:
        ip, istats = import_res16unet(sd)
    elif model_name.startswith("ResNet"):
        ip, istats = import_resnet(sd)
    else:
        raise ValueError(f"no import mapping for {model_name!r}")
    return merge_into(params, batch_stats, ip, istats)
