"""ImageNet-pretrained weight import for the 2D stack.

The reference loads torchvision/timm backbones with ``pretrained=True``
(co3d_2d/src/model/models.py:8-54). This build has zero egress, so the
path is: convert a downloaded ``.pth``/``.safetensors`` state_dict ONCE
with ``co3d_2d/scripts/convert_pretrained.py`` (or call
``convert_torchvision_resnet``/``convert_timm_vit`` directly), which
writes an ``.npz`` into the pretrained store; ``pretrained=True`` configs
then load it at state creation. Heads are never imported — the reference
replaces them with fresh task heads (models.py:23-29, timm
``num_classes=51``).

Store location: ``$NDT_PRETRAINED_DIR`` or ``~/.cache/nerf_downstream_tpu/
pretrained``.
"""

from __future__ import annotations

import logging
import os

import numpy as np


def pretrained_store_dir() -> str:
    return os.environ.get(
        "NDT_PRETRAINED_DIR",
        os.path.expanduser("~/.cache/nerf_downstream_tpu/pretrained"),
    )


def pretrained_path(arch: str) -> str:
    return os.path.join(pretrained_store_dir(), f"{arch}.npz")


def _t_conv(w):
    """torch conv [out, in(/groups), kh, kw] -> flax [kh, kw, in(/g), out]."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _np(sd, k):
    v = sd[k]
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def convert_torchvision_resnet(sd: dict, arch: str):
    """torchvision ResNet/ResNeXt/WideResNet state_dict -> flax trees.

    Returns (params, batch_stats) for the ``ResNet2D`` backbone (the
    ``model`` submodule of ``_ResNetBased``); the fc head is skipped.
    Key map: ``layerL.i.convN.weight`` -> ``layerL_i/convN/kernel``,
    ``.bnN.{weight,bias}`` -> ``bnN/{scale,bias}``,
    ``.downsample.{0,1}`` -> ``downsample_{conv,bn}``,
    running stats -> the batch_stats collection.
    """
    from nerf_downstream_tpu.models.image.resnet2d import RESNET_SPECS

    spec = RESNET_SPECS[arch]
    params: dict = {}
    stats: dict = {}

    def put_bn(dst: str, src: str):
        params[dst] = {
            "scale": _np(sd, f"{src}.weight"),
            "bias": _np(sd, f"{src}.bias"),
        }
        stats[dst] = {
            "mean": _np(sd, f"{src}.running_mean"),
            "var": _np(sd, f"{src}.running_var"),
        }

    params["conv1"] = {"kernel": _t_conv(_np(sd, "conv1.weight"))}
    put_bn("bn1", "bn1")
    n_convs = 2 if spec["block"] == "basic" else 3
    for stage, n in enumerate(spec["layers"]):
        for i in range(n):
            src = f"layer{stage + 1}.{i}"
            dst = f"layer{stage + 1}_{i}"
            blk: dict = {}
            for c in range(1, n_convs + 1):
                blk[f"conv{c}"] = {
                    "kernel": _t_conv(_np(sd, f"{src}.conv{c}.weight"))
                }
            params[dst] = blk
            bstats: dict = {}
            for c in range(1, n_convs + 1):
                blk[f"bn{c}"] = {
                    "scale": _np(sd, f"{src}.bn{c}.weight"),
                    "bias": _np(sd, f"{src}.bn{c}.bias"),
                }
                bstats[f"bn{c}"] = {
                    "mean": _np(sd, f"{src}.bn{c}.running_mean"),
                    "var": _np(sd, f"{src}.bn{c}.running_var"),
                }
            if f"{src}.downsample.0.weight" in sd:
                blk["downsample_conv"] = {
                    "kernel": _t_conv(_np(sd, f"{src}.downsample.0.weight"))
                }
                blk["downsample_bn"] = {
                    "scale": _np(sd, f"{src}.downsample.1.weight"),
                    "bias": _np(sd, f"{src}.downsample.1.bias"),
                }
                bstats["downsample_bn"] = {
                    "mean": _np(sd, f"{src}.downsample.1.running_mean"),
                    "var": _np(sd, f"{src}.downsample.1.running_var"),
                }
            stats[dst] = bstats
    return params, stats


def convert_timm_vit(sd: dict, arch: str):
    """timm ViT/DeiT3 state_dict -> flax params for ``ViT`` (head skipped).

    qkv fusion is split into flax MultiHeadDotProductAttention's
    query/key/value DenseGenerals ([dim, heads, head_dim]); DeiT3 LayerScale
    gammas map to ls1/ls2.
    """
    from nerf_downstream_tpu.models.image.vit import VIT_SPECS

    spec = VIT_SPECS[arch]
    dim, depth, heads = spec["dim"], spec["depth"], spec["heads"]
    hd = dim // heads
    params: dict = {
        "patch_embed": {
            "kernel": _t_conv(_np(sd, "patch_embed.proj.weight")),
            "bias": _np(sd, "patch_embed.proj.bias"),
        },
        "cls_token": _np(sd, "cls_token"),
        "pos_embed": _np(sd, "pos_embed"),
        "LayerNorm_0": {
            "scale": _np(sd, "norm.weight"),
            "bias": _np(sd, "norm.bias"),
        },
    }

    def split_qkv(w, b):
        # timm qkv.weight [3*dim, dim]: rows are outputs (q, k, v stacked)
        w = w.reshape(3, dim, dim)
        b = b.reshape(3, dim)
        out = []
        for j in range(3):
            # torch Linear y = x W^T: W[out, in] -> flax kernel [in, out]
            k = np.ascontiguousarray(w[j].T).reshape(dim, heads, hd)
            out.append((k, b[j].reshape(heads, hd)))
        return out

    for i in range(depth):
        src = f"blocks.{i}"
        (qk, qb), (kk, kb), (vk, vb) = split_qkv(
            _np(sd, f"{src}.attn.qkv.weight"), _np(sd, f"{src}.attn.qkv.bias")
        )
        proj_w = _np(sd, f"{src}.attn.proj.weight")  # [dim, dim]
        blk = {
            "LayerNorm_0": {
                "scale": _np(sd, f"{src}.norm1.weight"),
                "bias": _np(sd, f"{src}.norm1.bias"),
            },
            "MultiHeadDotProductAttention_0": {
                "query": {"kernel": qk, "bias": qb},
                "key": {"kernel": kk, "bias": kb},
                "value": {"kernel": vk, "bias": vb},
                "out": {
                    "kernel": np.ascontiguousarray(proj_w.T).reshape(
                        heads, hd, dim
                    ),
                    "bias": _np(sd, f"{src}.attn.proj.bias"),
                },
            },
            "LayerNorm_1": {
                "scale": _np(sd, f"{src}.norm2.weight"),
                "bias": _np(sd, f"{src}.norm2.bias"),
            },
            "MlpBlock_0": {
                "Dense_0": {
                    "kernel": np.ascontiguousarray(
                        _np(sd, f"{src}.mlp.fc1.weight").T
                    ),
                    "bias": _np(sd, f"{src}.mlp.fc1.bias"),
                },
                "Dense_1": {
                    "kernel": np.ascontiguousarray(
                        _np(sd, f"{src}.mlp.fc2.weight").T
                    ),
                    "bias": _np(sd, f"{src}.mlp.fc2.bias"),
                },
            },
        }
        if f"{src}.ls1.gamma" in sd:  # DeiT3 LayerScale
            blk["ls1"] = _np(sd, f"{src}.ls1.gamma")
            blk["ls2"] = _np(sd, f"{src}.ls2.gamma")
        params[f"block{i}"] = blk
    return params


def save_converted(arch: str, params: dict, batch_stats: dict | None,
                   path: str | None = None) -> str:
    """Flatten and save converted trees as one npz."""
    from flax import traverse_util

    path = path or pretrained_path(arch)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    flat = {
        "params/" + "/".join(k): v
        for k, v in traverse_util.flatten_dict(params).items()
    }
    if batch_stats:
        flat.update(
            {
                "batch_stats/" + "/".join(k): v
                for k, v in traverse_util.flatten_dict(batch_stats).items()
            }
        )
    np.savez(path, **flat)
    return path


def load_converted(arch: str, path: str | None = None):
    """Load a converted npz -> (params, batch_stats) trees, or None."""
    from flax import traverse_util

    path = path or pretrained_path(arch)
    if not os.path.exists(path):
        return None
    data = np.load(path)
    params_flat, stats_flat = {}, {}
    for k in data.files:
        coll, rest = k.split("/", 1)
        target = params_flat if coll == "params" else stats_flat
        target[tuple(rest.split("/"))] = data[k]
    return (
        traverse_util.unflatten_dict(params_flat),
        traverse_util.unflatten_dict(stats_flat),
    )


def apply_pretrained(variables: dict, arch: str, submodule: str | None):
    """Merge stored pretrained weights into freshly-initialized variables.

    ``submodule`` is the backbone's name inside the model ("model" for
    _ResNetBased, None for ViT whose backbone params sit at the root with
    only the head excluded). Shapes are verified leaf by leaf. Returns the
    merged variables, or the input unchanged (with a warning) when no store
    entry exists.
    """
    import jax

    loaded = load_converted(arch)
    if loaded is None:
        logging.warning(
            f"pretrained=True for {arch!r} but no converted weights at "
            f"{pretrained_path(arch)}; run co3d_2d/scripts/"
            "convert_pretrained.py once. Training from scratch."
        )
        return variables
    params, stats = loaded

    def merge(dst, src, where):
        out = dict(dst)
        for k, v in src.items():
            if k not in out:
                raise KeyError(f"pretrained key {where}/{k} not in model")
            if isinstance(v, dict):
                out[k] = merge(out[k], v, f"{where}/{k}")
            else:
                if tuple(out[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {where}/{k}: model "
                        f"{out[k].shape} vs pretrained {v.shape}"
                    )
                out[k] = v.astype(np.asarray(out[k]).dtype)
        return out

    new_vars = {k: dict(v) for k, v in variables.items()}
    if submodule is None:
        new_vars["params"] = merge(new_vars["params"], params, "params")
        if stats:
            new_vars["batch_stats"] = merge(
                new_vars.get("batch_stats", {}), stats, "batch_stats"
            )
    else:
        new_vars["params"][submodule] = merge(
            new_vars["params"][submodule], params, f"params/{submodule}"
        )
        if stats:
            new_vars["batch_stats"][submodule] = merge(
                new_vars["batch_stats"][submodule], stats,
                f"batch_stats/{submodule}",
            )
    logging.info(f"loaded pretrained {arch} weights from the local store")
    return jax.tree_util.tree_map(lambda x: x, new_vars)
