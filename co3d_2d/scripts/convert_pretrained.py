"""Convert a downloaded torchvision/timm checkpoint into the local
pretrained store, enabling ``pretrained=True`` 2D configs.

The reference fetches ImageNet weights at model build time via torch.hub /
timm (co3d_2d/src/model/models.py:17-22,46-50). This build has no network
access, so conversion is a one-time offline step:

    python -m co3d_2d.scripts.convert_pretrained resnet18 /path/resnet18.pth
    python -m co3d_2d.scripts.convert_pretrained vit_small_patch16_224 w.bin

Accepts .pth/.bin (torch.load) and .npz (already-numpy state_dicts). The
result lands in $NDT_PRETRAINED_DIR (default
~/.cache/nerf_downstream_tpu/pretrained/<arch>.npz).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from nerf_downstream_tpu.models.image.resnet2d import RESNET_SPECS
from nerf_downstream_tpu.models.image.torch_weights import (
    convert_timm_vit,
    convert_torchvision_resnet,
    save_converted,
)
from nerf_downstream_tpu.models.image.vit import VIT_SPECS


def load_state_dict(path: str) -> dict:
    if path.endswith(".npz"):
        import numpy as np

        return dict(np.load(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and not hasattr(
        obj["model"], "shape"
    ):
        obj = obj["model"]
    return obj


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("arch", help="torchvision/timm architecture name")
    ap.add_argument("checkpoint", help=".pth/.bin/.npz state_dict")
    ap.add_argument("--out", default=None, help="override output npz path")
    args = ap.parse_args(argv)

    sd = load_state_dict(args.checkpoint)
    if args.arch in RESNET_SPECS:
        params, stats = convert_torchvision_resnet(sd, args.arch)
    elif args.arch in VIT_SPECS:
        params, stats = convert_timm_vit(sd, args.arch), None
    else:
        raise SystemExit(f"unknown architecture {args.arch!r}")
    path = save_converted(args.arch, params, stats, args.out)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
