"""Pretrained-weight converter: flax forward must reproduce torch logits.

torchvision/timm are not installed here, so the fixtures are pure-torch
replicas of the standard architectures emitting state_dicts with the
torchvision/timm key naming the converter consumes (He et al. ResNet /
Dosovitskiy et al. ViT — public architectures)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


class _TorchBasicBlock(tnn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU()
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes),
            )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + r)


class _TorchResNet18(tnn.Module):
    """torchvision-key-compatible resnet18 (backbone + 1000-class fc)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        planes = (64, 128, 256, 512)
        cin = 64
        for s, p in enumerate(planes):
            blocks = []
            for i in range(2):
                stride = 2 if (s > 0 and i == 0) else 1
                blocks.append(_TorchBasicBlock(cin, p, stride))
                cin = p
            setattr(self, f"layer{s + 1}", tnn.Sequential(*blocks))
        self.fc = tnn.Linear(512, 1000)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
        return x.mean(dim=(2, 3))  # pooled features (fc replaced by task)


def _randomize_bn_stats(model, rng):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(
                torch.tensor(rng.normal(size=m.running_mean.shape) * 0.1,
                             dtype=torch.float32)
            )
            m.running_var.copy_(
                torch.tensor(rng.uniform(0.5, 2.0, size=m.running_var.shape),
                             dtype=torch.float32)
            )


def test_resnet18_converted_matches_torch(rng):
    from nerf_downstream_tpu.models.image.resnet2d import (
        RESNET_SPECS,
        ResNet2D,
    )
    from nerf_downstream_tpu.models.image.torch_weights import (
        convert_torchvision_resnet,
    )

    tm = _TorchResNet18()
    with torch.no_grad():
        _randomize_bn_stats(tm, rng)
    tm.eval()
    sd = tm.state_dict()
    params, stats = convert_torchvision_resnet(sd, "resnet18")

    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ty = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()

    model = ResNet2D(**RESNET_SPECS["resnet18"])
    y = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-4, atol=1e-4)


class _TimmAttention(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, C // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(y)


class _TimmLayerScale(tnn.Module):
    def __init__(self, dim, init):
        super().__init__()
        self.gamma = tnn.Parameter(torch.full((dim,), init))

    def forward(self, x):
        return x * self.gamma


class _TimmBlock(tnn.Module):
    def __init__(self, dim, heads, layer_scale=None):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = _TimmAttention(dim, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)
        ident = tnn.Identity()
        self.ls1 = _TimmLayerScale(dim, layer_scale) if layer_scale else ident
        self.ls2 = _TimmLayerScale(dim, layer_scale) if layer_scale else ident

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        return x + self.ls2(
            self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
        )


class _TimmViT(tnn.Module):
    """timm-key-compatible ViT (tiny config for the fixture).

    ``no_embed_class=True`` reproduces timm's deit3 ordering: pos_embed
    spans patch tokens only and is added before the cls concat."""

    def __init__(self, dim, depth, heads, patch=16, img=32,
                 no_embed_class=False, layer_scale=None):
        super().__init__()
        self.no_embed_class = no_embed_class
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, patch)
        n = (img // patch) ** 2 + (0 if no_embed_class else 1)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, n, dim) * 0.02)
        self.blocks = tnn.Sequential(
            *[_TimmBlock(dim, heads, layer_scale) for _ in range(depth)]
        )
        self.norm = tnn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        if self.no_embed_class:
            x = x + self.pos_embed
            x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        else:
            x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
            x = x + self.pos_embed
        x = self.blocks(x)
        return self.norm(x)[:, 0]  # cls features (head replaced by task)


def test_vit_converted_matches_torch(rng):
    from nerf_downstream_tpu.models.image import vit as vit_mod
    from nerf_downstream_tpu.models.image.torch_weights import (
        convert_timm_vit,
    )

    dim, depth, heads = 48, 2, 4
    vit_mod.VIT_SPECS["_test_tiny"] = dict(dim=dim, depth=depth, heads=heads)
    try:
        tm = _TimmViT(dim, depth, heads)
        tm.eval()
        params = convert_timm_vit(tm.state_dict(), "_test_tiny")

        x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            ty = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()

        model = vit_mod.ViT(num_classes=5, dim=dim, depth=depth, heads=heads)
        v = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(x), train=False,
        )
        merged = dict(v["params"])
        merged.update(params)  # head stays fresh

        # compare backbone cls features: rerun flax up to the head by
        # zeroing the head and reading pre-head features via the head's
        # identity trick — instead, compare head logits with an identical
        # fresh head applied to torch features
        head_k = np.asarray(v["params"]["head"]["kernel"])
        head_b = np.asarray(v["params"]["head"]["bias"])
        y = model.apply({"params": merged}, jnp.asarray(x), train=False)
        ty_logits = ty @ head_k + head_b
        np.testing.assert_allclose(
            np.asarray(y), ty_logits, rtol=2e-4, atol=2e-4
        )
    finally:
        vit_mod.VIT_SPECS.pop("_test_tiny", None)


def test_deit3_converted_matches_torch(rng):
    """deit3 fixtures: LayerScale + no_embed_class (timm adds pos_embed to
    patch tokens before the cls concat — ADVICE r2 medium)."""
    from nerf_downstream_tpu.models.image import vit as vit_mod
    from nerf_downstream_tpu.models.image.torch_weights import (
        convert_timm_vit,
    )

    dim, depth, heads = 48, 2, 4
    vit_mod.VIT_SPECS["_test_deit3"] = dict(
        dim=dim, depth=depth, heads=heads, layer_scale=1e-6,
        no_embed_class=True,
    )
    try:
        tm = _TimmViT(dim, depth, heads, no_embed_class=True,
                      layer_scale=1e-6)
        # fresh LayerScale is 1e-6 everywhere; randomize so the test can
        # tell an imported gamma from an initialized one
        with torch.no_grad():
            for blk in tm.blocks:
                blk.ls1.gamma.copy_(torch.rand(dim) * 0.1)
                blk.ls2.gamma.copy_(torch.rand(dim) * 0.1)
        tm.eval()
        params = convert_timm_vit(tm.state_dict(), "_test_deit3")
        assert params["pos_embed"].shape == (1, 4, dim)

        x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            ty = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()

        model = vit_mod.ViT(
            num_classes=5, dim=dim, depth=depth, heads=heads,
            layer_scale=1e-6, no_embed_class=True,
        )
        v = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
        assert v["params"]["pos_embed"].shape == (1, 4, dim)
        merged = dict(v["params"])
        merged.update(params)  # head stays fresh

        head_k = np.asarray(v["params"]["head"]["kernel"])
        head_b = np.asarray(v["params"]["head"]["bias"])
        y = model.apply({"params": merged}, jnp.asarray(x), train=False)
        ty_logits = ty @ head_k + head_b
        np.testing.assert_allclose(
            np.asarray(y), ty_logits, rtol=2e-4, atol=2e-4
        )
    finally:
        vit_mod.VIT_SPECS.pop("_test_deit3", None)


def test_apply_pretrained_roundtrip(rng, tmp_path, monkeypatch):
    """save_converted -> pretrained=True model picks the weights up at
    state creation; missing store degrades to a warning."""
    monkeypatch.setenv("NDT_PRETRAINED_DIR", str(tmp_path))
    from nerf_downstream_tpu.models.image.torch_weights import (
        convert_torchvision_resnet,
        save_converted,
    )
    from nerf_downstream_tpu.train.modules2d import LitModel
    from nerf_downstream_tpu import config as cfg

    tm = _TorchResNet18()
    tm.eval()
    params, stats = convert_torchvision_resnet(tm.state_dict(), "resnet18")
    save_converted("resnet18", params, stats)

    cfg.clear_config()
    cfg.parse_config("ResNetBased.pretrained = True\n")
    lit = LitModel(model_name="resnet18", num_training_steps=10)
    cfg.clear_config()
    batch = {
        "images": rng.normal(size=(2, 64, 64, 3)).astype(np.float32),
        "labels": np.array([0, 1]),
    }
    state = lit.create_state(jax.random.PRNGKey(0), batch)
    got = np.asarray(state.params["model"]["conv1"]["kernel"])
    want = np.transpose(tm.conv1.weight.detach().numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # BN stats came along
    got_var = np.asarray(state.batch_stats["model"]["bn1"]["var"])
    np.testing.assert_allclose(got_var, tm.bn1.running_var.numpy(), rtol=1e-6)
