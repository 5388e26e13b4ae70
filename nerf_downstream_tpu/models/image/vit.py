"""Vision Transformers in flax: ViT and DeiT3 patch16-224 variants
(the reference builds these through timm, co3d_2d/src/model/models.py:37-54).

DeiT3 = ViT + LayerScale (init 1e-6) per residual branch.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class MlpBlock(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        # exact (erf) GELU — timm's nn.GELU; the tanh approximation drifts
        # ~1e-3 per activation, visibly off imported-weight logits
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype)(x)


class EncoderBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    layer_scale: float | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        def scale(name):
            if self.layer_scale is None:
                return lambda y: y
            g = self.param(
                name,
                lambda k, s: jnp.full(s, self.layer_scale, jnp.float32),
                (self.dim,),
            )
            return lambda y: y * g

        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype,
        )(y, y)
        x = x + scale("ls1")(y)
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = MlpBlock(self.dim, int(self.dim * self.mlp_ratio), self.dtype)(y)
        return x + scale("ls2")(y)


class ViT(nn.Module):
    num_classes: int = 51
    dim: int = 384
    depth: int = 12
    heads: int = 6
    patch: int = 16
    layer_scale: float | None = None
    # timm no_embed_class=True (all deit3_* variants): pos_embed covers the
    # 196 patch tokens only and is added BEFORE the cls concat, so the cls
    # token carries no positional term.
    no_embed_class: bool = False
    dtype: Any = jnp.float32
    pretrained: bool = False
    pretrained_arch: str = ""

    # backbone params sit at the module root; only the head is fresh
    pretrained_submodule = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.dim, (self.patch, self.patch), (self.patch, self.patch),
            dtype=self.dtype, name="patch_embed",
        )(x)
        x = x.reshape(b, -1, self.dim)
        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.dim)
        )
        if self.no_embed_class:
            pos = self.param(
                "pos_embed", nn.initializers.normal(0.02),
                (1, x.shape[1], self.dim),
            )
            x = x + pos
            x = jnp.concatenate(
                [jnp.broadcast_to(cls, (b, 1, self.dim)), x], 1
            )
        else:
            x = jnp.concatenate(
                [jnp.broadcast_to(cls, (b, 1, self.dim)), x], 1
            )
            pos = self.param(
                "pos_embed", nn.initializers.normal(0.02),
                (1, x.shape[1], self.dim),
            )
            x = x + pos
        for i in range(self.depth):
            x = EncoderBlock(
                self.dim, self.heads, layer_scale=self.layer_scale,
                dtype=self.dtype, name=f"block{i}",
            )(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(
            x[:, 0]
        )


VIT_SPECS = {
    "vit_small_patch16_224": dict(dim=384, depth=12, heads=6),
    "vit_base_patch16_224": dict(dim=768, depth=12, heads=12),
    "vit_large_patch16_224": dict(dim=1024, depth=24, heads=16),
    "deit3_small_patch16_224": dict(dim=384, depth=12, heads=6,
                                    layer_scale=1e-6, no_embed_class=True),
    "deit3_base_patch16_224": dict(dim=768, depth=12, heads=12,
                                   layer_scale=1e-6, no_embed_class=True),
    "deit3_large_patch16_224": dict(dim=1024, depth=24, heads=16,
                                    layer_scale=1e-6, no_embed_class=True),
}
