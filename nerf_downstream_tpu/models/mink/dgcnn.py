"""DGCNN: dense kNN-graph edge convolutions (reference
co3d_3d/src/models/mink/dgcnn.py:8-220).

Pure XLA over dense [B, N, C] clouds: kNN via the matmul distance trick,
edge features (x_j - x_i, x_i), 1x1 convs as Dense layers. All matmuls are
MXU-shaped; top-k is XLA's native ``lax.top_k``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def knn(x: jax.Array, k: int) -> jax.Array:
    """x: [B, N, C] -> neighbor indices [B, N, k] (excluding nothing, as in
    the reference: the matmul trick, dgcnn.py:8-13)."""
    inner = -2 * jnp.einsum("bnc,bmc->bnm", x, x)
    xx = jnp.sum(x**2, axis=-1, keepdims=True)
    neg_dist = -xx - inner - jnp.swapaxes(xx, 1, 2)
    _, idx = jax.lax.top_k(neg_dist, k)
    return idx


def get_graph_feature(x: jax.Array, k: int, idx=None) -> jax.Array:
    """[B, N, C] -> edge features [B, N, k, 2C] = (x_j - x_i, x_i)."""
    if idx is None:
        idx = knn(x, k)
    gathered = jnp.take_along_axis(
        x[:, None, :, :].repeat(x.shape[1], 1), idx[..., None], axis=2
    )
    center = jnp.broadcast_to(x[:, :, None, :], gathered.shape)
    return jnp.concatenate([gathered - center, center], axis=-1)


class _EdgeConv(nn.Module):
    out_channels: int
    k: int

    @nn.compact
    def __call__(self, x, train: bool):
        e = get_graph_feature(x, self.k)  # [B, N, k, 2C]
        e = nn.Dense(self.out_channels, use_bias=False)(e)
        e = nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            axis=-1, use_bias=True, use_scale=True,
        )(e)
        e = jax.nn.leaky_relu(e, 0.2)
        return jnp.max(e, axis=2)  # [B, N, C']


class DGCNN_cls(nn.Module):
    output_channels: int = 40
    k: int = 20
    emb_dims: int = 1024
    dropout: float = 0.5
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        # x: [B, N, 3]
        x1 = _EdgeConv(64, self.k, name="conv1")(x, train)
        x2 = _EdgeConv(64, self.k, name="conv2")(x1, train)
        x3 = _EdgeConv(128, self.k, name="conv3")(x2, train)
        x4 = _EdgeConv(256, self.k, name="conv4")(x3, train)
        cat = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # [B, N, 512]
        y = nn.Dense(self.emb_dims, use_bias=False, name="conv5")(cat)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="bn5"
        )(y)
        y = jax.nn.leaky_relu(y, 0.2)
        gmax = jnp.max(y, axis=1)
        gavg = jnp.mean(y, axis=1)
        z = jnp.concatenate([gmax, gavg], axis=-1)
        z = nn.Dense(512, use_bias=False, name="linear1")(z)
        z = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="bn6"
        )(z)
        z = jax.nn.leaky_relu(z, 0.2)
        z = nn.Dropout(self.dropout, deterministic=not train)(z)
        z = nn.Dense(256, name="linear2")(z)
        z = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="bn7"
        )(z)
        z = jax.nn.leaky_relu(z, 0.2)
        z = nn.Dropout(self.dropout, deterministic=not train)(z)
        return nn.Dense(self.output_channels, name="linear3")(z)


class DGCNN_semseg(nn.Module):
    """Per-point segmentation variant (dgcnn.py:127-210)."""

    output_channels: int = 13
    k: int = 20
    emb_dims: int = 1024
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        n = x.shape[1]
        x1 = _EdgeConv(64, self.k, name="conv1")(x, train)
        x1 = _EdgeConv(64, self.k, name="conv2")(x1, train)
        x2 = _EdgeConv(64, self.k, name="conv3")(x1, train)
        x2 = _EdgeConv(64, self.k, name="conv4")(x2, train)
        x3 = _EdgeConv(64, self.k, name="conv5")(x2, train)
        cat = jnp.concatenate([x1, x2, x3], axis=-1)
        y = nn.Dense(self.emb_dims, use_bias=False, name="conv6")(cat)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="bn6"
        )(y)
        y = jax.nn.leaky_relu(y, 0.2)
        g = jnp.max(y, axis=1, keepdims=True)  # [B, 1, E]
        g = jnp.broadcast_to(g, (y.shape[0], n, y.shape[-1]))
        z = jnp.concatenate([g, x1, x2, x3], axis=-1)
        for ch, name in [(512, "conv7"), (256, "conv8")]:
            z = nn.Dense(ch, use_bias=False, name=name)(z)
            z = nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                name=f"{name}_bn",
            )(z)
            z = jax.nn.leaky_relu(z, 0.2)
        z = nn.Dropout(self.dropout, deterministic=not train)(z)
        return nn.Dense(self.output_channels, name="conv9")(z)


def make_dgcnn(name: str, in_channel: int, out_channel: int, **kwargs):
    kwargs.pop("num_batches", None)
    if name in ("DGCNN_semseg",):
        return DGCNN_semseg(output_channels=out_channel, **kwargs)
    return DGCNN_cls(output_channels=out_channel, **kwargs)
