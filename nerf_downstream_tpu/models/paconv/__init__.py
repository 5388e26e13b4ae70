"""PAConv models: PAConvPointNet + PAConv-DGCNN (reference
co3d_3d/src/models/paconv/PointNet_PAConv.py:23-139, DGCNN_PAConv.py:21-177,
util/PAConv_util.py:6-137).

kNN -> ScoreNet MLPs over (neighbor - center, neighbor) -> weight-bank
matmul -> assign-score assembly (the reference's CUDA op, here the XLA op
with custom VJP in ops/paconv.py).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_downstream_tpu import config as cfg
from nerf_downstream_tpu.models.mink.dgcnn import knn
from nerf_downstream_tpu.ops.paconv import (
    assign_score_withk,
    assign_score_withk_halfkernel,
)


def get_scorenet_input(x: jax.Array, idx: jax.Array) -> jax.Array:
    """x [B, N, 3], idx [B, N, K] -> (neighbor - center, neighbor) [B,N,K,6]."""
    nbr = jnp.take_along_axis(
        x[:, None, :, :].repeat(x.shape[1], 1), idx[..., None], axis=2
    )
    center = jnp.broadcast_to(x[:, :, None, :], nbr.shape)
    return jnp.concatenate([nbr - center, nbr], axis=-1)


def feat_trans_pointnet(x: jax.Array, kernel: jax.Array, m: int) -> jax.Array:
    """x [B, N, Cin] @ kernel [Cin, m*Cout] -> [B, N, m, Cout]."""
    b, n, _ = x.shape
    return jnp.einsum(
        "bnc,cd->bnd", x, kernel, preferred_element_type=jnp.float32
    ).reshape(b, n, m, -1)


def feat_trans_dgcnn(x: jax.Array, kernel: jax.Array, m: int):
    """DGCNN variant: points use duplicated (x, x) features, centers the
    first half of the kernel (PAConv_util.py:47-61)."""
    b, n, c = x.shape
    x2 = jnp.concatenate([x, x], axis=-1)
    point = jnp.einsum("bnc,cd->bnd", x2, kernel).reshape(b, n, m, -1)
    center = jnp.einsum("bnc,cd->bnd", x, kernel[:c]).reshape(b, n, m, -1)
    return point, center


class ScoreNet(nn.Module):
    """MLP over scorenet input -> per-(point, neighbor) weight-bank scores
    (PAConv_util.py:64-137)."""

    out_channel: int
    hidden_unit: Sequence[int] = (16,)
    last_bn: bool = False

    @nn.compact
    def __call__(self, xyz, train: bool, calc_scores="softmax", bias=0.0):
        # xyz: [B, N, K, 6]
        s = xyz
        hidden = list(self.hidden_unit or [])
        for i, h in enumerate(hidden):
            s = nn.Dense(h, use_bias=False, name=f"hidden{i}")(s)
            s = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name=f"bn{i}"
            )(s)
            s = jax.nn.relu(s)
        s = nn.Dense(
            self.out_channel, use_bias=not self.last_bn, name="out"
        )(s)
        if self.last_bn:
            s = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name="bn_out"
            )(s)
        if calc_scores == "softmax":
            s = jax.nn.softmax(s, axis=-1) + bias
        elif calc_scores == "sigmoid":
            s = jax.nn.sigmoid(s) + bias
        else:
            raise ValueError("Not Implemented!")
        return s  # [B, N, K, m]


def _kaiming_bank(key, m, cin, cout):
    w = jax.random.normal(key, (m, cin, cout)) * (2.0 / cin) ** 0.5
    return jnp.transpose(w, (1, 0, 2)).reshape(cin, m * cout)


@cfg.configurable("PAConvPointNet")
class PAConvPointNetFactory:
    """gin-surface wrapper so configs bind PAConvPointNet.* params."""

    def __new__(cls, in_channel=3, out_channel=40, k=20,
                calc_scores="softmax", num_matrices=(8, 8, 8), dropout=0.5):
        return PAConvPointNet(
            out_channel=out_channel, k=k, calc_scores=calc_scores,
            num_matrices=tuple(num_matrices), dropout=dropout,
        )


class PAConvPointNet(nn.Module):
    out_channel: int = 40
    k: int = 20
    calc_scores: str = "softmax"
    num_matrices: Sequence[int] = (8, 8, 8)
    dropout: float = 0.5
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        # x: [B, N, 3] point coordinates
        m2, m3, m4 = self.num_matrices
        idx = knn(x, self.k)
        xyz = get_scorenet_input(x, idx)

        h = nn.Dense(64, use_bias=False, name="conv1")(x)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="bn1"
        )(h)
        h = jax.nn.relu(h)

        dims = [(m2, 64, 64, "2"), (m3, 64, 64, "3"), (m4, 64, 128, "4")]
        for m, ci, co, tag in dims:
            bank = self.param(
                f"matrice{tag}", lambda k_, m=m, ci=ci, co=co: _kaiming_bank(k_, m, ci, co)
            )
            pt = feat_trans_pointnet(h, bank, m)
            score = ScoreNet(m, name=f"scorenet{tag}")(
                xyz, train, self.calc_scores, 0.0
            )
            h = assign_score_withk_halfkernel(score, pt, idx)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name=f"bn{tag}"
            )(h)
            h = jax.nn.relu(h)

        h = nn.Dense(1024, use_bias=False, name="conv5")(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="bn5"
        )(h)
        h = jax.nn.relu(h)
        g = jnp.max(h, axis=1)
        g = nn.Dense(512, use_bias=False, name="linear1")(g)
        g = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="bn6"
        )(g)
        g = jax.nn.relu(g)
        g = nn.Dropout(self.dropout, deterministic=not train)(g)
        return nn.Dense(self.out_channel, name="linear2")(g)


class PAConvDGCNN(nn.Module):
    """PAConv over DGCNN backbone (reference DGCNN_PAConv.py:21-177)."""

    out_channel: int = 40
    k: int = 20
    calc_scores: str = "softmax"
    num_matrices: Sequence[int] = (8, 8, 8, 8)
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        idx = knn(x, self.k)
        xyz = get_scorenet_input(x, idx)
        dims = [(3, 64, "1"), (64, 64, "2"), (64, 128, "3"), (128, 256, "4")]
        h = x
        feats = []
        for (ci, co, tag), m in zip(dims, self.num_matrices):
            bank = self.param(
                f"matrice{tag}",
                lambda k_, m=m, ci=ci, co=co: _kaiming_bank(k_, m, 2 * ci, co),
            )
            pt, ctr = feat_trans_dgcnn(h, bank, m)
            score = ScoreNet(m, name=f"scorenet{tag}")(
                xyz, train, self.calc_scores, 0.5
            )
            h = assign_score_withk(score, pt, ctr, idx)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name=f"bn{tag}"
            )(h)
            h = jax.nn.relu(h)
            feats.append(h)
        cat = jnp.concatenate(feats, axis=-1)
        y = nn.Dense(1024, use_bias=False, name="conv5")(cat)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="bn5"
        )(y)
        y = jax.nn.leaky_relu(y, 0.2)
        g = jnp.concatenate([jnp.max(y, 1), jnp.mean(y, 1)], axis=-1)
        g = nn.Dense(512, use_bias=False, name="linear1")(g)
        g = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="bn6"
        )(g)
        g = jax.nn.leaky_relu(g, 0.2)
        g = nn.Dropout(self.dropout, deterministic=not train)(g)
        g = nn.Dense(256, name="linear2")(g)
        g = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="bn7"
        )(g)
        g = jax.nn.leaky_relu(g, 0.2)
        g = nn.Dropout(self.dropout, deterministic=not train)(g)
        return nn.Dense(self.out_channel, name="linear3")(g)


def make_paconv(name: str, in_channel: int, out_channel: int, **kwargs):
    kwargs.pop("num_batches", None)
    if name == "PAConvDGCNN":
        return PAConvDGCNN(out_channel=out_channel, **kwargs)
    return PAConvPointNet(out_channel=out_channel, **kwargs)
