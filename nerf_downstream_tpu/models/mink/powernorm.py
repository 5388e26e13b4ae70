"""PowerNorm for sparse voxel rows (reference
co3d_3d/src/models/mink/modules/powernorm.py:24-329).

Normalization by the running second moment instead of batch mean/var:
- GroupScaling1D: per-row, per-group second-moment scaling (:24-49);
- forward: z = x / sqrt(phi + eps) where phi is the running mean-square
  during inference and the batch mean-square during warmup (:52-97);
- running_phi EMA with ``alpha_fwd``; warmup averaging for the first
  ``warmup_iters`` steps.

The reference's custom backward (:99-139) implements an EMA-corrected
gradient (``ema_gz``); here we use straight-through autodiff of the forward
graph with the running statistic treated as a constant — the published
PowerNorm ablation shows the forward statistic is what matters for the BN
replacement; revisit if PN configs are trained for parity.

``convert_powernorm`` mirrors the BN->PN converter (:291-329) as a
state-dict transform.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_downstream_tpu.sparse.types import SparseVoxels


def group_scaling(feats: jax.Array, group_num: int, eps: float = 1e-5):
    n, c = feats.shape
    cg = max(c // group_num, 1)
    g = feats.reshape(n, -1, cg)
    moment2 = jnp.mean(g * g, axis=2, keepdims=True)
    g = g / jnp.sqrt(moment2 + eps)
    return g.reshape(n, c)


class MinkPowerNorm(nn.Module):
    eps: float = 1e-5
    alpha_fwd: float = 0.9
    warmup_iters: int = 10000
    group_num: int = 1
    axis_name: str | None = None

    @nn.compact
    def __call__(self, sv: SparseVoxels, train: bool) -> SparseVoxels:
        c = sv.num_channels
        weight = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        running_phi = self.variable(
            "batch_stats", "running_phi", lambda: jnp.ones((c,), jnp.float32)
        )
        iters = self.variable(
            "batch_stats", "iters", lambda: jnp.zeros((), jnp.int32)
        )
        x = group_scaling(
            sv.feats.astype(jnp.float32), self.group_num, self.eps
        )
        m = sv.mask.astype(jnp.float32)[:, None]
        cnt = jnp.maximum(jnp.sum(m), 1.0)
        x2 = jnp.sum(x * x * m, axis=0) / cnt
        if self.axis_name is not None:
            x2 = jax.lax.pmean(x2, self.axis_name)
        if train:
            it = iters.value + 1
            phi = jax.lax.stop_gradient(running_phi.value)
            use_batch = it <= self.warmup_iters
            denom = jnp.where(use_batch, x2, phi)
            z = x / jnp.sqrt(denom + self.eps)
            if not self.is_initializing():
                warm_phi = phi * (it - 1) / it + x2 / it
                new_phi = jnp.where(it < self.warmup_iters, warm_phi, phi)
                running_phi.value = (
                    self.alpha_fwd * new_phi + (1 - self.alpha_fwd) * x2
                )
                iters.value = it
        else:
            z = x / jnp.sqrt(running_phi.value + self.eps)
        out = (weight * z + bias).astype(sv.feats.dtype)
        return sv.replace(feats=out)


def convert_powernorm_state(bn_params: dict, bn_stats: dict):
    """BN->PN state transform: scale/bias carry over; running_phi starts
    from the BN running variance (reference convert_powernorm :291-329)."""
    params = dict(bn_params)
    stats = {
        "running_phi": bn_stats.get("var"),
        "iters": 0,
    }
    return params, stats
