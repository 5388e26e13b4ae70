"""PowerNorm for sparse voxel rows (reference
co3d_3d/src/models/mink/modules/powernorm.py:24-329).

Normalization by the running second moment instead of batch mean/var:
- GroupScaling1D: per-row, per-group second-moment scaling (:24-49);
- forward: z = x / sqrt(phi + eps) where phi is the running mean-square
  during inference and the batch mean-square during warmup (:52-97);
- running_phi EMA with ``alpha_fwd``; warmup averaging for the first
  ``warmup_iters`` steps.

The reference's custom backward (PowerFunction.backward, :99-139) applies an
EMA correction: g' = g - (1 - abkw) * ema_gz * z, divides by the *batch*
second moment (even after warmup, when the forward divided by the running
one), and updates the ``ema_gz`` buffer *during the backward pass*.
``_power_core`` reproduces this with a ``jax.custom_vjp``. The backward-time
buffer mutation has no functional slot in JAX, so the new ``ema_gz`` value is
smuggled out as the cotangent of the ``ema_gz`` input: the train step
differentiates w.r.t. the ``ema_gz`` leaves of ``batch_stats`` and writes the
returned "gradient" back as the new state (see
``train/modules.py::split_ema_state``).

``convert_powernorm`` mirrors the BN->PN converter (:291-329) as a
state-dict transform.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_downstream_tpu.sparse.types import SparseVoxels


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _power_core(x, weight, bias, denom, var_batch, ema_gz, mask_f,
                eps, axis_name):
    """y = weight * x / sqrt(denom + eps) + bias, with the reference's
    EMA-corrected backward (abkw baked into the closure via partial in the
    module; see ``_power_core_bwd``)."""
    z = x * jax.lax.rsqrt(denom + eps)
    return weight * z + bias


def _power_core_fwd(x, weight, bias, denom, var_batch, ema_gz, mask_f,
                    eps, axis_name):
    z = x * jax.lax.rsqrt(denom + eps)
    return weight * z + bias, (z, var_batch, weight, ema_gz, mask_f)


_ABKW = 0.9  # alpha_bkw; the reference never overrides the default


def _power_core_bwd(eps, axis_name, res, gy):
    """Reference PowerFunction.backward (:99-139), masked-row form:

    - g = gy * weight; g' = g - (1 - abkw) * ema_gz * z;
    - new ema_gz = ema_gz + mean_rows(g' * z) — returned as the cotangent of
      the ema_gz input (the buffer's backward-time update);
    - d_x = g' / sqrt(var_batch + eps) — the *batch* moment, matching the
      reference even when the forward normalized by the running phi;
    - d_weight = sum(gy * z), d_bias = sum(gy); no gradient flows into the
      normalization statistics (the reference returns None for them).

    Row means/sums are over valid rows only (the reference runs on ME's
    dynamically-sized tensors, which have no padding rows) and are
    pmean/psum-reduced across the data axis when ``axis_name`` is set, so
    replicated state stays replicated under shard_map.
    """
    z, var_batch, weight, ema_gz, mask_f = res
    m = mask_f[:, None]
    cnt = jnp.maximum(jnp.sum(mask_f), 1.0)
    g = gy * weight
    approx = g - (1.0 - _ABKW) * ema_gz * z
    delta = jnp.sum(approx * z * m, axis=0)
    if axis_name is not None:
        delta = jax.lax.psum(delta, axis_name)
        cnt = jax.lax.psum(cnt, axis_name)
    new_ema = ema_gz + delta / cnt
    d_x = approx * jax.lax.rsqrt(var_batch + eps) * m
    d_weight = jnp.sum(gy * z * m, axis=0)
    d_bias = jnp.sum(gy * m, axis=0)
    return (
        d_x,
        d_weight,
        d_bias,
        jnp.zeros_like(var_batch),  # denom
        jnp.zeros_like(var_batch),  # var_batch
        new_ema,  # smuggled state update (NOT a gradient)
        jnp.zeros_like(mask_f),
    )


_power_core.defvjp(_power_core_fwd, _power_core_bwd)


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
        ema_gz = self.variable(
            "batch_stats", "ema_gz", lambda: jnp.zeros((c,), jnp.float32)
        )
        feats2d = sv.feats.reshape(-1, c)  # rows or flattened block cells
        x = group_scaling(
            feats2d.astype(jnp.float32), self.group_num, self.eps
        )
        mask_f = sv.mask.reshape(-1).astype(jnp.float32)
        m = mask_f[:, None]
        cnt = jnp.maximum(jnp.sum(m), 1.0)
        x2 = jnp.sum(jax.lax.stop_gradient(x * x) * m, axis=0) / cnt
        if self.axis_name is not None:
            x2 = jax.lax.pmean(x2, self.axis_name)
        if train:
            it = iters.value + 1
            phi = jax.lax.stop_gradient(running_phi.value)
            use_batch = it <= self.warmup_iters
            denom = jnp.where(use_batch, x2, phi)
            out = _power_core(
                x, weight, bias, denom, x2, ema_gz.value, mask_f,
                self.eps, self.axis_name,
            )
            if not self.is_initializing():
                warm_phi = phi * (it - 1) / it + x2 / it
                new_phi = jnp.where(it < self.warmup_iters, warm_phi, phi)
                running_phi.value = (
                    self.alpha_fwd * new_phi + (1 - self.alpha_fwd) * x2
                )
                iters.value = it
        else:
            z = x / jnp.sqrt(running_phi.value + self.eps)
            out = weight * z + bias
        out = out.astype(sv.feats.dtype).reshape(sv.feats.shape)
        from nerf_downstream_tpu.ops.block_resident import BlockVoxels

        if isinstance(sv, BlockVoxels):  # keep unoccupied cells zero
            out = jnp.where(sv.mask[..., None], out, 0)
        return sv.replace(feats=out)


def convert_powernorm_state(bn_params: dict, bn_stats: dict):
    """BN->PN state transform: scale/bias carry over; running_phi starts
    from the BN running variance (reference convert_powernorm :291-329)."""
    params = dict(bn_params)
    var = bn_stats.get("var")
    stats = {
        "running_phi": var,
        "iters": 0,
        "ema_gz": jnp.zeros_like(var),
    }
    return params, stats
