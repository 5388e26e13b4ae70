"""2D+3D ensemble: forward, gradients, and a parallel step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_downstream_tpu.models.ensemble import Ensemble2D3D
from tests.test_models_mink import make_field


def _inputs(rng, b=2):
    images = jnp.asarray(rng.normal(size=(b, 32, 32, 3)), jnp.float32)
    field = make_field(rng, n_valid=100, capacity=128, c=4, batches=b)
    return images, field


def test_ensemble_forward_both_fusions(rng):
    images, field = _inputs(rng)
    for fusion in ("logit", "feature"):
        model = Ensemble2D3D(
            out_channel=11, num_batches=2, fusion=fusion
        )
        v = model.init(jax.random.PRNGKey(0), images, field, train=False)
        out = model.apply(v, images, field, train=False)
        assert out.shape == (2, 11)
        assert np.isfinite(np.asarray(out)).all()


def test_ensemble_grads_touch_both_branches(rng):
    images, field = _inputs(rng)
    model = Ensemble2D3D(out_channel=5, num_batches=2)
    v = model.init(jax.random.PRNGKey(0), images, field, train=False)

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            images, field, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out**2)

    g = jax.grad(loss)(v["params"])
    img_norm = sum(
        float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g["image"])
    )
    vox_norm = sum(
        float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g["voxel"])
    )
    assert img_norm > 0 and vox_norm > 0
