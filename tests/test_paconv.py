"""PAConv op + model tests: custom VJP vs naive einsum reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_downstream_tpu.ops.paconv import (
    assign_score_withk,
    assign_score_withk_halfkernel,
    assign_score_withk_reference,
)


def make_inputs(rng, b=2, n=16, np_=16, k=4, m=3, o=5):
    scores = jnp.asarray(rng.normal(size=(b, n, k, m)), jnp.float32)
    points = jnp.asarray(rng.normal(size=(b, np_, m, o)), jnp.float32)
    centers = jnp.asarray(rng.normal(size=(b, n, m, o)), jnp.float32)
    knn_idx = jnp.asarray(rng.integers(0, np_, (b, n, k)), jnp.int32)
    return scores, points, centers, knn_idx


def test_forward_matches_reference(rng):
    scores, points, centers, idx = make_inputs(rng)
    out = assign_score_withk(scores, points, centers, idx)
    ref = assign_score_withk_reference(scores, points, centers, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)
    out_h = assign_score_withk_halfkernel(scores, points, idx)
    ref_h = assign_score_withk_reference(scores, points, None, idx)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref_h),
                               rtol=1e-4, atol=1e-5)


def test_backward_matches_reference(rng):
    scores, points, centers, idx = make_inputs(rng)
    g = jnp.asarray(rng.normal(size=(2, 16, 5)), jnp.float32)

    def loss_c(s, p, c):
        return jnp.sum(assign_score_withk(s, p, c, idx) * g)

    def loss_r(s, p, c):
        return jnp.sum(assign_score_withk_reference(s, p, c, idx) * g)

    gc = jax.grad(loss_c, argnums=(0, 1, 2))(scores, points, centers)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(scores, points, centers)
    for a, b in zip(gc, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_paconv_pointnet_forward(rng):
    from nerf_downstream_tpu.models import get_model

    model = get_model(name="PAConvPointNet", in_channel=3, out_channel=40,
                      k=8, num_matrices=(4, 4, 4))
    x = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    v = model.init(rngs, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (2, 40)
    assert np.isfinite(np.asarray(out)).all()


def test_paconv_dgcnn_forward(rng):
    from nerf_downstream_tpu.models import get_model

    model = get_model(name="PAConvDGCNN", in_channel=3, out_channel=40,
                      k=8, num_matrices=(4, 4, 4, 4))
    x = jnp.asarray(rng.normal(size=(2, 48, 3)), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    v = model.init(rngs, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (2, 40)


def test_paconv_pointnet_grads(rng):
    from nerf_downstream_tpu.models import get_model

    model = get_model(name="PAConvPointNet", in_channel=3, out_channel=4,
                      k=4, num_matrices=(2, 2, 2))
    x = jnp.asarray(rng.normal(size=(2, 32, 3)), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    v = model.init(rngs, x, train=False)

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.sum(out**2)

    grads = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0
