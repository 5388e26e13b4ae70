"""Model-family forward/backward smoke + structure tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_downstream_tpu.models import get_model
from nerf_downstream_tpu.sparse.types import PointField


def make_field(rng, n_valid=150, capacity=192, c=3, span=16, batches=2):
    coords = np.zeros((capacity, 4), np.float32)
    lin = rng.choice(batches * span**3, size=n_valid, replace=False)
    coords[:n_valid, 0] = lin // span**3
    rem = lin % span**3
    coords[:n_valid, 1] = rem // span**2
    coords[:n_valid, 2] = (rem // span) % span
    coords[:n_valid, 3] = rem % span
    feats = rng.normal(size=(capacity, c)).astype(np.float32)
    mask = np.arange(capacity) < n_valid
    return PointField(
        coords=jnp.asarray(coords),
        feats=jnp.asarray(feats),
        mask=jnp.asarray(mask),
    )


def test_resnet14_forward(rng):
    field = make_field(rng)
    model = get_model(name="ResNet14", out_channel=51, num_batches=2)
    vars_ = model.init(jax.random.PRNGKey(0), field, train=False)
    logits = model.apply(vars_, field, train=False)
    assert logits.shape == (2, 51)
    assert np.isfinite(np.asarray(logits)).all()


def test_resnet14_train_step_grads(rng):
    field = make_field(rng, c=4)
    model = get_model(name="ResNet14", out_channel=5, num_batches=2)
    vars_ = model.init(jax.random.PRNGKey(0), field, train=False)

    def loss_fn(params):
        logits, new_state = model.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            field,
            train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(logits**2)

    g = jax.grad(loss_fn)(vars_["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_res16unet14a_forward(rng):
    field = make_field(rng, n_valid=150, capacity=192, c=27)
    model = get_model(name="Res16UNet14A", out_channel=20, num_batches=2)
    vars_ = model.init(jax.random.PRNGKey(0), field, train=False)
    logits = model.apply(vars_, field, train=False)
    # per-point logits
    assert logits.shape == (192, 20)
    assert np.isfinite(np.asarray(logits)).all()


def test_res16unet_insseg_heads(rng):
    field = make_field(rng, n_valid=100, capacity=128, c=3)
    model = get_model(name="Res16UNet14AIns", out_channel=20, num_batches=2)
    vars_ = model.init(jax.random.PRNGKey(0), field, train=False)
    offsets, logits = model.apply(vars_, field, train=False)
    assert offsets.shape == (128, 3)
    assert logits.shape == (128, 20)


def test_variant_tables():
    from nerf_downstream_tpu.models.mink.res16unet import VARIANTS

    assert VARIANTS["Res16UNet34C"]["planes"] == (32, 64, 128, 256, 256, 128, 96, 96)
    assert VARIANTS["Res16UNet14B3"]["layers"] == (2, 2, 2, 2, 1, 1, 1, 1)
    assert VARIANTS["Res16UNet18AIns"]["insseg"] is True


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        get_model(name="NoSuchNet", out_channel=2)
