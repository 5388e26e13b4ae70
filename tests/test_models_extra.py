"""FCNN / PointNet / DGCNN / ResUNet2 model-family tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_downstream_tpu.models import get_model
from tests.test_models_mink import make_field


def _init_apply(model, field, train=False):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    v = model.init(rngs, field, train=False)
    return model.apply(v, field, train=train), v


def test_minkowski_fcnn(rng):
    field = make_field(rng, n_valid=200, capacity=256, c=3, span=32)
    model = get_model(name="MinkowskiFCNN", in_channel=3, out_channel=40,
                      num_batches=2, embedding_channel=64,
                      channels=(8, 8, 8, 8, 8))
    out, _ = _init_apply(model, field)
    assert out.shape == (2, 40)
    assert np.isfinite(np.asarray(out)).all()


def test_minkowski_splat_fcnn(rng):
    field = make_field(rng, n_valid=150, capacity=192, c=3, span=32)
    model = get_model(name="MinkowskiSplatFCNN", in_channel=3, out_channel=10,
                      num_batches=2, embedding_channel=32,
                      channels=(8, 8, 8, 8, 8))
    out, _ = _init_apply(model, field)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_minkowski_pointnet(rng):
    field = make_field(rng, n_valid=100, capacity=128, c=3)
    model = get_model(name="MinkowskiPointNet", in_channel=3, out_channel=40,
                      num_batches=2, embedding_channel=64)
    out, _ = _init_apply(model, field)
    assert out.shape == (2, 40)


def test_dense_pointnet(rng):
    from nerf_downstream_tpu.models.mink.pointnet import PointNet

    model = PointNet(out_channel=40, embedding_channel=64)
    x = jnp.asarray(rng.normal(size=(2, 128, 3)), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    v = model.init(rngs, x, train=False)
    assert model.apply(v, x, train=False).shape == (2, 40)


def test_dgcnn_cls(rng):
    model = get_model(name="DGCNN_cls", in_channel=3, out_channel=40, k=8)
    x = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    v = model.init(rngs, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (2, 40)


def test_dgcnn_semseg(rng):
    model = get_model(name="DGCNN_semseg", in_channel=3, out_channel=13, k=8)
    x = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    v = model.init(rngs, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (2, 64, 13)


def test_knn_correct(rng):
    from nerf_downstream_tpu.models.mink.dgcnn import knn

    x = jnp.asarray(rng.normal(size=(1, 32, 3)), jnp.float32)
    idx = np.asarray(knn(x, 4))[0]
    xs = np.asarray(x)[0]
    for i in range(32):
        d = np.sum((xs - xs[i]) ** 2, -1)
        expect = set(np.argsort(d)[:4])
        assert set(idx[i]) == expect


def test_resunet2_variants(rng):
    field = make_field(rng, n_valid=150, capacity=192, c=3, span=16)
    for name in ["ResUNetBN2C", "ResUNetIN2"]:
        model = get_model(
            name=name, in_channel=3, out_channel=16, num_batches=2,
            channels=(8, 8, 8, 8), tr_channels=(8, 8, 8, 8),
        )
        out, _ = _init_apply(model, field)
        assert out.feats.shape == (192, 16)
        assert np.isfinite(np.asarray(out.feats)).all()


def test_resunet2_normalized_features(rng):
    field = make_field(rng, n_valid=100, capacity=128, c=3, span=16)
    model = get_model(
        name="ResUNetBN2", in_channel=3, out_channel=8, num_batches=2,
        channels=(8, 8, 8, 8), tr_channels=(8, 8, 8, 8),
        normalize_feature=True,
    )
    out, _ = _init_apply(model, field)
    norms = np.linalg.norm(np.asarray(out.feats), axis=1)
    valid = np.asarray(out.mask)
    np.testing.assert_allclose(norms[valid], 1.0, rtol=1e-4)


def test_interpolate_exact_on_grid(rng):
    """Interpolating at exact voxel centers returns the voxel features."""
    from nerf_downstream_tpu.ops.interpolate import interpolate
    from nerf_downstream_tpu.sparse.types import PointField
    from tests.test_ops import full_grid_sv

    sv = full_grid_sv(rng, side=4, cin=3)
    field = PointField(
        coords=sv.coords.astype(jnp.float32),
        feats=jnp.zeros((sv.capacity, 3)),
        mask=sv.mask,
    )
    out = interpolate(sv.coords, sv.mask, sv.feats, 1, field)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(sv.feats), rtol=1e-5, atol=1e-6
    )
