"""Positional encoding, EncodedRes16UNet, PowerNorm tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_downstream_tpu.models.mink.encoding import (
    encoded_out_channels,
    positional_encode,
)
from tests.test_models_mink import make_field


def test_positional_encode_shapes_and_values(rng):
    feats = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    out = positional_encode(feats, num_encoding_functions=4)
    assert out.shape == (10, encoded_out_channels(3, 4))
    assert out.shape == (10, 24)
    # first two columns for channel 0: sin(1*x), sin(2*x)
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.sin(np.asarray(feats[:, 0])), rtol=1e-5
    )
    # passthrough slice
    out2 = positional_encode(
        feats, 2, include_original_channel_range=(0, 3)
    )
    assert out2.shape == (10, 3 * 4 + 3)
    np.testing.assert_allclose(np.asarray(out2[:, -3:]), np.asarray(feats))
    # disabled
    out3 = positional_encode(feats, 0)
    assert out3 is feats


def test_encoded_res16unet_forward(rng):
    from nerf_downstream_tpu.models import get_model

    field = make_field(rng, n_valid=120, capacity=160, c=3)
    model = get_model(
        name="EncodedRes16UNet", out_channel=8, num_batches=2,
        planes=(4,) * 8, enc_planes=(8, 8), dec_planes=(8, 8),
    )
    v = model.init(jax.random.PRNGKey(0), field, train=False)
    out = model.apply(v, field, train=False)
    assert out.shape == (160, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_powernorm(rng):
    from nerf_downstream_tpu.models.mink.powernorm import MinkPowerNorm
    from nerf_downstream_tpu.sparse.types import SparseVoxels

    n, c = 64, 8
    sv = SparseVoxels(
        coords=jnp.zeros((n, 4), jnp.int32),
        feats=jnp.asarray(rng.normal(size=(n, c)).astype(np.float32) * 3),
        mask=jnp.asarray(np.arange(n) < 50),
        stride=1,
    )
    pn = MinkPowerNorm(warmup_iters=5)
    v = pn.init(jax.random.PRNGKey(0), sv, train=True)
    out, mut = pn.apply(v, sv, train=True, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out.feats)).all()
    assert int(mut["batch_stats"]["iters"]) == 1
    # eval path uses running phi
    out_eval = pn.apply(
        {"params": v["params"], "batch_stats": mut["batch_stats"]},
        sv, train=False,
    )
    assert np.isfinite(np.asarray(out_eval.feats)).all()


def test_make_norm_pn(rng):
    from nerf_downstream_tpu.models.mink.layers import make_norm
    from nerf_downstream_tpu.models.mink.powernorm import MinkPowerNorm

    assert isinstance(make_norm("PN"), MinkPowerNorm)
