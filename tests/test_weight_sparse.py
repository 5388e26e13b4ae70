"""Weight-sparse conv path: offset subsetting, ZAXIS mode, pruning utils."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_downstream_tpu.models.mink.layers import SparseConv
from nerf_downstream_tpu.ops.weight_sparse import (
    sparsity_stats,
    valid_offsets_from_weights,
    zaxis_offsets,
)
from nerf_downstream_tpu.sparse import kernel_offsets
from nerf_downstream_tpu.sparse.context import CoordinateContext
from tests.test_ops import full_grid_sv


def test_zaxis_offsets():
    offs = kernel_offsets(3, 1)
    z = zaxis_offsets(offs)
    assert z == (4, 13, 22)
    assert all((offs[i][0] == 0 and offs[i][1] == 0) for i in z)


def test_valid_offsets_from_weights(rng):
    w = rng.normal(size=(27, 4, 4)).astype(np.float32)
    w[[1, 5, 20]] = 0
    live = valid_offsets_from_weights(w)
    assert set(range(27)) - set(live) == {1, 5, 20}
    stats = sparsity_stats(w)
    assert stats["live_offsets"] == 24


def test_subset_conv_equals_zeroed_full(rng):
    """Conv with offset subset == full conv with those offsets zeroed."""
    sv = full_grid_sv(rng, side=4, cin=3)
    ctx = CoordinateContext()
    live = (0, 4, 13, 22, 26)

    full = SparseConv(5, 3, 1)
    sub = SparseConv(5, 3, 1, valid_offsets=live)
    v = full.init(jax.random.PRNGKey(0), sv, ctx)
    # zero all non-live offsets in the full conv's weights
    w = np.asarray(v["params"]["kernel"])
    wz = np.zeros_like(w)
    wz[list(live)] = w[list(live)]
    out_full = full.apply(
        {"params": {"kernel": jnp.asarray(wz)}}, sv, CoordinateContext()
    )
    out_sub = sub.apply({"params": v["params"]}, sv, CoordinateContext())
    np.testing.assert_allclose(
        np.asarray(out_full.feats), np.asarray(out_sub.feats),
        rtol=1e-5, atol=1e-5,
    )


def test_zaxis_conv_mode(rng):
    sv = full_grid_sv(rng, side=4, cin=3)
    conv = SparseConv(5, 3, 1, conv_mode=2)
    v = conv.init(jax.random.PRNGKey(0), sv, CoordinateContext())
    out = conv.apply(v, sv, CoordinateContext())
    assert out.feats.shape == (sv.capacity, 5)


def test_magnitude_prune_roundtrip(rng):
    from nerf_downstream_tpu.utils.prune import (
        count_parameters_tree,
        magnitude_prune,
    )

    params = {"layer": {"kernel": jnp.asarray(
        rng.normal(size=(27, 8, 8)).astype(np.float32)
    )}}
    pruned, masks = magnitude_prune(params, 0.5)
    counts = count_parameters_tree(pruned)
    assert counts["pruned"] >= int(27 * 8 * 8 * 0.5) - 1


def test_geometry_utils(rng):
    from nerf_downstream_tpu.utils import geometry as G

    pts = rng.normal(size=(100, 3))
    T = G.sample_random_trans(pts, rng)
    out = G.apply_transform(pts, T)
    assert np.allclose(out.mean(0), T[:3, :3] @ pts.mean(0) + T[:3, 3])
    # correspondences with itself at radius ~0
    corr = G.find_correspondences(pts, pts, 1e-9)
    assert len(corr) == 100
    idx, dist = G.chunked_nn_search(pts[:10], pts, chunk=8)
    np.testing.assert_array_equal(idx, np.arange(10))
    assert dist.max() < 1e-3
