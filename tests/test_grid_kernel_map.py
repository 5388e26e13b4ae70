"""Dense-grid kernel-map builder == binary-search builder."""

import jax.numpy as jnp
import numpy as np
import pytest

from nerf_downstream_tpu import config as cfg
from nerf_downstream_tpu.sparse import build_kernel_map, kernel_offsets, stride_coords
from nerf_downstream_tpu.sparse.context import CoordinateContext
from nerf_downstream_tpu.sparse.kernels import (
    build_grid_index,
    build_kernel_map_grid,
)
from tests.test_sparse_core import make_sv


@pytest.fixture(autouse=True)
def _clean():
    cfg.clear_config()
    yield
    cfg.clear_config()


def _grid_map(sv_in, out_coords, out_mask, offs, extent=96, nb=2,
              transpose=False):
    grid, origin = build_grid_index(
        sv_in.coords, sv_in.mask, nb, extent, sv_in.stride
    )
    return build_kernel_map_grid(
        grid, origin, nb, extent, sv_in.stride, sv_in.capacity,
        out_coords, out_mask, offs, transpose,
    )


def test_grid_equals_search_same_level(rng):
    sv = make_sv(rng, n_valid=60, capacity=80, span=20)
    offs = kernel_offsets(3, 1)
    ref = build_kernel_map(sv.coords, sv.mask, sv.coords, sv.mask, offs)
    got = _grid_map(sv, sv.coords, sv.mask, offs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_grid_equals_search_strided(rng):
    sv = make_sv(rng, n_valid=60, capacity=80, span=16)
    out = stride_coords(sv, 2)
    offs = kernel_offsets(2, 1)
    ref = build_kernel_map(sv.coords, sv.mask, out.coords, out.mask, offs)
    got = _grid_map(sv, out.coords, out.mask, offs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_grid_equals_search_transpose(rng):
    """Coarse->fine: stride-2 input set, divisibility check must reject
    off-lattice queries."""
    sv = make_sv(rng, n_valid=60, capacity=80, span=16)
    coarse = stride_coords(sv, 2)
    offs = kernel_offsets(2, 1)
    ref = build_kernel_map(
        coarse.coords, coarse.mask, sv.coords, sv.mask, offs, transpose=True
    )
    got = _grid_map(coarse, sv.coords, sv.mask, offs, transpose=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_grid_negative_coords(rng):
    sv = make_sv(rng, n_valid=50, capacity=64, span=30)  # coords in [-30, 30)
    offs = kernel_offsets(3, 1)
    ref = build_kernel_map(sv.coords, sv.mask, sv.coords, sv.mask, offs)
    got = _grid_map(sv, sv.coords, sv.mask, offs, extent=96)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_context_grid_mode_model_forward(rng):
    """Full Res16UNet forward with the grid builder == search builder."""
    import jax

    from nerf_downstream_tpu.models import get_model
    from tests.test_models_mink import make_field

    field = make_field(rng, n_valid=150, capacity=192, c=4, span=16)
    model = get_model(
        name="Res16UNet14", out_channel=5, num_batches=2, planes=(4,) * 8
    )
    v = model.init(jax.random.PRNGKey(0), field, train=False)
    out_search = model.apply(v, field, train=False)
    # pin the row conv path: this test compares the two kernel-map BUILDERS
    # (grid vs search); with an extent configured, method "auto" would
    # otherwise switch the conv path to block_resident (whose tiny default
    # caps overflow on this scattered toy scene by design)
    cfg.parse_config(
        "CoordinateContext.grid_extent = 64\n"
        'CoordinateContext.method = "row"\n'
    )
    out_grid = model.apply(v, field, train=False)
    np.testing.assert_allclose(
        np.asarray(out_search), np.asarray(out_grid), rtol=1e-5, atol=1e-5
    )
