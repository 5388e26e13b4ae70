"""Block-dense conv: forward + gradient parity vs the row path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_downstream_tpu.data.plenoxel import make_synthetic_scene
from nerf_downstream_tpu.ops.block_conv import (
    BLOCK,
    build_block_layout,
    block_conv3,
    densify,
    undensify,
)
from nerf_downstream_tpu.ops.sparse_conv import sparse_conv_apply
from nerf_downstream_tpu.sparse import build_kernel_map, kernel_offsets
from nerf_downstream_tpu.sparse.types import SparseVoxels


@pytest.fixture
def surface_sv(rng):
    sc = make_synthetic_scene(rng, n_voxels=3000, reso=(48, 48, 48),
                              surface=True)
    n = len(sc["coords"])
    cap = 4096
    coords = np.zeros((cap, 4), np.int32)
    coords[:n, 1:] = sc["coords"]
    # second batch element: shifted copy
    mask = np.arange(cap) < n
    feats = rng.normal(size=(cap, 16)).astype(np.float32)
    return SparseVoxels(
        coords=jnp.asarray(coords), feats=jnp.asarray(feats),
        mask=jnp.asarray(mask), stride=1,
    )


def test_block_conv_forward_matches_row(surface_sv, rng):
    sv = surface_sv
    offs = kernel_offsets(3, 1)
    w = jnp.asarray(rng.normal(size=(27, 16, 8)).astype(np.float32))
    km = build_kernel_map(sv.coords, sv.mask, sv.coords, sv.mask, offs)
    layout = build_block_layout(sv.coords, sv.mask, 1, 2048, 1, grid_extent=64)
    assert int(layout.overflow) == 0
    out_b = np.asarray(block_conv3(layout, sv.feats, sv.mask, w))
    out_r = np.asarray(sparse_conv_apply(sv.feats, km, w))
    m = np.asarray(sv.mask)
    np.testing.assert_allclose(out_b[m], out_r[m], rtol=1e-4, atol=1e-4)


def test_block_conv_grads_match_row(surface_sv, rng):
    sv = surface_sv
    offs = kernel_offsets(3, 1)
    w = jnp.asarray(rng.normal(size=(27, 16, 8)).astype(np.float32))
    km = build_kernel_map(sv.coords, sv.mask, sv.coords, sv.mask, offs)
    layout = build_block_layout(sv.coords, sv.mask, 1, 2048, 1, grid_extent=64)
    g = jnp.asarray(rng.normal(size=(sv.capacity, 8)).astype(np.float32))
    gm = g * sv.mask[:, None]

    gb = jax.grad(
        lambda f, w_: jnp.sum(block_conv3(layout, f, sv.mask, w_) * gm),
        argnums=(0, 1),
    )(sv.feats, w)
    gr = jax.grad(
        lambda f, w_: jnp.sum(sparse_conv_apply(f, km, w_) * gm),
        argnums=(0, 1),
    )(sv.feats, w)
    m = np.asarray(sv.mask)
    np.testing.assert_allclose(
        np.asarray(gb[0])[m], np.asarray(gr[0])[m], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gb[1]), np.asarray(gr[1]), rtol=1e-4, atol=1e-4
    )


def test_densify_roundtrip(surface_sv):
    sv = surface_sv
    layout = build_block_layout(sv.coords, sv.mask, 1, 2048, 1, grid_extent=64)
    dense = densify(layout, sv.feats, sv.mask)
    back = undensify(layout, dense, sv.capacity)
    m = np.asarray(sv.mask)
    np.testing.assert_allclose(
        np.asarray(back)[m], np.asarray(sv.feats)[m], rtol=1e-6
    )


def test_overflow_counted(rng):
    """With a tiny block cap, overflow rows are counted, not silently lost."""
    sc = make_synthetic_scene(rng, n_voxels=2000, reso=(48, 48, 48),
                              surface=True)
    n = len(sc["coords"])
    coords = np.zeros((2048, 4), np.int32)
    coords[:n, 1:] = sc["coords"]
    mask = np.arange(2048) < n
    layout = build_block_layout(
        jnp.asarray(coords), jnp.asarray(mask), 1, 8, 1, grid_extent=64
    )
    assert int(layout.overflow) > 0


def test_context_caps_no_overflow_surface_data(rng):
    """stride^-2-scaled caps (divisor 3) fit surface-shell data at every
    pyramid level — overflow silently drops rows, so caps must dominate
    the occupied-block counts (which thin ~quadratically with stride)."""
    from nerf_downstream_tpu.sparse.context import CoordinateContext
    from nerf_downstream_tpu.sparse.kernels import stride_coords

    sc = make_synthetic_scene(rng, n_voxels=6000, reso=(96, 96, 96),
                              surface=True)
    n = len(sc["coords"])
    cap = 8192
    coords = np.zeros((cap, 4), np.int32)
    coords[:n, 1:] = sc["coords"]
    mask = np.arange(cap) < n
    sv = SparseVoxels(
        coords=jnp.asarray(coords),
        feats=jnp.zeros((cap, 1), jnp.float32),
        mask=jnp.asarray(mask), stride=1,
    )
    ctx = CoordinateContext(num_batches=1, grid_extent=96, method="block",
                            block_cap_divisor=3)
    for _ in range(4):  # strides 1, 2, 4, 8
        layout = ctx.block_layout(sv.coords, sv.mask, sv.stride)
        assert int(layout.overflow) == 0, f"overflow at stride {sv.stride}"
        sv = stride_coords(sv, 2)


def test_model_forward_block_mode_matches_row(rng):
    """Res16UNet with CoordinateContext.method='block' == default path."""
    import jax
    from nerf_downstream_tpu import config as cfg
    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.data.plenoxel import make_synthetic_scene
    from nerf_downstream_tpu.sparse.types import PointField
    import jax.numpy as jnp

    cfg.clear_config()
    sc = make_synthetic_scene(rng, n_voxels=1500, reso=(32, 32, 32),
                              surface=True)
    n = len(sc["coords"])
    cap = 2048
    coords = np.zeros((cap, 4), np.float32)
    coords[:n, 1:] = sc["coords"]
    mask = np.arange(cap) < n
    field = PointField(
        coords=jnp.asarray(coords),
        feats=jnp.asarray(rng.normal(size=(cap, 4)).astype(np.float32)),
        mask=jnp.asarray(mask),
    )
    model = get_model(name="Res16UNet14", out_channel=6, num_batches=1,
                      planes=(4,) * 8)
    cfg.parse_config("CoordinateContext.grid_extent = 64")
    v = model.init(jax.random.PRNGKey(0), field, train=False)
    out_row = model.apply(v, field, train=False)
    cfg.parse_config(
        'CoordinateContext.method = "block"\n'
        "CoordinateContext.block_cap_divisor = 2\n"
    )
    out_block = model.apply(v, field, train=False)
    cfg.clear_config()
    np.testing.assert_allclose(
        np.asarray(out_row), np.asarray(out_block), rtol=1e-3, atol=1e-3
    )
