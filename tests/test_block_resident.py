"""Block-resident levels: whole-model parity vs the row path, level
transitions (k2/s2 conv, transpose conv, pool), and the overflow guard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_downstream_tpu import config as cfg
from nerf_downstream_tpu.data.plenoxel import make_synthetic_scene
from nerf_downstream_tpu.sparse.types import PointField, SparseVoxels


def _field(rng, batches=2, n_voxels=1200, cap=4096, c=4, reso=32):
    coords = np.zeros((cap, 4), np.float32)
    mask = np.zeros(cap, bool)
    feats = np.zeros((cap, c), np.float32)
    ofs = 0
    for b in range(batches):
        sc = make_synthetic_scene(
            rng, n_voxels=n_voxels, reso=(reso,) * 3, surface=True
        )
        n = len(sc["coords"])
        coords[ofs : ofs + n, 0] = b
        coords[ofs : ofs + n, 1:] = sc["coords"]
        mask[ofs : ofs + n] = True
        feats[ofs : ofs + n] = rng.normal(size=(n, c))
        ofs += n
    return PointField(
        coords=jnp.asarray(coords),
        feats=jnp.asarray(feats),
        mask=jnp.asarray(mask),
    ), mask


@pytest.fixture(autouse=True)
def _clean_cfg():
    cfg.clear_config()
    yield
    cfg.clear_config()


def _set_mode(method=None, divisor=2, extent=64, extra=""):
    s = f"CoordinateContext.grid_extent = {extent}\n"
    if method:
        s += (
            f'CoordinateContext.method = "{method}"\n'
            f"CoordinateContext.block_cap_divisor = {divisor}\n"
        )
    cfg.parse_config(s + extra)


def test_model_forward_matches_row(rng):
    from nerf_downstream_tpu.models import get_model

    field, mask = _field(rng)
    model = get_model(
        name="Res16UNet14", out_channel=6, num_batches=2, planes=(8,) * 8
    )
    _set_mode()
    v = model.init(jax.random.PRNGKey(0), field, train=False)
    out_row = np.asarray(model.apply(v, field, train=False))
    _set_mode("block_resident")
    out_br = np.asarray(model.apply(v, field, train=False))
    np.testing.assert_allclose(out_br[mask], out_row[mask], rtol=2e-4, atol=2e-5)


def test_model_grads_and_bn_stats_match_row(rng):
    from nerf_downstream_tpu.models import get_model

    field, mask = _field(rng, n_voxels=800, cap=2048)
    labels = jnp.asarray(rng.integers(0, 6, field.capacity))
    model = get_model(
        name="Res16UNet14", out_channel=6, num_batches=2, planes=(8,) * 8
    )

    def run(method):
        _set_mode(method)
        v = model.init(jax.random.PRNGKey(0), field, train=True)

        def loss_fn(params):
            out, upd = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                field, train=True, mutable=["batch_stats"],
            )
            logp = jax.nn.log_softmax(out)
            pick = jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]
            l = -jnp.sum(jnp.where(field.mask, pick, 0)) / jnp.sum(field.mask)
            return l, upd

        (l, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(v["params"])
        return l, g, upd

    l_row, g_row, u_row = run(None)
    l_br, g_br, u_br = run("block_resident")
    np.testing.assert_allclose(float(l_br), float(l_row), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_row),
                    jax.tree_util.tree_leaves(g_br)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5
        )
    for a, b in zip(jax.tree_util.tree_leaves(u_row),
                    jax.tree_util.tree_leaves(u_br)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6
        )


def test_bottleneck_and_bias_variant_matches_row(rng):
    """Bottleneck blocks exercise 1x1 convs on resident cells."""
    from nerf_downstream_tpu.models import get_model

    field, mask = _field(rng, n_voxels=600, cap=2048)
    model = get_model(
        name="Res16UNet50", out_channel=5, num_batches=2, planes=(4,) * 8,
        layers=(1,) * 8,
    )
    _set_mode()
    v = model.init(jax.random.PRNGKey(1), field, train=False)
    out_row = np.asarray(model.apply(v, field, train=False))
    _set_mode("block_resident")
    out_br = np.asarray(model.apply(v, field, train=False))
    np.testing.assert_allclose(out_br[mask], out_row[mask], rtol=2e-4, atol=2e-5)


def test_level_transition_ops_match_row_path(rng):
    """k2/s2 conv, its transpose, and k2/s2 pooling: in-block implementations
    vs the kernel-map row path, standalone."""
    import flax.linen as nn

    from nerf_downstream_tpu.models.mink.layers import (
        SparseConv,
        SparseConvTranspose,
        SparsePool,
        as_rows,
    )
    from nerf_downstream_tpu.sparse.context import CoordinateContext

    sc = make_synthetic_scene(rng, n_voxels=2000, reso=(48,) * 3, surface=True)
    n = len(sc["coords"])
    cap = 4096
    coords = np.zeros((cap, 4), np.int32)
    coords[:n, 1:] = sc["coords"]
    mask = np.arange(cap) < n
    sv = SparseVoxels(
        coords=jnp.asarray(coords),
        feats=jnp.asarray(rng.normal(size=(cap, 8)).astype(np.float32)),
        mask=jnp.asarray(mask),
        stride=1,
    )

    class DownUp(nn.Module):
        mode: str = "conv"

        @nn.compact
        def __call__(self, sv, ctx):
            if self.mode == "pool":
                return as_rows(SparsePool(2, 2, "avg", name="p")(sv, ctx))
            down = SparseConv(6, 2, 2, name="down")(sv, ctx)
            if self.mode == "conv":
                return as_rows(down)
            up = SparseConvTranspose(5, 2, 2, name="up")(down, ctx, sv)
            return as_rows(up)

    for mode in ("conv", "convtr", "pool"):
        m = DownUp(mode=mode)
        _set_mode(extent=64)
        ctx = CoordinateContext(num_batches=1, grid_extent=64)
        v = m.init(jax.random.PRNGKey(2), sv, ctx)
        out_row = m.apply(v, sv, CoordinateContext(num_batches=1, grid_extent=64))
        _set_mode("block_resident", extent=64)
        ctx_b = CoordinateContext(
            num_batches=1, grid_extent=64, method="block_resident",
            block_cap_divisor=2,
        )
        out_br = m.apply(v, sv, ctx_b)
        if mode == "conv" or mode == "pool":
            # coarse coordinate sets are built identically (ctx.strided), so
            # rows align 1:1
            a, b = np.asarray(out_row.feats), np.asarray(out_br.feats)
            m_out = np.asarray(out_row.mask)
        else:
            a, b = np.asarray(out_row.feats), np.asarray(out_br.feats)
            m_out = mask
        np.testing.assert_allclose(
            b[m_out], a[m_out], rtol=1e-4, atol=1e-5, err_msg=mode
        )


def test_resnet_with_pool_and_strided_blocks_matches_row(rng):
    """ResNet exercises SparsePool k2/s2 in-block, stride-2 blocks whose
    main branch (k3/s2) falls back to rows while the k1/s2 shortcut stays
    block-resident (the mixed-representation residual-add path)."""
    from nerf_downstream_tpu.models import get_model

    field, mask = _field(rng, batches=1, n_voxels=1200, cap=2048)
    model = get_model(
        name="ResNet14", out_channel=6, num_batches=1, planes=(8, 8, 8, 8)
    )
    _set_mode()
    v = model.init(jax.random.PRNGKey(0), field, train=False)
    out_row = np.asarray(model.apply(v, field, train=False))
    _set_mode("block_resident", divisor=1)
    out_br = np.asarray(model.apply(v, field, train=False))
    np.testing.assert_allclose(out_br, out_row, rtol=2e-4, atol=2e-5)


def test_zaxis_mixed_representation_matches_row(rng):
    """sparse_mode=2 (ZAXIS) convs now run IN-BLOCK (conv3_zaxis_cells,
    two z-face halo slices) — the whole sparsified model stays resident and
    must match the row path exactly."""
    from nerf_downstream_tpu.models import get_model

    field, mask = _field(rng, batches=1, n_voxels=900, cap=2048)
    model = get_model(
        name="Res16UNet14", out_channel=5, num_batches=1, planes=(4,) * 8,
        sparse=[2] * 9,
    )
    _set_mode()
    v = model.init(jax.random.PRNGKey(0), field, train=False)
    out_row = np.asarray(model.apply(v, field, train=False))
    _set_mode("block_resident", divisor=1)
    out_br = np.asarray(model.apply(v, field, train=False))
    np.testing.assert_allclose(out_br[mask], out_row[mask], rtol=2e-4, atol=2e-5)


def test_zaxis_cells_grads_match_row(rng):
    """conv3_zaxis_cells fwd+grads == the row conv on the ZAXIS subset."""
    from nerf_downstream_tpu.models import get_model

    field, mask = _field(rng, batches=1, n_voxels=700, cap=1024)
    model = get_model(
        name="Res16UNet14", out_channel=5, num_batches=1, planes=(4,) * 8,
        sparse=[2] * 9,
    )
    lab = jnp.asarray(
        np.random.default_rng(5).integers(0, 5, field.capacity)
    )

    def loss(v, field):
        out = model.apply(v, field, train=False)
        logp = jax.nn.log_softmax(out.astype(jnp.float32), -1)
        pick = jnp.take_along_axis(logp, lab[:, None], axis=-1)[:, 0]
        return -jnp.sum(jnp.where(mask, pick, 0.0))

    _set_mode()
    v = model.init(jax.random.PRNGKey(0), field, train=False)
    g_row = jax.grad(loss)(v, field)
    _set_mode("block_resident", divisor=1)
    g_blk = jax.grad(loss)(v, field)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        ),
        g_row["params"], g_blk["params"],
    )


def test_bf16_compute_dtype_matches_row(rng):
    """The bench path runs bf16 cells end-to-end; parity within bf16 noise."""
    from nerf_downstream_tpu.models import get_model

    field, mask = _field(rng, batches=1, n_voxels=800, cap=2048)
    model = get_model(
        name="Res16UNet14", out_channel=6, num_batches=1, planes=(8,) * 8,
        compute_dtype=jnp.bfloat16,
    )
    _set_mode()
    v = model.init(jax.random.PRNGKey(0), field, train=False)
    out_row = np.asarray(model.apply(v, field, train=False), np.float32)
    _set_mode("block_resident")
    out_br = np.asarray(model.apply(v, field, train=False), np.float32)
    # bf16 accumulation-order noise; argmax agreement is the usable signal
    agree = (out_row[mask].argmax(-1) == out_br[mask].argmax(-1)).mean()
    assert agree > 0.99, agree


def test_overflow_poisons_output(rng):
    """A level whose blocks exceed the cap must fail loud (NaN), never train
    on silently-truncated inputs."""
    from nerf_downstream_tpu.models import get_model

    field, mask = _field(rng, batches=1, n_voxels=1500, cap=2048)
    model = get_model(
        name="Res16UNet14", out_channel=4, num_batches=1, planes=(4,) * 8
    )
    _set_mode("block_resident", extra="CoordinateContext.block_caps = (8, 8, 8, 8, 8)\n")
    v = model.init(jax.random.PRNGKey(0), field, train=False)
    out = np.asarray(model.apply(v, field, train=False))
    assert np.isnan(out[mask]).any()


def test_overflow_guard_disabled_is_clean(rng):
    from nerf_downstream_tpu.models import get_model

    field, mask = _field(rng, batches=1, n_voxels=800, cap=2048)
    model = get_model(
        name="Res16UNet14", out_channel=4, num_batches=1, planes=(4,) * 8
    )
    _set_mode("block_resident")
    v = model.init(jax.random.PRNGKey(0), field, train=False)
    out = np.asarray(model.apply(v, field, train=False))
    assert not np.isnan(out[mask]).any()


def test_block_caps_binding(rng):
    """Explicit per-level caps override the divisor formula."""
    from nerf_downstream_tpu.sparse.context import CoordinateContext

    sc = make_synthetic_scene(rng, n_voxels=500, reso=(32,) * 3, surface=True)
    n = len(sc["coords"])
    coords = np.zeros((1024, 4), np.int32)
    coords[:n, 1:] = sc["coords"]
    mask = np.arange(1024) < n
    ctx = CoordinateContext(
        num_batches=1, grid_extent=64, method="block_resident",
        block_caps=(200, 60),
    )
    l1 = ctx.block_layout(jnp.asarray(coords), jnp.asarray(mask), 1)
    assert l1.n_blocks == 200
    l2 = ctx.block_layout(jnp.asarray(coords * 2), jnp.asarray(mask), 2)
    assert l2.n_blocks == 60
    # strides past the list reuse the last cap
    l3 = ctx.block_layout(jnp.asarray(coords * 4), jnp.asarray(mask), 4)
    assert l3.n_blocks == 60
