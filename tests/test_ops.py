"""Op-layer tests: sparse conv vs dense conv, adjointness, pooling, norms."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from nerf_downstream_tpu.ops.norm import (
    instance_norm_stats,
    layer_norm,
    masked_mean_var,
)
from nerf_downstream_tpu.ops.pool import global_pool, window_pool
from nerf_downstream_tpu.ops.sparse_conv import (
    sparse_conv_apply,
    sparse_conv_real_flops,
)
from nerf_downstream_tpu.sparse import (
    SparseVoxels,
    build_kernel_map,
    kernel_offsets,
    stride_coords,
)
from nerf_downstream_tpu.sparse.context import CoordinateContext, invert_kernel_map


def full_grid_sv(rng, side=4, cin=3, batches=1):
    coords = np.array(
        [
            (b, x, y, z)
            for b in range(batches)
            for x, y, z in itertools.product(range(side), repeat=3)
        ],
        np.int32,
    )
    n = len(coords)
    feats = rng.normal(size=(n, cin)).astype(np.float32)
    return SparseVoxels(
        coords=jnp.asarray(coords),
        feats=jnp.asarray(feats),
        mask=jnp.ones(n, bool),
        stride=1,
    )


def dense_conv_ref(sv, weights, offs, side):
    """Brute-force dense reference: out[o] = sum_d in[o+d] @ W[d]."""
    coords = np.asarray(sv.coords)
    feats = np.asarray(sv.feats)
    cin = feats.shape[1]
    cout = weights.shape[-1]
    grid = {}
    for i, c in enumerate(coords):
        grid[tuple(c)] = feats[i]
    out = {}
    for c in coords:
        acc = np.zeros(cout, np.float32)
        for k, d in enumerate(offs):
            q = (c[0], c[1] + d[0], c[2] + d[1], c[3] + d[2])
            if q in grid:
                acc += grid[q] @ np.asarray(weights)[k]
        out[tuple(c)] = acc
    return out


def test_conv_matches_dense_reference(rng):
    sv = full_grid_sv(rng, side=4, cin=3)
    offs = kernel_offsets(3, 1)
    w = rng.normal(size=(27, 3, 5)).astype(np.float32) * 0.2
    km = build_kernel_map(sv.coords, sv.mask, sv.coords, sv.mask, offs)
    out = np.asarray(sparse_conv_apply(sv.feats, km, jnp.asarray(w)))
    ref = dense_conv_ref(sv, w, offs, 4)
    coords = np.asarray(sv.coords)
    for i, c in enumerate(coords):
        np.testing.assert_allclose(out[i], ref[tuple(c)], rtol=1e-4, atol=1e-5)


def test_strided_conv_matches_dense(rng):
    sv = full_grid_sv(rng, side=4, cin=2)
    out_sv = stride_coords(sv, 2)
    offs = kernel_offsets(3, 1)
    w = rng.normal(size=(27, 2, 4)).astype(np.float32) * 0.2
    km = build_kernel_map(sv.coords, sv.mask, out_sv.coords, out_sv.mask, offs)
    out = np.asarray(sparse_conv_apply(sv.feats, km, jnp.asarray(w)))
    ref = dense_conv_ref(sv, w, offs, 4)  # stride-2 out at even coords == ref
    ocoords = np.asarray(out_sv.coords)
    omask = np.asarray(out_sv.mask)
    for i in range(len(ocoords)):
        if omask[i]:
            np.testing.assert_allclose(
                out[i], ref[tuple(ocoords[i])], rtol=1e-4, atol=1e-5
            )


def test_conv_transpose_is_adjoint(rng):
    """<conv(x), y> == <x, conv_tr(y)> when conv_tr uses W^T + adjoint map."""
    sv = full_grid_sv(rng, side=4, cin=3)
    coarse = stride_coords(sv, 2)
    offs = kernel_offsets(2, 1)
    w = rng.normal(size=(8, 3, 5)).astype(np.float32)
    km_f = build_kernel_map(sv.coords, sv.mask, coarse.coords, coarse.mask, offs)
    km_b = build_kernel_map(
        coarse.coords, coarse.mask, sv.coords, sv.mask, offs, transpose=True
    )
    x = sv.feats
    y = jnp.asarray(rng.normal(size=(sv.capacity, 5)).astype(np.float32))
    y = jnp.where(coarse.mask[:, None], y, 0)
    conv_x = sparse_conv_apply(x, km_f, jnp.asarray(w))
    wt = jnp.asarray(np.transpose(w, (0, 2, 1)))
    convt_y = sparse_conv_apply(y, km_b, wt)
    lhs = jnp.sum(conv_x * y)
    rhs = jnp.sum(x * convt_y)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


def test_inverted_map_equals_searched_transpose(rng):
    sv = full_grid_sv(rng, side=4, cin=1)
    coarse = stride_coords(sv, 2)
    offs = kernel_offsets(2, 1)
    km_f = build_kernel_map(sv.coords, sv.mask, coarse.coords, coarse.mask, offs)
    km_b = build_kernel_map(
        coarse.coords, coarse.mask, sv.coords, sv.mask, offs, transpose=True
    )
    km_inv = invert_kernel_map(km_f, sv.capacity)
    np.testing.assert_array_equal(np.asarray(km_b), np.asarray(km_inv))


def test_context_caches(rng):
    sv = full_grid_sv(rng, side=4, cin=1)
    ctx = CoordinateContext()
    c1 = ctx.strided(sv, 2)
    c2 = ctx.strided(sv, 2)
    assert c1 is c2
    offs = kernel_offsets(3, 1)
    m1 = ctx.kernel_map(sv.coords, sv.mask, c1.coords, c1.mask, offs)
    m2 = ctx.kernel_map(sv.coords, sv.mask, c1.coords, c1.mask, offs)
    assert m1 is m2


def test_window_pool(rng):
    sv = full_grid_sv(rng, side=4, cin=3)
    coarse = stride_coords(sv, 2)
    offs = kernel_offsets(2, 1)
    km = build_kernel_map(sv.coords, sv.mask, coarse.coords, coarse.mask, offs)
    for mode in ["sum", "avg", "max"]:
        out = np.asarray(window_pool(sv.feats, km, mode))
        coords = np.asarray(sv.coords)
        feats = np.asarray(sv.feats)
        grid = {tuple(c): feats[i] for i, c in enumerate(coords)}
        ocoords = np.asarray(coarse.coords)
        for i in range(len(ocoords)):
            if not np.asarray(coarse.mask)[i]:
                continue
            vals = []
            for d in offs:
                q = (
                    ocoords[i][0],
                    ocoords[i][1] + d[0],
                    ocoords[i][2] + d[1],
                    ocoords[i][3] + d[2],
                )
                if q in grid:
                    vals.append(grid[q])
            vals = np.stack(vals)
            exp = {
                "sum": vals.sum(0),
                "avg": vals.mean(0),
                "max": vals.max(0),
            }[mode]
            np.testing.assert_allclose(out[i], exp, rtol=1e-5, atol=1e-6)


def test_global_pool(rng):
    sv = full_grid_sv(rng, side=3, cin=4, batches=2)
    bid = sv.batch_ids(2)
    feats = np.asarray(sv.feats)
    for mode in ["sum", "avg", "max"]:
        out = np.asarray(global_pool(sv.feats, bid, 2, mode))
        for b in range(2):
            sel = feats[np.asarray(sv.coords)[:, 0] == b]
            exp = {"sum": sel.sum(0), "avg": sel.mean(0), "max": sel.max(0)}[
                mode
            ]
            np.testing.assert_allclose(out[b], exp, rtol=1e-5, atol=1e-5)


def test_masked_mean_var(rng):
    n, c = 32, 5
    feats = rng.normal(size=(n, c)).astype(np.float32)
    mask = np.arange(n) < 20
    mean, var = masked_mean_var(jnp.asarray(feats), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(mean), feats[:20].mean(0), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(var), feats[:20].var(0), rtol=1e-4, atol=1e-6
    )


def test_sync_batchnorm_psum_equals_global(rng):
    """Masked BN stats with axis_name over 8 shards == global stats."""
    import os

    feats = rng.normal(size=(64, 3)).astype(np.float32)
    mask = np.ones(64, bool)
    mask[60:] = False

    shards_f = feats.reshape(8, 8, 3)
    shards_m = mask.reshape(8, 8)

    def per_shard(f, m):
        return masked_mean_var(f, m, axis_name="d")

    mean, var = jax.pmap(per_shard, axis_name="d")(
        jnp.asarray(shards_f), jnp.asarray(shards_m)
    )
    g_mean, g_var = masked_mean_var(jnp.asarray(feats), jnp.asarray(mask))
    for i in range(8):
        np.testing.assert_allclose(np.asarray(mean[i]), np.asarray(g_mean), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(var[i]), np.asarray(g_var), rtol=1e-4, atol=1e-6
        )


def test_instance_norm_stats(rng):
    sv = full_grid_sv(rng, side=3, cin=2, batches=2)
    bid = sv.batch_ids(2)
    mean, var = instance_norm_stats(sv.feats, bid, 2)
    feats = np.asarray(sv.feats)
    b0 = np.asarray(sv.coords)[:, 0] == 0
    np.testing.assert_allclose(
        np.asarray(mean)[0], feats[b0].mean(0), rtol=1e-5
    )


def test_conv_grads_flow(rng):
    sv = full_grid_sv(rng, side=3, cin=2)
    offs = kernel_offsets(3, 1)
    w = jnp.asarray(rng.normal(size=(27, 2, 3)).astype(np.float32))
    km = build_kernel_map(sv.coords, sv.mask, sv.coords, sv.mask, offs)

    def loss(feats, w):
        return jnp.sum(sparse_conv_apply(feats, km, w) ** 2)

    gf, gw = jax.grad(loss, argnums=(0, 1))(sv.feats, w)
    assert np.isfinite(np.asarray(gf)).all()
    assert np.isfinite(np.asarray(gw)).all()
    assert float(jnp.abs(gw).sum()) > 0


def test_conv_custom_vjp_matches_autodiff(rng):
    """Custom VJP (gather recompute) == plain autodiff through einsum."""
    import jax

    sv = full_grid_sv(rng, side=4, cin=3)
    offs = kernel_offsets(3, 1)
    w = jnp.asarray(rng.normal(size=(27, 3, 5)).astype(np.float32))
    km = build_kernel_map(sv.coords, sv.mask, sv.coords, sv.mask, offs)
    g = jnp.asarray(rng.normal(size=(sv.capacity, 5)).astype(np.float32))

    def loss_custom(feats, w):
        return jnp.sum(sparse_conv_apply(feats, km, w) * g)

    def loss_ref(feats, w):
        feats_ext = jnp.concatenate([feats, jnp.zeros((1, 3))], 0)
        gathered = feats_ext[km]  # [K, N, Cin]
        out = jnp.einsum("knc,kcd->nd", gathered, w)
        return jnp.sum(out * g)

    gf1, gw1 = jax.grad(loss_custom, argnums=(0, 1))(sv.feats, w)
    gf2, gw2 = jax.grad(loss_ref, argnums=(0, 1))(sv.feats, w)
    np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf2), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4,
                               atol=1e-5)


def test_conv_inv_map_backward_matches(rng):
    """Gather-based backward (inverted map) == scatter-based backward."""
    import jax

    from nerf_downstream_tpu.sparse.context import CoordinateContext

    sv = full_grid_sv(rng, side=4, cin=3)
    coarse = stride_coords(sv, 2)
    offs = kernel_offsets(2, 1)
    w = jnp.asarray(rng.normal(size=(8, 3, 5)).astype(np.float32))
    km = build_kernel_map(sv.coords, sv.mask, coarse.coords, coarse.mask, offs)
    inv = build_kernel_map(
        coarse.coords, coarse.mask, sv.coords, sv.mask, offs, transpose=True
    )
    g = jnp.asarray(rng.normal(size=(sv.capacity, 5)).astype(np.float32))

    def loss_inv(feats, w):
        return jnp.sum(sparse_conv_apply(feats, km, w, inv_map=inv) * g)

    def loss_plain(feats, w):
        return jnp.sum(sparse_conv_apply(feats, km, w) * g)

    gi = jax.grad(loss_inv, argnums=(0, 1))(sv.feats, w)
    gp = jax.grad(loss_plain, argnums=(0, 1))(sv.feats, w)
    for a, b in zip(gi, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_flops_counting(rng):
    sv = full_grid_sv(rng, side=4, cin=3)
    offs = kernel_offsets(1, 1)
    km = build_kernel_map(sv.coords, sv.mask, sv.coords, sv.mask, offs)
    f = int(sparse_conv_real_flops(km, sv.capacity, 3, 5))
    assert f == 2 * 64 * 3 * 5
