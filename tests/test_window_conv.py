"""Windowed one-hot gather conv vs the row gather conv (exact parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_downstream_tpu import config as cfg
from nerf_downstream_tpu.ops.sparse_conv import sparse_conv_apply
from nerf_downstream_tpu.ops.window_conv import (
    build_plan,
    group_offsets,
    window_conv_apply,
)
from nerf_downstream_tpu.sparse import kernel_offsets
from nerf_downstream_tpu.sparse.context import CoordinateContext
from nerf_downstream_tpu.sparse.types import PointField, SparseVoxels


@pytest.fixture(autouse=True)
def _clean():
    cfg.clear_config()
    yield
    cfg.clear_config()


def make_sorted_sv(rng, n=1024, valid=900, c=12, extent=24, batches=2):
    """Random surface-ish coords in sorted key order (via field_to_sparse)."""
    from nerf_downstream_tpu.sparse.kernels import field_to_sparse

    pts = rng.integers(0, extent, (valid, 3)).astype(np.float32)
    coords = np.zeros((n, 4), np.float32)
    coords[:valid, 1:] = pts
    coords[:valid, 0] = rng.integers(0, batches, valid)
    feats = rng.normal(size=(n, c)).astype(np.float32)
    mask = np.arange(n) < valid
    field = PointField(
        coords=jnp.asarray(coords), feats=jnp.asarray(feats),
        mask=jnp.asarray(mask),
    )
    sv, _ = field_to_sparse(field, voxel_size=1.0)
    return sv


def _maps(sv, out_sv, offs, ctx):
    km = ctx.kernel_map(
        sv.coords, sv.mask, out_sv.coords, out_sv.mask, offs,
        in_stride=sv.stride,
    )
    inv = ctx.kernel_map(
        out_sv.coords, out_sv.mask, sv.coords, sv.mask, offs,
        transpose=True, in_stride=out_sv.stride,
    )
    return km, inv


def test_group_offsets_k3():
    offs = kernel_offsets(3, 1)
    groups = group_offsets(offs)
    assert len(groups) == 9 and all(len(g) == 3 for g in groups)
    # members of one group differ only in dz
    for g in groups:
        xy = {tuple(offs[i][:2]) for i in g}
        assert len(xy) == 1
        assert sorted(offs[i][2] for i in g) == [-1, 0, 1]


def test_window_conv_matches_row_conv(rng):
    sv = make_sorted_sv(rng)
    offs = kernel_offsets(3, 1)
    ctx = CoordinateContext(num_batches=2, grid_extent=32)
    km, inv = _maps(sv, sv, offs, ctx)
    w = rng.normal(size=(27, 12, 16)).astype(np.float32) * 0.1
    b = rng.normal(size=(16,)).astype(np.float32)

    ref = sparse_conv_apply(sv.feats, km, jnp.asarray(w), jnp.asarray(b))
    plan = build_plan(km, sv.capacity, offs, tile=128, window=512)
    inv_plan = build_plan(inv, sv.capacity, offs, tile=128, window=512)
    assert int(plan.n_escaped) == 0, int(plan.n_escaped)
    got = window_conv_apply(
        sv.feats, plan, inv_plan, jnp.asarray(w), jnp.asarray(b)
    )
    m = np.asarray(sv.mask)
    np.testing.assert_allclose(
        np.asarray(got)[m], np.asarray(ref)[m], rtol=1e-5, atol=1e-5
    )


def test_window_conv_grads_match_row_conv(rng):
    sv = make_sorted_sv(rng, n=512, valid=420, c=8, extent=16)
    offs = kernel_offsets(3, 1)
    ctx = CoordinateContext(num_batches=2, grid_extent=32)
    km, inv = _maps(sv, sv, offs, ctx)
    w = jnp.asarray(rng.normal(size=(27, 8, 8)).astype(np.float32) * 0.1)
    plan = build_plan(km, sv.capacity, offs, tile=128, window=512)
    inv_plan = build_plan(inv, sv.capacity, offs, tile=128, window=512)
    mask = sv.mask

    def loss_win(feats, w):
        out = window_conv_apply(feats, plan, inv_plan, w)
        return jnp.sum(jnp.where(mask[:, None], out, 0) ** 2)

    def loss_row(feats, w):
        out = sparse_conv_apply(feats, km, w, inv_map=inv)
        return jnp.sum(jnp.where(mask[:, None], out, 0) ** 2)

    gw_f, gw_w = jax.grad(loss_win, argnums=(0, 1))(sv.feats, w)
    gr_f, gr_w = jax.grad(loss_row, argnums=(0, 1))(sv.feats, w)
    np.testing.assert_allclose(
        np.asarray(gw_f)[np.asarray(mask)],
        np.asarray(gr_f)[np.asarray(mask)], rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(gw_w), np.asarray(gr_w), rtol=1e-4, atol=1e-4
    )


def test_window_conv_strided_and_transpose(rng):
    """k2/s2 down map and its k2 transpose both ride monotone windows."""
    from nerf_downstream_tpu.sparse.kernels import stride_coords

    sv = make_sorted_sv(rng, n=512, valid=400, c=8, extent=16)
    ctx = CoordinateContext(num_batches=2, grid_extent=32)
    out_sv = stride_coords(sv, 2)
    offs = kernel_offsets(2, 1)
    km, inv = _maps(sv, out_sv, offs, ctx)
    w = jnp.asarray(rng.normal(size=(8, 8, 6)).astype(np.float32) * 0.2)
    ref = sparse_conv_apply(sv.feats, km, w)
    plan = build_plan(km, sv.capacity, offs, tile=128, window=512)
    inv_plan = build_plan(inv, sv.capacity, offs, tile=128, window=512)
    assert int(plan.n_escaped) == 0
    got = window_conv_apply(sv.feats, plan, inv_plan, w)
    m = np.asarray(out_sv.mask)
    np.testing.assert_allclose(
        np.asarray(got)[m], np.asarray(ref)[m], rtol=1e-5, atol=1e-5
    )

    # transpose: coarse -> fine onto the cached finer set
    coarse = SparseVoxels(
        coords=out_sv.coords,
        feats=jnp.asarray(rng.normal(size=(512, 6)).astype(np.float32)),
        mask=out_sv.mask, stride=out_sv.stride,
    )
    offs_t = kernel_offsets(2, 1)
    km_t = ctx.kernel_map(
        coarse.coords, coarse.mask, sv.coords, sv.mask, offs_t,
        transpose=True, in_stride=coarse.stride,
    )
    inv_t = ctx.kernel_map(
        sv.coords, sv.mask, coarse.coords, coarse.mask, offs_t,
        transpose=False, in_stride=sv.stride,
    )
    w_t = jnp.asarray(rng.normal(size=(8, 6, 5)).astype(np.float32) * 0.2)
    ref_t = sparse_conv_apply(coarse.feats, km_t, w_t)
    plan_t = build_plan(km_t, coarse.capacity, offs_t, tile=128, window=512)
    invp_t = build_plan(inv_t, sv.capacity, offs_t, tile=128, window=512)
    got_t = window_conv_apply(coarse.feats, plan_t, invp_t, w_t)
    m = np.asarray(sv.mask)
    np.testing.assert_allclose(
        np.asarray(got_t)[m], np.asarray(ref_t)[m], rtol=1e-5, atol=1e-5
    )


def test_shift_keys_matches_repack(rng):
    """key(coord + d) == shift_keys(key(coord), offset_delta(d)) for every
    3^3 offset, including carries across the z->y and y->x field borders."""
    from nerf_downstream_tpu.sparse import packing

    coords = rng.integers(-40, 40, (300, 4)).astype(np.int32)
    coords[:, 0] = rng.integers(0, 5, 300)
    # rows straddling field borders (z/y near 0 crosses the bias boundary)
    coords[:50, 3] = 0
    coords[50:100, 2] = 0
    mask = np.ones(300, bool)
    mask[280:] = False
    hi, lo = packing.pack(jnp.asarray(coords), jnp.asarray(mask))
    for d in kernel_offsets(3, 1):
        d_hi, d_lo = packing.offset_delta(d)
        q_hi, q_lo = packing.shift_keys(hi, lo, d_hi, d_lo,
                                        mask=jnp.asarray(mask))
        shifted = coords.copy()
        shifted[:, 1:] += np.asarray(d)
        r_hi, r_lo = packing.pack(jnp.asarray(shifted), jnp.asarray(mask))
        np.testing.assert_array_equal(
            np.asarray(q_hi)[mask], np.asarray(r_hi)[mask]
        )
        np.testing.assert_array_equal(
            np.asarray(q_lo)[mask], np.asarray(r_lo)[mask]
        )
        # invalid rows must match nothing, incl. sorted INVALID padding
        assert (np.asarray(q_hi)[~mask] == 0xFFFFFFFF).all()
        assert (np.asarray(q_lo)[~mask] != 0xFFFFFFFF).all()


@pytest.mark.quick
def test_plan_direct_matches_plan_from_map(rng):
    """build_plan_direct (sorted-key matching, no kernel map) must convolve
    identically to the kernel-map-derived plan, fwd and grads."""
    from nerf_downstream_tpu.ops.window_conv import build_plan_direct

    sv = make_sorted_sv(rng, n=1024, valid=900, c=12, extent=24)
    offs = kernel_offsets(3, 1)
    ctx = CoordinateContext(num_batches=2, grid_extent=32)
    km, inv = _maps(sv, sv, offs, ctx)
    plan_ref = build_plan(km, sv.capacity, offs, tile=128, window=128)
    inv_ref = build_plan(inv, sv.capacity, offs, tile=128, window=128)
    plan = build_plan_direct(sv.coords, sv.mask, offs, tile=128, window=128)
    inv_plan = build_plan_direct(
        sv.coords, sv.mask, offs, tile=128, window=128, transpose=True
    )
    assert int(plan.n_escaped) == 0 and int(inv_plan.n_escaped) == 0
    # idx semantics must agree entry-by-entry: same neighbor (relative to
    # each plan's own starts) or same absence. idx is tile-major
    # [G, nT, M, T]; absolute rank = start[g, t] + idx[g, t, m, :].
    def absolute(p):
        idxa = np.asarray(p.idx).astype(np.int64)
        st = np.asarray(p.starts)[:, :, None, None]
        return np.where(idxa >= 0, idxa + st, -1)

    for p_ref, p_new in [(plan_ref, plan), (inv_ref, inv_plan)]:
        np.testing.assert_array_equal(absolute(p_ref), absolute(p_new))

    w = jnp.asarray(rng.normal(size=(27, 12, 16)).astype(np.float32) * 0.1)

    def loss(feats, weights, p, ip):
        out = window_conv_apply(feats, p, ip, weights)
        return jnp.sum(jnp.where(sv.mask[:, None], out, 0) ** 2)

    got = window_conv_apply(sv.feats, plan, inv_plan, w)
    ref = window_conv_apply(sv.feats, plan_ref, inv_ref, w)
    m = np.asarray(sv.mask)
    np.testing.assert_allclose(
        np.asarray(got)[m], np.asarray(ref)[m], rtol=1e-5, atol=1e-5
    )
    gf, gw = jax.grad(
        lambda f, ww: loss(f, ww, plan, inv_plan), argnums=(0, 1)
    )(sv.feats, w)
    rgf, rgw = jax.grad(
        lambda f, ww: loss(f, ww, plan_ref, inv_ref), argnums=(0, 1)
    )(sv.feats, w)
    np.testing.assert_allclose(
        np.asarray(gf)[m], np.asarray(rgf)[m], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gw), np.asarray(rgw), rtol=1e-4, atol=1e-4
    )


def test_plan_direct_cross_set_down_and_transpose(rng):
    """Cross-set window plans (table != query set): a k2/s2 down conv and
    its k2 transpose match the kernel-map row conv, fwd and grads — the
    machinery that removes block layouts from the hybrid path entirely."""
    from nerf_downstream_tpu.ops.window_conv import build_plan_direct
    from nerf_downstream_tpu.sparse.kernels import stride_coords

    sv = make_sorted_sv(rng, n=512, valid=400, c=8, extent=16)
    ctx = CoordinateContext(num_batches=2, grid_extent=32)
    out_sv = stride_coords(sv, 2)
    offs = kernel_offsets(2, 1)
    km, inv = _maps(sv, out_sv, offs, ctx)
    w = jnp.asarray(rng.normal(size=(8, 8, 6)).astype(np.float32) * 0.2)

    # down: fine table, coarse queries — expanding map widens coverage
    plan = build_plan_direct(
        sv.coords, sv.mask, offs, tile=64, window=64, blocks=6,
        out_coords=out_sv.coords, out_mask=out_sv.mask,
    )
    inv_plan = build_plan_direct(
        out_sv.coords, out_sv.mask, offs, tile=128, window=64, blocks=4,
        transpose=True, out_coords=sv.coords, out_mask=sv.mask,
    )
    assert int(plan.n_escaped) == 0 and int(inv_plan.n_escaped) == 0

    def loss_win(feats, weights):
        out = window_conv_apply(feats, plan, inv_plan, weights)
        return jnp.sum(jnp.where(out_sv.mask[:, None], out, 0) ** 2)

    def loss_row(feats, weights):
        out = sparse_conv_apply(feats, km, weights, inv_map=inv)
        return jnp.sum(jnp.where(out_sv.mask[:, None], out, 0) ** 2)

    got = window_conv_apply(sv.feats, plan, inv_plan, w)
    ref = sparse_conv_apply(sv.feats, km, w)
    m = np.asarray(out_sv.mask)
    np.testing.assert_allclose(
        np.asarray(got)[m], np.asarray(ref)[m], rtol=1e-5, atol=1e-5
    )
    gw = jax.grad(loss_win, argnums=(0, 1))(sv.feats, w)
    gr = jax.grad(loss_row, argnums=(0, 1))(sv.feats, w)
    mi = np.asarray(sv.mask)
    np.testing.assert_allclose(
        np.asarray(gw[0])[mi], np.asarray(gr[0])[mi], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gw[1]), np.asarray(gr[1]), rtol=1e-4, atol=1e-4
    )

    # transpose: coarse table feats -> fine outputs; inverse IS the down
    # plan (same offsets array, flipped roles)
    cfeats = jnp.asarray(rng.normal(size=(512, 6)).astype(np.float32))
    km_t = ctx.kernel_map(
        out_sv.coords, out_sv.mask, sv.coords, sv.mask, offs,
        transpose=True, in_stride=out_sv.stride,
    )
    inv_t = ctx.kernel_map(
        sv.coords, sv.mask, out_sv.coords, out_sv.mask, offs,
        transpose=False, in_stride=sv.stride,
    )
    w_t = jnp.asarray(rng.normal(size=(8, 6, 5)).astype(np.float32) * 0.2)
    plan_t = build_plan_direct(
        out_sv.coords, out_sv.mask, offs, tile=128, window=64, blocks=4,
        transpose=True, out_coords=sv.coords, out_mask=sv.mask,
    )
    invp_t = build_plan_direct(
        sv.coords, sv.mask, offs, tile=64, window=64, blocks=6,
        out_coords=out_sv.coords, out_mask=out_sv.mask,
    )
    ref_t = sparse_conv_apply(cfeats, km_t, w_t, inv_map=inv_t)
    got_t = window_conv_apply(cfeats, plan_t, invp_t, w_t)
    mf = np.asarray(sv.mask)
    np.testing.assert_allclose(
        np.asarray(got_t)[mf], np.asarray(ref_t)[mf], rtol=1e-5, atol=1e-5
    )

    def loss_win_t(feats, weights):
        out = window_conv_apply(feats, plan_t, invp_t, weights)
        return jnp.sum(jnp.where(sv.mask[:, None], out, 0) ** 2)

    def loss_row_t(feats, weights):
        out = sparse_conv_apply(feats, km_t, weights, inv_map=inv_t)
        return jnp.sum(jnp.where(sv.mask[:, None], out, 0) ** 2)

    gw_t = jax.grad(loss_win_t, argnums=(0, 1))(cfeats, w_t)
    gr_t = jax.grad(loss_row_t, argnums=(0, 1))(cfeats, w_t)
    mc = np.asarray(out_sv.mask)
    np.testing.assert_allclose(
        np.asarray(gw_t[0])[mc], np.asarray(gr_t[0])[mc],
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(gw_t[1]), np.asarray(gr_t[1]), rtol=1e-4, atol=1e-4
    )


def test_level_caps_truncation_poisons(rng):
    """stride_coords_capped slices coarse levels to the configured cap;
    a cap below the unique count reports lost rows and ctx.level_poison
    NaNs the level's features (fail loud, never silent truncation)."""
    from nerf_downstream_tpu.sparse.kernels import stride_coords_capped

    sv = make_sorted_sv(rng, n=512, valid=400, c=4, extent=16)
    out, lost = stride_coords_capped(sv, 2, cap=256)
    n_unique = int(jnp.sum(stride_coords_capped(sv, 2, None)[0].mask))
    assert out.capacity == 256
    if n_unique > 256:
        assert int(lost) == n_unique - 256
    # generous cap: nothing lost, mask count preserved
    out2, lost2 = stride_coords_capped(sv, 2, cap=512)
    assert int(lost2) == 0 and int(jnp.sum(out2.mask)) == n_unique

    ctx = CoordinateContext(
        num_batches=2, grid_extent=32, level_caps=(512, 64),
    )
    tiny = ctx.strided(sv, 2)  # cap 64 — certainly overflows
    assert tiny.capacity == 64
    feats = jnp.ones((64, 3), jnp.float32)
    poisoned = ctx.level_poison(tiny.coords, feats)
    assert np.isnan(np.asarray(poisoned)).all()


@pytest.mark.quick
def test_level_cap_decay_derivation(rng):
    """level_cap_decay derives per-level caps from the input capacity:
    0.5x per stride doubling, rounded up to window_tile multiples, floored
    at one tile — and absolute level_caps always win."""
    ctx = CoordinateContext(
        num_batches=2, grid_extent=64, window_tile=256, level_cap_decay=0.5,
    )
    assert ctx.level_cap(2, in_capacity=65536, in_stride=1) == 32768
    assert ctx.level_cap(4, in_capacity=32768, in_stride=2) == 16384
    # rounding up to a tile multiple
    assert ctx.level_cap(2, in_capacity=1000, in_stride=1) == 512
    # floor: one tile
    assert ctx.level_cap(16, in_capacity=512, in_stride=1) == 256
    # no shrink past the input capacity
    assert ctx.level_cap(2, in_capacity=128, in_stride=1) == 128
    # absolute caps win over decay
    ctx2 = CoordinateContext(
        num_batches=2, grid_extent=64, level_caps=(4096, 1024),
        level_cap_decay=0.5,
    )
    assert ctx2.level_cap(2, in_capacity=65536, in_stride=1) == 1024
    # end to end: strided() derives the cap and records any overflow
    from nerf_downstream_tpu.sparse.kernels import stride_coords_capped

    sv = make_sorted_sv(rng, n=512, valid=400, c=4, extent=16)
    out = ctx.strided(sv, 2)
    assert out.capacity == 256
    n_unique = int(jnp.sum(stride_coords_capped(sv, 2, None)[0].mask))
    assert int(ctx._level_overflow[id(out.coords)]) == max(0, n_unique - 256)


def test_model_forward_hybrid_level_caps_matches_row(rng):
    """Full Res16UNet forward under the fully-windowed hybrid with
    per-level row caps == row path (generous caps, zero loss)."""
    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.models.interface import process_input

    n, valid = 2048, 1800
    pts = rng.integers(0, 24, (valid, 3)).astype(np.float32)
    coords = np.zeros((n, 4), np.float32)
    coords[:valid, 1:] = pts
    coords[:valid, 0] = rng.integers(0, 2, valid)
    feats = rng.normal(size=(n, 6)).astype(np.float32)
    mask = np.arange(n) < valid
    batch = {
        "coordinates": coords, "features": feats, "mask": mask,
        "labels": rng.integers(0, 5, n).astype(np.int32),
    }

    outs = {}
    for method, extra in [
        ("row", ""),
        ("hybrid", "CoordinateContext.level_caps = (2048, 2048, 1024, 512, 512)\n"),
    ]:
        cfg.clear_config()
        cfg.parse_config(
            "CoordinateContext.grid_extent = 64\n"
            f'CoordinateContext.method = "{method}"\n'
            "CoordinateContext.window_tile = 128\n"
            "CoordinateContext.window_size = 1024\n" + extra
        )
        model = get_model(
            name="Res16UNet14", out_channel=5, num_batches=2,
            planes=(8,) * 8,
        )
        field = process_input(batch)
        variables = model.init(jax.random.PRNGKey(0), field, train=False)
        out = model.apply(variables, field, train=False)
        outs[method] = np.asarray(out)
    assert np.isfinite(outs["hybrid"][mask]).all()
    np.testing.assert_allclose(
        outs["hybrid"][mask], outs["row"][mask], rtol=2e-4, atol=2e-4
    )


def test_match_pallas_interpret_matches_xla(rng, monkeypatch):
    """window_match_pallas (interpret mode) == the XLA find-based idx."""
    from jax.experimental.pallas import tpu as pltpu

    from nerf_downstream_tpu.ops.window_conv import build_plan_direct
    from nerf_downstream_tpu.ops.pallas.window_gather import (
        window_match_pallas,
    )
    from nerf_downstream_tpu.sparse import packing

    monkeypatch.setenv("NDT_WINDOW_PALLAS", "0")
    sv = make_sorted_sv(rng, n=512, valid=430, c=4, extent=16)
    offs = kernel_offsets(3, 1)
    for transpose in (False, True):
        plan = build_plan_direct(
            sv.coords, sv.mask, offs, tile=64, window=64, transpose=transpose
        )
        hi, lo = packing.pack(sv.coords, sv.mask)
        o = -offs if transpose else offs
        perm = list(plan.perm)
        g_count, nt, m, t = plan.idx.shape

        # the kernel shifts query keys in-register from static 64-bit
        # delta words (int32 views) — build them the way the plan builder
        # does and check bit-parity with shift_keys-based XLA matching
        def i32(v):
            v = int(v) & 0xFFFFFFFF
            return v - (1 << 32) if v >= (1 << 31) else v

        deltas_gm = []
        for g in range(g_count):
            row = []
            for j in range(m):
                d_hi, d_lo = packing.offset_delta(o[perm[g * m + j]])
                d64 = ((d_hi << 32) + d_lo) & ((1 << 64) - 1)
                row.append((i32(d64 >> 32), i32(d64)))
            deltas_gm.append(tuple(row))
        with pltpu.force_tpu_interpret_mode():
            got = window_match_pallas(
                hi, lo, hi, lo, sv.mask, tuple(deltas_gm), plan.starts,
                plan.tile, plan.window,
            )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(plan.idx))


@pytest.mark.quick
def test_plan_idx_well_formed(rng):
    """Plan idx entries are in-window (-1 or [0, coverage)) and the
    consecutive-dz structure of full k^3 groups holds on sorted keys
    (a sanity property of the key ordering; the kernels no longer
    require it — they consume idx directly)."""
    from nerf_downstream_tpu.ops.window_conv import build_plan_direct
    from nerf_downstream_tpu.sparse.kernels import stride_coords

    sv = make_sorted_sv(rng, n=1024, valid=900, c=4, extent=20)
    out_sv = stride_coords(sv, 2)
    cases = [
        build_plan_direct(sv.coords, sv.mask, kernel_offsets(3, 1),
                          tile=128, window=256),
        build_plan_direct(sv.coords, sv.mask, kernel_offsets(3, 1),
                          tile=128, window=256, transpose=True),
        build_plan_direct(sv.coords, sv.mask, kernel_offsets(2, 1),
                          tile=64, window=64, blocks=6,
                          out_coords=out_sv.coords, out_mask=out_sv.mask),
    ]
    for plan in cases:
        assert int(plan.n_escaped) == 0
        idx = np.asarray(plan.idx)
        cov = plan.blocks * plan.window
        assert idx.min() >= -1 and idx.max() < cov
        # full k^3 same-set groups: valid members sit at consecutive ranks
        # (member axis is 2 in the tile-major [G, nT, M, T] layout)
        if idx.shape[2] == 3:
            valid = idx >= 0
            lo = np.where(valid, idx, 1 << 30).min(axis=2)
            span = np.where(valid, idx, -1).max(axis=2) - lo
            both = valid.sum(axis=2) >= 2
            assert (span[both] < 3).all()


def test_escape_poisons(rng):
    """A window too small for the data must NaN-poison, never truncate."""
    sv = make_sorted_sv(rng, n=512, valid=480, c=4, extent=12)
    offs = kernel_offsets(3, 1)
    ctx = CoordinateContext(num_batches=2, grid_extent=32)
    km, inv = _maps(sv, sv, offs, ctx)
    w = jnp.asarray(rng.normal(size=(27, 4, 4)).astype(np.float32))
    plan = build_plan(km, sv.capacity, offs, tile=128, window=16)
    inv_plan = build_plan(inv, sv.capacity, offs, tile=128, window=16)
    assert int(plan.n_escaped) > 0
    out = window_conv_apply(sv.feats, plan, inv_plan, w)
    assert np.isnan(np.asarray(out)).any()


def test_pallas_kernels_match_xla(rng, monkeypatch):
    """Interpret-mode run of the Pallas window kernels == XLA formulation."""
    from jax.experimental.pallas import tpu as pltpu

    from nerf_downstream_tpu.ops import window_conv as wc
    from nerf_downstream_tpu.ops.pallas.window_gather import (
        window_dw_pallas,
        window_gather_matmul_pallas,
    )

    monkeypatch.setenv("NDT_WINDOW_PALLAS", "0")  # XLA reference path
    sv = make_sorted_sv(rng, n=512, valid=420, c=8, extent=16)
    offs = kernel_offsets(3, 1)
    ctx = CoordinateContext(num_batches=2, grid_extent=32)
    km, _ = _maps(sv, sv, offs, ctx)
    tile, window = 64, 128
    plan = build_plan(km, sv.capacity, offs, tile=tile, window=window)
    assert int(plan.n_escaped) == 0
    w = jnp.asarray(rng.normal(size=(27, 8, 8)).astype(np.float32) * 0.1)
    g_count = plan.starts.shape[0]
    m = plan.idx.shape[2]
    w_perm = w[jnp.asarray(plan.perm)].reshape(g_count, m, 8, 8)
    feats_pad = jnp.concatenate(
        [sv.feats, jnp.zeros((2 * window, 8), sv.feats.dtype)], axis=0
    )

    ref = wc._window_gather_matmul(
        feats_pad, plan.starts, plan.idx, w_perm, plan.tile,
        plan.window, jnp.float32,
    )
    with pltpu.force_tpu_interpret_mode():
        got = window_gather_matmul_pallas(
            feats_pad, plan.starts, plan.idx, w_perm,
            plan.tile, plan.window, jnp.float32,
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )

    g_out = jnp.asarray(rng.normal(size=(512, 8)).astype(np.float32))
    ref_dw = wc._window_dw(
        feats_pad, plan.starts, plan.idx, g_out, plan.tile,
        plan.window, jnp.float32,
    )
    with pltpu.force_tpu_interpret_mode():
        got_dw = window_dw_pallas(
            feats_pad, plan.starts, plan.idx, g_out, plan.tile,
            plan.window, jnp.float32,
        )
    np.testing.assert_allclose(
        np.asarray(got_dw), np.asarray(ref_dw), rtol=1e-5, atol=1e-5
    )


def test_fused_backward_pallas_matches_xla(rng, monkeypatch):
    """window_bwd_pallas (fused d_feats + d_w, interpret mode) == the two
    XLA fallback passes, on a same-set k3 plan pair."""
    from jax.experimental.pallas import tpu as pltpu

    from nerf_downstream_tpu.ops import window_conv as wc
    from nerf_downstream_tpu.ops.pallas.window_gather import (
        window_bwd_pallas,
    )

    monkeypatch.setenv("NDT_WINDOW_PALLAS", "0")
    sv = make_sorted_sv(rng, n=512, valid=420, c=8, extent=16)
    offs = kernel_offsets(3, 1)
    ctx = CoordinateContext(num_batches=2, grid_extent=32)
    km, inv = _maps(sv, sv, offs, ctx)
    tile, window = 64, 128
    plan = build_plan(km, sv.capacity, offs, tile=tile, window=window)
    inv_plan = build_plan(inv, sv.capacity, offs, tile=tile, window=window)
    assert int(plan.n_escaped) == 0 and int(inv_plan.n_escaped) == 0
    cout = 6
    w = jnp.asarray(rng.normal(size=(27, 8, cout)).astype(np.float32) * 0.1)
    g_count = plan.starts.shape[0]
    m = plan.idx.shape[2]
    w_perm = w[jnp.asarray(plan.perm)].reshape(g_count, m, 8, cout)
    w_t = jnp.swapaxes(w_perm, -1, -2)
    feats_pad = jnp.concatenate(
        [sv.feats, jnp.zeros((2 * window, 8), sv.feats.dtype)], axis=0
    )
    g_out = jnp.asarray(rng.normal(size=(512, cout)).astype(np.float32))
    g_pad = jnp.concatenate(
        [g_out, jnp.zeros((2 * window, cout), g_out.dtype)], axis=0
    )

    ref_din = wc._window_gather_matmul(
        g_pad, inv_plan.starts, inv_plan.idx, w_t,
        inv_plan.tile, window, jnp.float32,
    )[:512]
    ref_dw = wc._window_dw(
        feats_pad, plan.starts, plan.idx, g_out, plan.tile,
        window, jnp.float32,
    )
    with pltpu.force_tpu_interpret_mode():
        got_din, got_dw = window_bwd_pallas(
            g_pad, feats_pad[:512], inv_plan.starts, inv_plan.idx,
            w_t, inv_plan.tile, window, jnp.float32,
        )
    np.testing.assert_allclose(
        np.asarray(got_din), np.asarray(ref_din), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_dw), np.asarray(ref_dw), rtol=1e-5, atol=1e-5
    )


def test_model_forward_hybrid_matches_row(rng):
    """Full Res16UNet forward: method='hybrid' (windowed s1 convs inside a
    block-resident model, the 'auto' default) == row path."""
    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.models.interface import process_input

    n, valid = 2048, 1800
    pts = rng.integers(0, 24, (valid, 3)).astype(np.float32)
    coords = np.zeros((n, 4), np.float32)
    coords[:valid, 1:] = pts
    coords[:valid, 0] = rng.integers(0, 2, valid)
    feats = rng.normal(size=(n, 6)).astype(np.float32)
    mask = np.arange(n) < valid
    batch = {
        "coordinates": coords, "features": feats, "mask": mask,
        "labels": rng.integers(0, 5, n).astype(np.int32),
    }

    outs = {}
    for method in ("row", "hybrid"):
        cfg.clear_config()
        cfg.parse_config(
            "CoordinateContext.grid_extent = 64\n"
            f'CoordinateContext.method = "{method}"\n'
            "CoordinateContext.block_cap_divisor = 1\n"
            "CoordinateContext.window_tile = 128\n"
            "CoordinateContext.window_size = 1024\n"
        )
        model = get_model(
            name="Res16UNet14", out_channel=5, num_batches=2,
            planes=(8,) * 8,
        )
        field = process_input(batch)
        variables = model.init(jax.random.PRNGKey(0), field, train=False)
        out = model.apply(variables, field, train=False)
        outs[method] = np.asarray(out)
    np.testing.assert_allclose(
        outs["hybrid"][mask], outs["row"][mask], rtol=2e-4, atol=2e-4
    )


def test_model_forward_window_matches_row(rng):
    """Full Res16UNet forward: method='window' == row path."""
    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.sparse.types import PointField

    n, valid = 2048, 1800
    pts = rng.integers(0, 48, (valid, 3)).astype(np.float32)
    coords = np.zeros((n, 4), np.float32)
    coords[:valid, 1:] = pts
    coords[:valid, 0] = rng.integers(0, 2, valid)
    feats = rng.normal(size=(n, 6)).astype(np.float32)
    mask = np.arange(n) < valid
    batch = {
        "coordinates": coords, "features": feats, "mask": mask,
        "labels": rng.integers(0, 5, n).astype(np.int32),
    }

    outs = {}
    for method in ("row", "window"):
        cfg.clear_config()
        cfg.parse_config(
            "CoordinateContext.grid_extent = 64\n"
            f'CoordinateContext.method = "{method}"\n'
            "CoordinateContext.window_tile = 128\n"
            "CoordinateContext.window_size = 1024\n"
        )
        model = get_model(
            name="Res16UNet14", out_channel=5, num_batches=2,
            planes=(8,) * 8,
        )
        from nerf_downstream_tpu.models.interface import process_input

        field = process_input(batch)
        variables = model.init(jax.random.PRNGKey(0), field, train=False)
        out = model.apply(variables, field, train=False)
        outs[method] = np.asarray(out)
    np.testing.assert_allclose(
        outs["window"][mask], outs["row"][mask], rtol=2e-4, atol=2e-4
    )


def test_transpose_plan_relabeling_matches_build(rng):
    """transpose_plan (static group/member relabeling of the forward plan)
    == build_plan_direct(transpose=True), field for field, on a same-set
    k3 plan; and asymmetric offset subsets return None."""
    from nerf_downstream_tpu.ops.window_conv import (
        build_plan_direct,
        negation_perm,
        transpose_plan,
    )

    sv = make_sorted_sv(rng, n=512, valid=430, c=4, extent=20)
    offs = kernel_offsets(3, 1)
    fwd = build_plan_direct(sv.coords, sv.mask, offs, tile=64, window=128)
    ref = build_plan_direct(
        sv.coords, sv.mask, offs, tile=64, window=128, transpose=True
    )
    got = transpose_plan(fwd, offs)
    assert got is not None
    np.testing.assert_array_equal(np.asarray(got.starts), np.asarray(ref.starts))
    np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(ref.idx))
    assert int(got.n_escaped) == int(ref.n_escaped)
    assert got.perm == ref.perm and got.tile == ref.tile
    # an asymmetric subset (e.g. dz in {0, 1} only) has no negation perm
    asym = np.asarray([[0, 0, 0], [0, 0, 1]], np.int32)
    assert negation_perm(asym) is None


def _row_ref(sv, offs, ctx, w, b=None):
    km = ctx.kernel_map(
        sv.coords, sv.mask, sv.coords, sv.mask, offs, in_stride=sv.stride
    )
    return sparse_conv_apply(sv.feats, km, jnp.asarray(w), b)


@pytest.mark.quick
def test_escape_fallback_matches_row_conv(rng):
    """Tiny coverage forces window escapes; with escape_cap > 0 the
    fallback entry list must reproduce the row conv EXACTLY (forward and
    both gradients) instead of poisoning."""
    from nerf_downstream_tpu.ops.window_conv import (
        build_plan_direct,
        transpose_plan,
        window_conv_apply,
    )

    sv = make_sorted_sv(rng, n=1024, valid=900, c=8, extent=12, batches=2)
    offs = kernel_offsets(3, 1)
    ctx = CoordinateContext(num_batches=2, grid_extent=16)
    tile, window, blocks = 64, 32, 2  # cov 64: dense extent-12 set escapes
    strict = build_plan_direct(
        sv.coords, sv.mask, offs, tile=tile, window=window, blocks=blocks
    )
    assert int(strict.n_escaped) > 0, "workload must actually escape"
    fwd = build_plan_direct(
        sv.coords, sv.mask, offs, tile=tile, window=window, blocks=blocks,
        escape_cap=4096, escape_tiles=160,
    )
    assert int(fwd.n_escaped) == 0, "fallback capacity must absorb escapes"
    assert int(jnp.sum(fwd.esc_j >= 0)) > 0
    inv = transpose_plan(fwd, offs)

    w = jnp.asarray(rng.normal(size=(27, 8, 6)).astype(np.float32) * 0.1)
    ref = _row_ref(sv, offs, ctx, w)

    def win_fn(w_, feats_):
        out = window_conv_apply(
            feats_, fwd, inv, w_, compute_dtype=jnp.float32
        )
        return out

    got = win_fn(w, sv.feats)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )

    cot = jnp.asarray(rng.normal(size=got.shape).astype(np.float32))

    def loss_win(w_, feats_):
        return jnp.sum(win_fn(w_, feats_) * cot)

    def loss_row(w_, feats_):
        km = ctx.kernel_map(
            sv.coords, sv.mask, sv.coords, sv.mask, offs, in_stride=1
        )
        return jnp.sum(sparse_conv_apply(feats_, km, w_, None) * cot)

    gw_w, gf_w = jax.grad(loss_win, argnums=(0, 1))(w, sv.feats)
    gw_r, gf_r = jax.grad(loss_row, argnums=(0, 1))(w, sv.feats)
    np.testing.assert_allclose(
        np.asarray(gw_w), np.asarray(gw_r), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gf_w), np.asarray(gf_r), rtol=1e-4, atol=1e-5
    )


def test_escape_fallback_overflow_poisons(rng):
    """A cap too small for the true escape count must still poison."""
    from nerf_downstream_tpu.ops.window_conv import build_plan_direct

    sv = make_sorted_sv(rng, n=1024, valid=900, c=8, extent=12, batches=2)
    offs = kernel_offsets(3, 1)
    fwd = build_plan_direct(
        sv.coords, sv.mask, offs, tile=64, window=32, blocks=2,
        escape_cap=2, escape_tiles=160,
    )
    assert int(fwd.n_escaped) > 0


def test_escape_fallback_model_forward_matches_row(rng):
    """Full Res16UNet hybrid forward with a deliberately tight window +
    escape caps == the row path (context-level wiring incl. per-level
    caps and the transpose relabeling of the escape list)."""
    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.models.interface import process_input

    n, valid = 2048, 1800
    pts = rng.integers(0, 24, (valid, 3)).astype(np.float32)
    coords = np.zeros((n, 4), np.float32)
    coords[:valid, 1:] = pts
    coords[:valid, 0] = rng.integers(0, 2, valid)
    feats = rng.normal(size=(n, 6)).astype(np.float32)
    mask = np.arange(n) < valid
    batch = {
        "coordinates": coords, "features": feats, "mask": mask,
        "labels": rng.integers(0, 5, n).astype(np.int32),
    }

    tight_geom = (
        "CoordinateContext.grid_extent = 64\n"
        'CoordinateContext.method = "hybrid"\n'
        "CoordinateContext.block_cap_divisor = 1\n"
        "CoordinateContext.window_tile = 64\n"
        "CoordinateContext.window_size = 64\n"
        "CoordinateContext.window_blocks = 2\n"
        # cross-set maps keep generous coverage: only the SAME-SET plans
        # are squeezed into escaping (cross plans have no fallback)
        "CoordinateContext.window_expand_factor = 6\n"
    )
    outs = {}
    for name, bindings in (
        (
            "row",
            "CoordinateContext.grid_extent = 64\n"
            'CoordinateContext.method = "row"\n',
        ),
        # strict: same tight geometry, no cap — must poison (proves the
        # cap run below actually exercises the fallback, not headroom)
        ("strict", tight_geom),
        (
            "tight",
            tight_geom
            + "CoordinateContext.window_escape_cap = 8192\n"
            + "CoordinateContext.window_escape_tiles = 256\n",
        ),
    ):
        cfg.clear_config()
        cfg.parse_config(bindings)
        model = get_model(
            name="Res16UNet14", out_channel=5, num_batches=2,
            planes=(8,) * 8,
        )
        field = process_input(batch)
        variables = model.init(jax.random.PRNGKey(0), field, train=False)
        out = model.apply(variables, field, train=False)
        outs[name] = np.asarray(out)
    assert not np.isfinite(outs["strict"]).all(), (
        "geometry must be tight enough that strict mode poisons — "
        "otherwise this test does not exercise the fallback"
    )
    assert np.isfinite(outs["tight"]).all(), "fallback must not poison"
    np.testing.assert_allclose(
        outs["tight"][mask], outs["row"][mask], rtol=2e-4, atol=2e-4
    )


def test_hybrid_runs_without_grid_extent(rng):
    """method='hybrid' with NO grid_extent (unbounded outdoor datasets):
    the windowed path needs only packed-key order — full model forward,
    incl. negative coordinates, == the row path."""
    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.models.interface import process_input

    n, valid = 2048, 1800
    pts = rng.integers(-40, 40, (valid, 3)).astype(np.float32)
    coords = np.zeros((n, 4), np.float32)
    coords[:valid, 1:] = pts
    coords[:valid, 0] = rng.integers(0, 2, valid)
    feats = rng.normal(size=(n, 6)).astype(np.float32)
    mask = np.arange(n) < valid
    batch = {
        "coordinates": coords, "features": feats, "mask": mask,
        "labels": rng.integers(0, 5, n).astype(np.int32),
    }
    outs = {}
    for name, bindings in (
        ("row", 'CoordinateContext.method = "row"\n'),
        (
            "hybrid",
            'CoordinateContext.method = "hybrid"\n'
            "CoordinateContext.window_tile = 128\n"
            "CoordinateContext.window_size = 128\n"
            "CoordinateContext.window_blocks = 6\n"
            "CoordinateContext.window_escape_cap = 8192\n",
        ),
    ):
        cfg.clear_config()
        cfg.parse_config(bindings)
        model = get_model(
            name="Res16UNet14", out_channel=5, num_batches=2,
            planes=(8,) * 8,
        )
        field = process_input(batch)
        variables = model.init(jax.random.PRNGKey(0), field, train=False)
        out = model.apply(variables, field, train=False)
        outs[name] = np.asarray(out)
    assert np.isfinite(outs["hybrid"]).all()
    np.testing.assert_allclose(
        outs["hybrid"][mask], outs["row"][mask], rtol=2e-4, atol=2e-4
    )
