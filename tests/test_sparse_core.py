"""Sparse-core correctness vs. brute-force numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_downstream_tpu.sparse import (
    PointField,
    SparseVoxels,
    build_kernel_map,
    field_to_sparse,
    kernel_offsets,
    sparse_to_field,
    stride_coords,
    unique_coords,
)
from nerf_downstream_tpu.sparse import packing


def make_sv(rng, n_valid=50, capacity=64, c=4, span=20, batches=2):
    """Random SparseVoxels with *distinct* valid coordinates (ME invariant)."""
    coords = np.zeros((capacity, 4), np.int32)
    side = 2 * span
    lin = rng.choice(batches * side**3, size=n_valid, replace=False)
    coords[:n_valid, 0] = lin // side**3
    rem = lin % side**3
    coords[:n_valid, 1] = rem // side**2 - span
    coords[:n_valid, 2] = (rem // side) % side - span
    coords[:n_valid, 3] = rem % side - span
    # garbage in padding rows to prove masking works
    coords[n_valid:] = rng.integers(-span, span, (capacity - n_valid, 4))
    feats = rng.normal(size=(capacity, c)).astype(np.float32)
    mask = np.arange(capacity) < n_valid
    return SparseVoxels(
        coords=jnp.asarray(coords),
        feats=jnp.asarray(feats),
        mask=jnp.asarray(mask),
        stride=1,
    )


def test_pack_find_roundtrip(rng):
    sv = make_sv(rng)
    hi, lo = packing.pack(sv.coords, sv.mask)
    idx = jnp.arange(sv.capacity, dtype=jnp.int32)
    s_hi, s_lo, s_idx = packing.sort_with_payload(hi, lo, idx)
    pos = packing.find(s_hi, s_lo, hi, lo)
    pos = np.asarray(pos)
    s_idx = np.asarray(s_idx)
    coords = np.asarray(sv.coords)
    mask = np.asarray(sv.mask)
    for i in range(sv.capacity):
        if mask[i]:
            assert pos[i] < sv.capacity
            # found row must hold identical coords
            j = s_idx[pos[i]]
            assert (coords[j] == coords[i]).all()
        else:
            assert pos[i] == sv.capacity


def test_find_missing(rng):
    sv = make_sv(rng, span=10)
    hi, lo = packing.pack(sv.coords, sv.mask)
    s_hi, s_lo, _ = packing.sort_with_payload(
        hi, lo, jnp.arange(sv.capacity, dtype=jnp.int32)
    )
    # query coords far outside span -> all missing
    q = jnp.asarray(np.full((7, 4), 1000, np.int32))
    q_hi, q_lo = packing.pack(q, jnp.ones(7, bool))
    pos = packing.find(s_hi, s_lo, q_hi, q_lo)
    assert (np.asarray(pos) == sv.capacity).all()


def test_unique_coords_matches_numpy(rng):
    capacity = 64
    coords = np.zeros((capacity, 4), np.int32)
    coords[:40, 1:] = rng.integers(0, 4, (40, 3))  # many duplicates
    coords[:40, 0] = rng.integers(0, 2, 40)
    mask = np.arange(capacity) < 40
    out_c, out_m, row_to_unique = unique_coords(
        jnp.asarray(coords), jnp.asarray(mask)
    )
    out_c, out_m, row_to_unique = map(np.asarray, (out_c, out_m, row_to_unique))
    expected = np.unique(coords[:40], axis=0)
    got = out_c[out_m]
    assert got.shape == expected.shape
    assert (np.sort(got.view("i4,i4,i4,i4"), axis=0).view(np.int32)
            == np.sort(expected.view("i4,i4,i4,i4"), axis=0).view(np.int32)).all()
    # row_to_unique maps each valid row to a slot holding the same coord
    for i in range(40):
        assert (out_c[row_to_unique[i]] == coords[i]).all()


def test_stride_coords(rng):
    sv = make_sv(rng, span=16)
    out = stride_coords(sv, 2)
    assert out.stride == 2
    c = np.asarray(out.coords)[np.asarray(out.mask)]
    assert (c[:, 1:] % 2 == 0).all()
    # expected set
    inc = np.asarray(sv.coords)[np.asarray(sv.mask)]
    exp = np.unique(
        np.concatenate([inc[:, :1], (inc[:, 1:] // 2) * 2], axis=1), axis=0
    )
    assert c.shape == exp.shape


def test_kernel_offsets_conventions():
    offs3 = kernel_offsets(3, 1)
    assert offs3.shape == (27, 3)
    assert (offs3.min(), offs3.max()) == (-1, 1)
    offs2 = kernel_offsets(2, 2)
    assert offs2.shape == (8, 3)
    assert (offs2.min(), offs2.max()) == (0, 2)
    # dilation scales with tensor stride
    offs3s2 = kernel_offsets(3, 2)
    assert set(np.unique(offs3s2)) == {-2, 0, 2}


def test_kernel_map_brute_force(rng):
    sv = make_sv(rng, n_valid=40, capacity=48, span=5)
    offs = kernel_offsets(3, 1)
    km = np.asarray(
        build_kernel_map(sv.coords, sv.mask, sv.coords, sv.mask, offs)
    )
    coords = np.asarray(sv.coords)
    mask = np.asarray(sv.mask)
    lookup = {tuple(coords[i]): i for i in range(48) if mask[i]}
    for k in range(27):
        for o in range(48):
            if not mask[o]:
                assert km[k, o] == 48
                continue
            q = coords[o].copy()
            q[1:] += offs[k]
            assert km[k, o] == lookup.get(tuple(q), 48), (k, o, q)


def test_kernel_map_transpose_adjoint(rng):
    """transpose map with -offs must be the adjoint of the forward map."""
    sv = make_sv(rng, n_valid=40, capacity=48, span=5)
    out = stride_coords(sv, 2)
    offs = kernel_offsets(2, 1)
    fwd = np.asarray(
        build_kernel_map(sv.coords, sv.mask, out.coords, out.mask, offs)
    )
    bwd = np.asarray(
        build_kernel_map(
            out.coords, out.mask, sv.coords, sv.mask, offs, transpose=True
        )
    )
    # (k, out o, in i) present in fwd  <=>  (k, out i, in o) present in bwd
    fwd_pairs = {
        (k, o, fwd[k, o])
        for k in range(8)
        for o in range(48)
        if fwd[k, o] < 48
    }
    bwd_pairs = {
        (k, bwd[k, i], i)
        for k in range(8)
        for i in range(48)
        if bwd[k, i] < 48
    }
    assert fwd_pairs == bwd_pairs


def test_field_sparse_roundtrip(rng):
    n = 32
    coords = np.zeros((n, 4), np.float32)
    coords[:24, 1:] = rng.uniform(0, 4, (24, 3))
    coords[:24, 0] = rng.integers(0, 2, 24)
    feats = rng.normal(size=(n, 3)).astype(np.float32)
    mask = np.arange(n) < 24
    field = PointField(
        coords=jnp.asarray(coords), feats=jnp.asarray(feats),
        mask=jnp.asarray(mask),
    )
    sv, p2v = field_to_sparse(field, voxel_size=1.0)
    # voxel feats = mean of member points
    vox = np.concatenate(
        [coords[:, :1].astype(np.int64), np.floor(coords[:, 1:]).astype(np.int64)], 1
    )
    svc, svf, svm = map(np.asarray, (sv.coords, sv.feats, sv.mask))
    for j in range(n):
        if not svm[j]:
            continue
        members = [
            i for i in range(24) if (vox[i] == svc[j]).all()
        ]
        assert members
        np.testing.assert_allclose(
            svf[j], feats[members].mean(0), rtol=1e-5, atol=1e-6
        )
    # slice back: every point gets its voxel's features
    back = sparse_to_field(sv, field, p2v)
    bf = np.asarray(back.feats)
    for i in range(24):
        np.testing.assert_allclose(bf[i], svf[np.asarray(p2v)[i]], rtol=1e-6)


def test_field_sparse_assume_unique_collision_poison(rng):
    """A violated assume_unique declaration must fail loudly (NaN), not
    silently keep duplicate rows (ADVICE r2: warping transforms can land
    two voxels in one cell)."""
    n = 16
    coords = np.zeros((n, 4), np.float32)
    coords[:8, 1:] = np.arange(8)[:, None]  # unique cells
    feats = rng.normal(size=(n, 3)).astype(np.float32)
    mask = np.arange(n) < 8
    field = PointField(
        coords=jnp.asarray(coords), feats=jnp.asarray(feats),
        mask=jnp.asarray(mask),
    )
    sv, _ = field_to_sparse(field, voxel_size=1.0, assume_unique=True)
    assert np.isfinite(np.asarray(sv.feats)[np.asarray(sv.mask)]).all()

    coords[1, 1:] = coords[0, 1:] + 0.25  # same cell after floor
    field = PointField(
        coords=jnp.asarray(coords), feats=jnp.asarray(feats),
        mask=jnp.asarray(mask),
    )
    sv, _ = field_to_sparse(field, voxel_size=1.0, assume_unique=True)
    assert np.isnan(np.asarray(sv.feats)[np.asarray(sv.mask)]).any()
    # the general path averages the colliders instead
    sv2, _ = field_to_sparse(field, voxel_size=1.0, assume_unique=False)
    f2 = np.asarray(sv2.feats)[np.asarray(sv2.mask)]
    assert np.isfinite(f2).all()
    assert int(np.asarray(sv2.mask).sum()) == 7


def test_ops_jittable(rng):
    sv = make_sv(rng)
    offs = kernel_offsets(3, 1)

    @jax.jit
    def go(sv):
        out = stride_coords(sv, 2)
        km = build_kernel_map(sv.coords, sv.mask, out.coords, out.mask, offs)
        return km.sum()

    go(sv)  # must trace & compile


def test_lower_bound_hier_matches_binary(rng):
    """Two-level hierarchical lower_bound (the plan-build boundary search,
    ~3 ms/step of fori_loop gathers at bench scale) must agree with the
    binary-search reference for every size class, including the
    non-multiple-of-block fallback."""
    from nerf_downstream_tpu.sparse import packing

    for n, q in [(1024, 300), (65536, 7000), (512, 16), (896, 50)]:
        keys = np.sort(rng.integers(0, 2**63, n).astype(np.uint64))
        qs = np.concatenate([
            rng.choice(keys, q // 2),
            rng.integers(0, 2**63, q - q // 2).astype(np.uint64),
        ])
        hi = jnp.asarray((keys >> 32).astype(np.uint32))
        lo = jnp.asarray((keys & 0xFFFFFFFF).astype(np.uint32))
        qh = jnp.asarray((qs >> 32).astype(np.uint32))
        ql = jnp.asarray((qs & 0xFFFFFFFF).astype(np.uint32))
        a = np.asarray(packing.lower_bound(hi, lo, qh, ql))
        b = np.asarray(packing.lower_bound_hier(hi, lo, qh, ql))
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(
            a, np.searchsorted(keys, qs, side="left")
        )
