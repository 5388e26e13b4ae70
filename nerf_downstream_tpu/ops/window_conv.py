"""Windowed sparse convolution: monotone kernel maps -> contiguous-slice
gathers + in-window one-hot MXU matmuls.

THE data-structure insight (round-3 redesign of the k3/s1 conv): every
coordinate set in this framework is stored in sorted (b, x, y, z) key order
(packing.sort_with_payload), and a kernel map "find the row of coord+d" for
a FIXED offset d preserves that order — each of the K per-offset maps is
strictly increasing over its valid entries. A monotone gather needs no
random access: tile the outputs into runs of T rows; each tile's inputs
live in one contiguous window of the input array. The gather becomes

    window  = feats[start_t : start_t + W]          (one big slice / tile)
    gathered = onehot(idx) @ window                  (MXU matmul)

which replaces the latency-bound XLA row gather (measured 40-140 GB/s
effective, single-digit MXU) with sequential slice reads plus matmuls —
the Switch-Transformer dispatch-einsum trick applied to voxel geometry.
Offsets sharing (dx, dy) differ only in dz — the fastest-varying sort key —
so their maps are near-identical and share one window per tile (3x fewer
slice gathers for a 3^3 kernel).

Out-of-window entries (input span > W inside one tile, e.g. a sparse plane
mapping into a dense one) are counted at plan build; a non-zero count
NaN-poisons the output (fail loud, like the block-cap overflow guard) —
``window_size`` is a per-dataset knob like ``grid_extent``/``block_caps``.
Measured on the bench workload: T=256/W=512 escapes 0.07%, W=1024 zero.

Backward is gather-only: d_feats rides the transpose kernel map's own
window plan (the maps are mutually inverse per offset), d_w recomputes the
forward gathers — no scatters anywhere.

Reference semantics reproduced: MinkowskiConvolution on an arbitrary
kernel map (co3d_3d/src/models/mink/modules/sparse_conv.py:122-152) —
re-derived for the TPU memory system, not translated.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class WindowPlan:
    """Tiled window layout for one kernel map (one per map, ctx-cached).

    ``starts[g, t]``: input-row offset of tile t's window for offset-group
    g.  ``idx[g, t, m, i]``: in-window index of output row t*tile+i's
    neighbor under group-member m (-1 = no neighbor / escaped) — TILE-MAJOR,
    the exact layout the conv kernels' BlockSpecs stream AND the match
    kernel emits, so no [G, M, N] <-> [G, nT, M, T] relayout copy ever
    materializes between plan building and the convs (measured ~0.8 ms
    per copy at 64k rows). Because the kernels take idx verbatim, group
    members need no rank-adjacency invariant: arbitrary offset subsets
    (pruned kernels, padded groups) ride the same path.
    """

    starts: jax.Array  # int32[G, nT]
    idx: jax.Array  # int32[G, nT, M, tile] (tile-major)
    n_escaped: jax.Array  # int32 scalar
    # escape-fallback entry list (``escape_cap > 0``): the few (offset,
    # out-row, in-row) pairs whose neighbor rank falls outside the tile
    # window run through a tiny gather/scatter side path instead of
    # NaN-poisoning the conv — coverage becomes a PERFORMANCE knob sized
    # for the common case, not a hard correctness bound sized for the
    # worst outlier tile. esc_k indexes perm-ordered [G*M] weights; -1 =
    # padding. n_escaped then only counts UNHANDLED overflow (list/tile
    # capacity exceeded — still poisons, fail loud).
    esc_k: jax.Array | None = None  # int32[E]
    esc_i: jax.Array | None = None  # int32[E]
    esc_j: jax.Array | None = None  # int32[E]
    # diagnostics for the calibration pass (utils/calibrate.py): the exact
    # quantities the overflow guard compares against the budgets —
    # [n_gt (bounds-escaped candidate tiles), n_dt (demoted-entry tiles),
    # n_esc (escape-list entries)]
    esc_stats: jax.Array | None = None  # int32[3]
    perm: tuple = flax.struct.field(pytree_node=False, default=())
    tile: int = flax.struct.field(pytree_node=False, default=256)
    window: int = flax.struct.field(pytree_node=False, default=512)
    # coverage = blocks * window rows per tile; cross-set maps (a strided
    # down conv consumes ~4-8 input ranks per output row) widen coverage
    # with more aligned blocks instead of shrinking the tile to Pallas dust
    blocks: int = flax.struct.field(pytree_node=False, default=2)


def group_offsets(offsets: np.ndarray) -> tuple[tuple[int, ...], ...]:
    """Partition kernel-offset indices into groups sharing (dx, dy).

    The sort key varies z fastest, so maps of offsets that differ only in
    dz are within a few ranks of each other and share a window. Groups must
    be uniform-size for the scan'd apply; offsets from ``kernel_offsets``
    (full k^3 / k^2 grids) always are.
    """
    keys: dict[tuple[int, int], list[int]] = {}
    for i, (dx, dy, _dz) in enumerate(np.asarray(offsets)):
        keys.setdefault((int(dx), int(dy)), []).append(i)
    groups = tuple(tuple(v) for v in keys.values())
    sizes = {len(g) for g in groups}
    assert len(sizes) == 1, f"non-uniform offset groups: {groups}"
    return groups


def build_plan(
    kernel_map: jax.Array,
    n_in: int,
    offsets: np.ndarray,
    tile: int = 256,
    window: int = 512,
    expansion: int = 1,
    blocks: int = 2,
) -> WindowPlan:
    """Tile a monotone kernel map into window starts + in-window indices.

    ``expansion``: density ratio of the input level to the output level —
    a map from a coarser set into a finer one advances ~expansion input
    ranks per output row (a stride-2 down conv covers up to 8 fine cells
    per coarse cell), so the tile shrinks to keep spans inside ``window``.
    """
    k, n_out = kernel_map.shape
    tile = max(32, tile // max(int(expansion), 1))
    while n_out % tile and tile > 8:  # small-capacity tests
        tile //= 2
    assert n_out % tile == 0, (
        f"capacity {n_out} not divisible by window tile {tile}"
    )
    nt = n_out // tile
    groups = group_offsets(offsets)
    perm = tuple(i for g in groups for i in g)
    m = len(groups[0])
    km = kernel_map[jnp.asarray(perm)].reshape(len(groups), m, n_out)
    valid = km < n_in
    big = jnp.int32(1 << 30)
    # smallest valid neighbor rank in each (group, tile); empty tiles
    # inherit the previous tile's start (maps are monotone, so a later
    # valid entry is >= any earlier start)
    gmin = jnp.min(jnp.where(valid, km, big), axis=1)  # [G, N_out]
    tmin = jnp.min(gmin.reshape(-1, nt, tile), axis=2)  # [G, nT]
    tmin = jnp.where(tmin == big, -1, tmin)
    starts = jnp.maximum(jax.lax.cummax(tmin, axis=1), 0)
    # quantize starts DOWN to multiples of ``window``: the effective
    # coverage becomes [qstart, qstart + blocks*window) ⊇ the unquantized
    # [start, start + window), and window fetches become ``blocks`` aligned
    # ``window``-row blocks — which the Pallas kernel's pipelined BlockSpec
    # machinery can stream with zero per-tile descriptor overhead.
    starts = ((starts // window) * window).astype(jnp.int32)
    # feats are padded by blocks*window rows, so the coverage stays in
    # bounds for any qstart <= n_in - 1
    rel = km - jnp.repeat(starts[:, None, :], tile, axis=2).reshape(
        len(groups), 1, n_out
    )
    in_win = valid & (rel >= 0) & (rel < blocks * window)
    n_escaped = jnp.sum((valid & ~in_win).astype(jnp.int32))
    idx = jnp.where(in_win, rel, -1).astype(jnp.int32)
    return WindowPlan(
        starts=starts,
        idx=idx.reshape(len(groups), m, nt, tile).transpose(0, 2, 1, 3),
        n_escaped=n_escaped,
        perm=perm,
        tile=tile,
        window=window,
        blocks=blocks,
    )


def build_plan_direct(
    coords: jax.Array,
    mask: jax.Array,
    offsets: np.ndarray,
    tile: int = 256,
    window: int = 512,
    transpose: bool = False,
    out_coords: jax.Array | None = None,
    out_mask: jax.Array | None = None,
    blocks: int = 2,
    escape_cap: int = 0,
    escape_tiles: int = 64,
) -> WindowPlan:
    """Window plan straight from sorted packed keys — no kernel map, no grid.

    Every level's coordinate set is stored in packed-key order, and
    ``key(coord + d) = key + delta(d)`` exactly (packing.offset_delta), so
    the neighbor structure is recovered by *matching shifted keys against a
    rank-window of the key table*:

    - window starts: one ``lower_bound`` per (offset, tile boundary) — K*nT
      queries total (~7k at bench scale) instead of K*N grid gathers (1.7M);
    - in-window indices: equality-match of each tile's shifted keys against
      its 2*window key slice — on TPU a Pallas kernel
      (ops/pallas/window_gather.py::window_match_pallas) that streams the
      same aligned key blocks the conv kernel streams for features; the XLA
      fallback does a per-offset binary search (CPU tests).

    The escape guard is boundary-based and conservative: tile t's matches
    all rank-below ``lower_bound(first query of tile t+1)``, so
    ``bound - start > 2*window`` catches every true escape (and may flag a
    spurious one when local key density is wildly uneven — fail-loud either
    way, raise ``window_size`` if it fires).

    Cross-set maps (a strided down conv's coarse-out-from-fine-in, a
    transpose conv's fine-out-from-coarse-in) pass the query set as
    ``out_coords``/``out_mask`` — the table stays ``coords``; maps whose
    input-rank advance per output row exceeds 1 (a stride-2 down conv
    consumes ~4-8 fine ranks per coarse row) widen ``blocks`` so
    coverage = blocks*window tracks the larger span. Same-set
    stride-preserving maps omit them.

    Replaces the grid-index kernel-map builder whose scatter+gather chain
    measured ~45 ms/step at 64k rows — reference semantics unchanged
    (ME kernel map, sparse_conv.py:398-405).
    """
    from nerf_downstream_tpu.sparse import packing

    if out_coords is None:
        out_coords, out_mask = coords, mask
    n_in = coords.shape[0]
    n = out_coords.shape[0]
    k = len(offsets)
    hi, lo = packing.pack(coords, mask)  # sorted by construction
    o_hi, o_lo = (
        (hi, lo) if out_coords is coords
        else packing.pack(out_coords, out_mask)
    )
    n_valid_in = jnp.sum(mask.astype(jnp.int32))
    n_valid_out = jnp.sum(out_mask.astype(jnp.int32))
    offs = np.asarray(offsets)
    if transpose:
        offs = -offs
    while n % tile and tile > 8:  # small-capacity tests
        tile //= 2
    assert n % tile == 0, f"capacity {n} not divisible by window tile {tile}"
    nt = n // tile
    groups = group_offsets(offsets)
    perm = tuple(i for g in groups for i in g)
    m = len(groups[0])
    deltas = [packing.offset_delta(offs[i]) for i in range(k)]

    # --- tile-boundary bounds (K x (nT+1) binary searches) ---
    b_hi, b_lo = o_hi[::tile], o_lo[::tile]  # [nT]
    b_valid = (jnp.arange(nt, dtype=jnp.int32) * tile) < n_valid_out
    qb_hi, qb_lo = [], []
    for d_hi, d_lo in deltas:
        qh, ql = packing.shift_keys(b_hi, b_lo, d_hi, d_lo, mask=b_valid)
        qb_hi.append(qh)
        qb_lo.append(ql)
    bnd = packing.lower_bound_hier(
        hi, lo, jnp.stack(qb_hi).reshape(-1), jnp.stack(qb_lo).reshape(-1)
    ).reshape(k, nt)
    # invalid boundary rows bound nothing; matches never rank >= n_valid_in
    bnd = jnp.where(b_valid[None, :], bnd, n_valid_in)
    bnd = jnp.concatenate(
        [bnd, jnp.broadcast_to(n_valid_in[None, None], (k, 1))], axis=1
    ).astype(jnp.int32)

    bnd_g = bnd[jnp.asarray(perm)].reshape(len(groups), m, nt + 1)
    smin = jnp.min(bnd_g[:, :, :-1], axis=1)  # [G, nT]
    emax = jnp.max(bnd_g[:, :, 1:], axis=1)
    starts = jnp.maximum(jax.lax.cummax(smin, axis=1), 0)
    starts = ((starts // window) * window).astype(jnp.int32)
    n_escaped = jnp.sum(
        (emax - starts > blocks * window).astype(jnp.int32)
    )

    # --- in-window indices ---
    # static per-(g, m) 64-bit delta words: the packed key of coord+d is
    # key + delta as one uint64 add (offset_delta) — shared by the match
    # kernel (which shifts query keys in-register) and the escape search
    d64 = [((dh << 32) + dl) & ((1 << 64) - 1) for dh, dl in deltas]
    dw = np.asarray(d64, np.uint64)[list(perm)].reshape(len(groups), m)

    def _i32(v):
        v = int(v) & 0xFFFFFFFF
        return v - (1 << 32) if v >= (1 << 31) else v

    if _use_pallas():
        from nerf_downstream_tpu.ops.pallas.window_gather import (
            window_match_pallas,
        )

        deltas_gm = tuple(
            tuple(
                (_i32(int(dw[g, j]) >> 32), _i32(dw[g, j]))
                for j in range(m)
            )
            for g in range(len(groups))
        )
        idx = window_match_pallas(
            hi, lo, o_hi, o_lo, out_mask, deltas_gm, starts,
            tile, window, blocks,
        )
    else:
        q_hi = jnp.stack(
            [
                packing.shift_keys(o_hi, o_lo, d_hi, d_lo, mask=out_mask)[0]
                for d_hi, d_lo in deltas
            ]
        )[jnp.asarray(perm)].reshape(len(groups), m, n)
        q_lo = jnp.stack(
            [
                packing.shift_keys(o_hi, o_lo, d_hi, d_lo, mask=out_mask)[1]
                for d_hi, d_lo in deltas
            ]
        )[jnp.asarray(perm)].reshape(len(groups), m, n)
        pos = packing.find(
            hi, lo, q_hi.reshape(-1), q_lo.reshape(-1), missing=n_in
        ).reshape(len(groups), m, n)
        rel = pos - jnp.repeat(starts[:, None, :], tile, axis=2).reshape(
            len(groups), 1, n
        )
        in_win = (pos < n_in) & (rel >= 0) & (rel < blocks * window)
        idx = (
            jnp.where(in_win, rel, -1)
            .astype(jnp.int32)
            .reshape(len(groups), m, nt, tile)
            .transpose(0, 2, 1, 3)  # tile-major (free: CPU fallback only)
        )

    esc_k = esc_i = esc_j = esc_stats = None
    if escape_cap > 0:
        # Escape fallback (same-set symmetric plans only): instead of
        # poisoning, collect the few out-of-window pairs into a fixed-size
        # entry list handled by a gather/scatter side path
        # (window_conv_apply::_esc_contrib). The windowed pair set must
        # stay EQUAL between this plan and its negation-relabeled
        # transpose (the conv's custom backward gathers along the
        # transpose plan — a one-sided pair would corrupt d_feats), so
        # in-window entries whose PARTNER window misses them are demoted
        # into the escape list too. Poisons only on capacity overflow.
        assert out_coords is coords, (
            "escape_cap applies to same-set plans only (cross-set plans "
            "must size their coverage; raise window_blocks instead)"
        )
        nperm = negation_perm(offsets)
        assert nperm is not None, (
            "escape fallback needs a symmetric offset set"
        )
        g_perm, _ = nperm
        gp = jnp.asarray(g_perm)
        cov = blocks * window
        g_count = len(groups)
        # partner-window (mutuality) check for every in-window entry:
        # pair (k, i -> j) lives in the transpose plan at entry (kneg, j)
        # whose window is starts[gneg, j // tile]. A per-element gather
        # from the starts table is scalar-latency-bound on TPU (measured
        # 18 ms at 1.7M entries); but an IN-WINDOW j spans at most
        # R = cov//tile + 2 consecutive partner tiles from the own tile's
        # quantized start, so the partner start is an R-way arithmetic
        # SELECT against a tiny [G, nT, R] table instead.
        # tile-major 4-D formulation in the PLAN's own [G, nT, M, T]
        # layout: every per-tile quantity broadcasts along the minor
        # ``tile`` dim — no jnp.repeat materialization, no layout churn
        # (the flat [G, M, N] form cost ~10 ms/step in transposed-layout
        # fusions + copies at bench scale)
        r_vals = cov // tile + 2
        base = starts // tile  # [G, nT] own window's first tile index
        ps = starts[gp]  # [G, nT] partner-group starts (static perm)
        idx_r = jnp.clip(
            base[:, :, None]
            + jnp.arange(r_vals, dtype=jnp.int32)[None, None, :],
            0, nt - 1,
        )
        s_r = jax.vmap(lambda p, i: p[i])(ps, idx_r)  # [G, nT, R]
        idx4 = idx  # already tile-major [G, nT, M, T]
        valid0 = idx4 >= 0
        j_abs4 = jnp.where(valid0, starts[:, :, None, None] + idx4, 0)
        r_idx4 = j_abs4 // tile - base[:, :, None, None]
        inv_start4 = jnp.full_like(j_abs4, 1 << 30)
        for r in range(r_vals):
            inv_start4 = jnp.where(
                r_idx4 == r, s_r[:, :, None, None, r], inv_start4
            )
        # r_idx outside [0, R) cannot happen for in-window entries; if it
        # ever did, the sentinel start fails in_b and the pair simply
        # rides the escape list — correctness never depends on this select
        own_i4 = jnp.arange(n, dtype=jnp.int32).reshape(1, nt, 1, tile)
        in_b4 = (own_i4 >= inv_start4) & (own_i4 < inv_start4 + cov)
        demote4 = valid0 & ~in_b4
        idx = jnp.where(demote4, -1, idx4)

        # part A — out-of-window entries: every such entry lives in a
        # bounds-escaped (group, tile) (monotone maps: rel >= 0 always).
        # Instead of per-entry binary searches (a 12 ms while at bench
        # scale) the candidate tiles' queries equality-match against ONE
        # contiguous [cov + escape_span) key slice per tile — the same
        # trick the Pallas match kernel uses, in plain fused XLA.
        esc_span = 3 * cov
        slice_w = cov + esc_span
        esc_gt = (emax - starts) > cov  # [G, nT]
        n_gt = jnp.sum(esc_gt.astype(jnp.int32))
        # tiles whose span exceeds even the escape slice cannot be
        # recovered — poison via the overflow indicator below
        n_far = jnp.sum(((emax - starts) > slice_w).astype(jnp.int32))
        te = min(escape_tiles, g_count * nt)
        _, cand = jax.lax.top_k(esc_gt.reshape(-1).astype(jnp.int32), te)
        cg = (cand // nt).astype(jnp.int32)
        ct = (cand % nt).astype(jnp.int32)
        rows = ct[:, None] * tile + jnp.arange(tile, dtype=jnp.int32)
        mm = jnp.arange(m, dtype=jnp.int32)
        i32 = jnp.int32
        hi_pad = jnp.concatenate(
            [hi.astype(i32), jnp.full((slice_w,), -1, i32)]
        )
        lo_pad = jnp.concatenate(
            [lo.astype(i32), jnp.full((slice_w,), -1, i32)]
        )
        st_c = starts[cg, ct]  # [TE]

        # Candidate-tile query keys are RECOMPUTED from 1-D key slices +
        # a static per-(g, m) 64-bit delta table rather than sliced out of
        # the precomputed q_hi/q_lo [G, M, N] arrays: a vmapped
        # dynamic_slice over those big arrays made XLA relayout BOTH of
        # them M-minor ({1,0,2} copies, 2 x 0.83 ms/step at bench scale)
        # just to serve ~64 tiles. The uniform unsigned 64-bit add here is
        # bit-identical to packing.shift_keys (tested).
        wh_tab = jnp.asarray((dw >> 32).astype(np.uint32))  # [G, M]
        wl_tab = jnp.asarray((dw & 0xFFFFFFFF).astype(np.uint32))
        inval = jnp.uint32(0xFFFFFFFF)
        sent_lo = jnp.uint32(0xFFFFFFFE)

        def slice_tile(g, t0, s0):
            oh = jax.lax.dynamic_slice(o_hi, (t0,), (tile,))
            ol = jax.lax.dynamic_slice(o_lo, (t0,), (tile,))
            om = jax.lax.dynamic_slice(out_mask, (t0,), (tile,))
            wh, wl = wh_tab[g], wl_tab[g]  # [M]
            ql = ol[None, :] + wl[:, None]
            carry = (ql < ol[None, :]).astype(jnp.uint32)
            qh = oh[None, :] + wh[:, None] + carry
            qh = jnp.where(om[None, :], qh, inval)
            ql = jnp.where(om[None, :], ql, sent_lo)
            hs = jax.lax.dynamic_slice(hi_pad, (s0,), (slice_w,))
            ls = jax.lax.dynamic_slice(lo_pad, (s0,), (slice_w,))
            return qh.astype(i32), ql.astype(i32), hs, ls

        def match_chunk(args):
            cg_c, t0_c, st_cc = args  # [CH]
            qh_c, ql_c, hs_c, ls_c = jax.vmap(slice_tile)(
                cg_c, t0_c, st_cc
            )  # [CH, M, T], [CH, S]
            eq = (hs_c[:, None, None, :] == qh_c[..., None]) & (
                ls_c[:, None, None, :] == ql_c[..., None]
            )  # [CH, M, T, S]
            iota_s = jax.lax.broadcasted_iota(i32, eq.shape, 3)
            return jnp.max(jnp.where(eq, iota_s, -1), axis=3)  # [CH, M, T]

        # chunked over candidate tiles: the [TE, M, T, S] equality tensor
        # is ~100 MB at the runtime budget (TE<=64) but tens of GB at the
        # calibration pass's uncapped TE = G*nT (utils/calibrate.py scans
        # with every tile as a candidate) — lax.map bounds peak memory to
        # one chunk while compiling to the identical single-slab program
        # when TE <= the chunk size
        chunk = 64
        if te <= chunk:
            j_loc = match_chunk((cg, ct * tile, st_c))
        else:
            n_ch = -(-te // chunk)
            pad = n_ch * chunk - te
            # padding duplicates candidate 0; duplicated ESCAPED entries
            # would double-count, so padded rows are masked out below
            cg_p = jnp.concatenate([cg, jnp.zeros((pad,), i32)])
            ct_p = jnp.concatenate([ct, jnp.zeros((pad,), i32)])
            st_p = jnp.concatenate([st_c, jnp.zeros((pad,), i32)])
            j_loc = jax.lax.map(
                match_chunk,
                (
                    cg_p.reshape(n_ch, chunk),
                    (ct_p * tile).reshape(n_ch, chunk),
                    st_p.reshape(n_ch, chunk),
                ),
            ).reshape(n_ch * chunk, m, tile)
            real = (
                jnp.arange(n_ch * chunk, dtype=i32) < te
            )[:, None, None]
            j_loc = jnp.where(real, j_loc, -1)[:te]
        a_flag = j_loc >= cov  # found strictly out-of-window
        a_k = jnp.broadcast_to(
            cg[:, None, None] * m + mm[None, :, None], j_loc.shape
        )
        a_i = jnp.broadcast_to(rows[:, None, :], j_loc.shape)
        a_j = st_c[:, None, None] + j_loc

        # part B — demoted entries, compressed tile-wise (j known from
        # idx, no search): tiles containing any demoted entry
        dem_t = jnp.any(demote4, axis=(2, 3))  # [G, nT]
        n_dt = jnp.sum(dem_t.astype(jnp.int32))
        _, cand2 = jax.lax.top_k(dem_t.reshape(-1).astype(jnp.int32), te)
        cg2 = (cand2 // nt).astype(jnp.int32)
        ct2 = (cand2 % nt).astype(jnp.int32)
        rows2 = ct2[:, None] * tile + jnp.arange(tile, dtype=jnp.int32)

        def slice_dem(g, t):
            fl = jax.lax.dynamic_slice(
                demote4.astype(i32), (g, t, 0, 0), (1, 1, m, tile)
            )[0, 0]
            jj = jax.lax.dynamic_slice(
                j_abs4, (g, t, 0, 0), (1, 1, m, tile)
            )[0, 0]
            return fl, jj

        b_int, b_j = jax.vmap(slice_dem)(cg2, ct2)
        b_flag = b_int > 0
        b_k = jnp.broadcast_to(
            cg2[:, None, None] * m + mm[None, :, None], b_flag.shape
        )
        b_i = jnp.broadcast_to(rows2[:, None, :], b_flag.shape)

        all_flag = jnp.concatenate(
            [a_flag.reshape(-1), b_flag.reshape(-1)]
        )
        all_k = jnp.concatenate([a_k.reshape(-1), b_k.reshape(-1)])
        all_i = jnp.concatenate([a_i.reshape(-1), b_i.reshape(-1)])
        all_j = jnp.concatenate([a_j.reshape(-1), b_j.reshape(-1)])
        n_esc = jnp.sum(all_flag.astype(jnp.int32))
        e_cap = min(escape_cap, all_flag.shape[0])
        _, pick = jax.lax.top_k(all_flag.astype(jnp.int32), e_cap)
        ok = all_flag[pick]
        esc_k = jnp.where(ok, all_k[pick], -1).astype(jnp.int32)
        esc_i = jnp.where(ok, all_i[pick], -1).astype(jnp.int32)
        esc_j = jnp.where(ok, all_j[pick], -1).astype(jnp.int32)
        overflow = (
            (n_gt > te) | (n_dt > te) | (n_esc > e_cap) | (n_far > 0)
        )
        n_escaped = overflow.astype(jnp.int32)
        esc_stats = jnp.stack([n_gt, n_dt, n_esc])

    return WindowPlan(
        starts=starts,
        idx=idx,
        n_escaped=n_escaped,
        esc_k=esc_k,
        esc_i=esc_i,
        esc_j=esc_j,
        esc_stats=esc_stats,
        perm=perm,
        tile=tile,
        window=window,
        blocks=blocks,
    )


def negation_perm(offsets: np.ndarray) -> tuple | None:
    """(group_perm, member_perm) mapping a same-set plan to its transpose.

    For a symmetric offset set (every d has -d, e.g. full k^3 grids) the
    transpose plan equals the forward plan with offsets negated — which is
    a pure RELABELING of the forward plan's arrays: group (dx, dy) takes
    the rows of group (-dx, -dy) and member dz takes member -dz's (the
    bounds / cummax / match computations are identical query-for-query).
    Returns None when the set is not symmetric (partial ZAXIS subsets).
    """
    offs = np.asarray(offsets)
    groups = group_offsets(offs)
    # duplicate offsets (padded pruned subsets, weight_sparse.
    # pad_offset_groups) have no well-defined negation relabeling
    if len({tuple(int(v) for v in o) for o in offs}) != len(offs):
        return None
    pos: dict[tuple, tuple[int, int]] = {}
    for g, idxs in enumerate(groups):
        for mm, i in enumerate(idxs):
            pos[tuple(int(v) for v in offs[i])] = (g, mm)
    g_perm = np.empty(len(groups), np.int64)
    m_perm = np.empty((len(groups), len(groups[0])), np.int64)
    for g, idxs in enumerate(groups):
        for mm, i in enumerate(idxs):
            neg = tuple(-int(v) for v in offs[i])
            if neg not in pos:
                return None
            gn, mn = pos[neg]
            g_perm[g] = gn
            m_perm[g, mm] = mn
    return g_perm, m_perm


def transpose_plan(plan: WindowPlan, offsets: np.ndarray) -> WindowPlan | None:
    """Derive the transpose (negated-offset) plan of a SAME-SET plan by
    static relabeling — no key shifts, no binary searches, no match kernel
    (measured: plan matching was ~half of a level's first-conv device time).
    Cross-set plans (table != query set) must rebuild: roles swap."""
    perm = negation_perm(offsets)
    if perm is None:
        return None
    g_perm, m_perm = perm
    gp = jnp.asarray(g_perm)
    esc_k = esc_i = esc_j = None
    if plan.esc_k is not None:
        # an escaped pair is escaped in BOTH orientations (mutuality is a
        # pair property): transpose entries are (negated offset, j, i)
        m = m_perm.shape[1]
        lut = np.empty(g_perm.shape[0] * m, np.int32)
        for g in range(g_perm.shape[0]):
            for mm in range(m):
                lut[g * m + mm] = g_perm[g] * m + m_perm[g, mm]
        ok = plan.esc_k >= 0
        esc_k = jnp.where(
            ok, jnp.asarray(lut)[jnp.clip(plan.esc_k, 0)], -1
        ).astype(jnp.int32)
        esc_i = plan.esc_j
        esc_j = plan.esc_i
    # tile-major relabel: group g takes old group g_perm[g]'s tiles and
    # member m takes old member m_perm[g, m] (axis 2 of [G, nT, M, T]).
    # Both perms are STATIC, so express the relabel as static slices +
    # stacks that XLA fuses into plain copies — a take_along_axis with a
    # broadcast index array compiles to an elementwise gather instead
    # (measured 24 ms/step at 64k rows vs ~0.8 ms for the copy).
    m = m_perm.shape[1]
    idx_t = jnp.stack(
        [
            jnp.stack(
                [
                    plan.idx[int(g_perm[g]), :, int(m_perm[g, mm]), :]
                    for mm in range(m)
                ],
                axis=1,
            )
            for g in range(g_perm.shape[0])
        ],
        axis=0,
    )
    return WindowPlan(
        starts=plan.starts[gp],
        idx=idx_t,
        n_escaped=plan.n_escaped,
        esc_k=esc_k,
        esc_i=esc_i,
        esc_j=esc_j,
        esc_stats=plan.esc_stats,
        perm=plan.perm,
        tile=plan.tile,
        window=plan.window,
        blocks=plan.blocks,
    )


def _use_pallas() -> bool:
    import os

    mode = os.environ.get("NDT_WINDOW_PALLAS", "1")
    if mode == "interpret":
        # Pallas interpreter on any backend: the CPU correctness tier for
        # the kernels themselves (tests/test_window_kernels.py)
        return True
    if mode != "1":
        return False
    try:
        # the axon relay registers the TPU as platform "axon"
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _window_gather_matmul(feats_pad, starts, idx, w_perm, tile,
                          window, compute_dtype, blocks=2,
                          out_dtype=jnp.float32):
    """sum over (g, m) of onehot(idx[g, m]) @ window_g @ w[g, m].

    feats_pad: [n_in + blocks*window, C]; starts [G, nT]; idx tile-major
    [G, nT, M, T] (-1 = absent); w_perm [G, M, C, Cout]; f32 accumulation.
    On TPU the
    Pallas kernel builds per-member one-hots in VMEM
    (ops/pallas/window_gather.py); the XLA fallback materializes the
    one-hot (CPU tests / NDT_WINDOW_PALLAS=0). One lax.scan over groups
    keeps the compiled program size O(1) in K (round-2 lesson: 18 conv
    subgraphs cost 170 s of compile).
    """
    if _use_pallas():
        from nerf_downstream_tpu.ops.pallas.window_gather import (
            window_gather_matmul_pallas,
        )

        return window_gather_matmul_pallas(
            feats_pad, starts, idx, w_perm.astype(compute_dtype),
            tile, window, compute_dtype, blocks, out_dtype=out_dtype,
        )
    g_count, nt = starts.shape
    m = idx.shape[2]
    n_out = nt * tile
    idx = idx.transpose(0, 2, 1, 3).reshape(g_count, m, n_out)
    c = feats_pad.shape[1]
    cout = w_perm.shape[-1]
    w2 = blocks * window
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, tile, w2), 2)

    def per_group(acc, xs):
        starts_g, idx_g, w_g = xs  # [nT], [M, N], [M, C, Cout]
        win = jax.vmap(
            lambda s: jax.lax.dynamic_slice(feats_pad, (s, 0), (w2, c))
        )(starts_g)  # [nT, 2W, C]

        def per_member(acc_in, ys):
            idx_k, w_k = ys
            oh = (idx_k.reshape(nt, tile, 1) == iota_w).astype(compute_dtype)
            gathered = jax.lax.dot_general(
                oh, win,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=compute_dtype,
            )  # [nT, T, C]
            out = jnp.dot(
                gathered.reshape(n_out, c), w_k,
                preferred_element_type=jnp.float32,
            )
            return acc_in + out, None

        acc, _ = jax.lax.scan(per_member, acc, (idx_g, w_g))
        return acc, None

    acc, _ = jax.lax.scan(
        per_group,
        jnp.zeros((n_out, cout), jnp.float32),
        (starts, idx, w_perm),
    )
    return acc.astype(out_dtype)


def _window_dw(feats_pad, starts, idx, g_out, tile, window,
               compute_dtype, blocks=2):
    """d_w[g, m] = gathered[g, m]^T @ g_out (forward gathers recomputed)."""
    if _use_pallas():
        from nerf_downstream_tpu.ops.pallas.window_gather import (
            window_dw_pallas,
        )

        return window_dw_pallas(
            feats_pad, starts, idx, g_out, tile, window,
            compute_dtype, blocks,
        )
    g_count, nt = starts.shape
    m = idx.shape[2]
    n_out = nt * tile
    idx = idx.transpose(0, 2, 1, 3).reshape(g_count, m, n_out)
    c = feats_pad.shape[1]
    w2 = blocks * window
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, tile, w2), 2)

    def per_group(_, xs):
        starts_g, idx_g = xs
        win = jax.vmap(
            lambda s: jax.lax.dynamic_slice(feats_pad, (s, 0), (w2, c))
        )(starts_g)

        def per_member(_, idx_k):
            oh = (idx_k.reshape(nt, tile, 1) == iota_w).astype(compute_dtype)
            gathered = jax.lax.dot_general(
                oh, win,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=compute_dtype,
            )
            d_w = jnp.dot(
                gathered.reshape(n_out, c).T, g_out,
                preferred_element_type=jnp.float32,
            )
            return None, d_w

        _, d_ws = jax.lax.scan(per_member, None, idx_g)
        return None, d_ws

    _, d_w = jax.lax.scan(per_group, None, (starts, idx))
    return d_w  # [G, M, C, Cout]


def _esc_scatter(out, feats, esc_k, esc_i, esc_j, w_gm):
    """Escape-entry side path: out[esc_i] += feats[esc_j] @ w_gm[esc_k].

    Plain differentiable JAX (gather + one-hot weight select + scatter-add)
    over the fixed-size entry list — autodiff supplies exact d_feats /
    d_w cotangents for these pairs, complementing the window kernels'
    custom VJP (which covers exactly the mutually-windowed pairs).
    Scatters INTO the kernel output (in its dtype) instead of building a
    dense f32 zeros array + add: the old form cost a full [N, Cout] f32
    materialization + pass per escape-capable conv (trace: ~0.36 ms each
    at [65536, 96])."""
    valid = esc_j >= 0
    gf = jnp.where(
        valid[:, None], feats[jnp.clip(esc_j, 0)], 0
    )  # [E, C]
    k_count = w_gm.shape[0]
    oh = (
        esc_k[:, None] == jnp.arange(k_count, dtype=jnp.int32)[None, :]
    ).astype(gf.dtype)  # [E, K]
    contrib = jnp.einsum(
        "ek,ec,kcd->ed", oh, gf, w_gm,
        preferred_element_type=jnp.float32,
    )
    return out.at[jnp.clip(esc_i, 0)].add(
        jnp.where(valid[:, None], contrib, 0.0).astype(out.dtype),
        mode="drop",
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _window_conv_core(feats_pad, starts, idx, inv_starts, inv_idx,
                      tile, inv_tile, window, compute_dtype, blocks,
                      inv_blocks, w_perm):
    return _window_gather_matmul(
        feats_pad, starts, idx, w_perm, tile, window, compute_dtype,
        blocks, out_dtype=compute_dtype,
    )


def _core_fwd(feats_pad, starts, idx, inv_starts, inv_idx, tile, inv_tile,
              window, compute_dtype, blocks, inv_blocks, w_perm):
    out = _window_gather_matmul(
        feats_pad, starts, idx, w_perm, tile, window, compute_dtype,
        blocks, out_dtype=compute_dtype,
    )
    return out, (feats_pad, starts, idx, inv_starts, inv_idx, w_perm)


def _core_bwd(tile, inv_tile, window, compute_dtype, blocks, inv_blocks,
              res, g):
    (feats_pad, starts, idx, inv_starts, inv_idx, w_perm) = res
    n_pad, cin = feats_pad.shape
    n_in = n_pad - blocks * window
    gc = g.astype(compute_dtype)
    g_pad = jnp.concatenate(
        [gc, jnp.zeros((inv_blocks * window, gc.shape[1]), gc.dtype)], axis=0
    )
    # d_feats: the transpose map is the per-offset inverse of the forward
    # map, so scatter-add(d) == windowed gather along the inverse plan with
    # channel-transposed weights. Gather-only backward.
    w_t = jnp.swapaxes(w_perm, -1, -2)
    if _use_pallas():
        # fused: the inverse map pairs the same (input, output) pairs as
        # the forward map, so d_w = feats^T @ gathered-gradients falls out
        # of the d_feats pass — one window sweep for both cotangents
        from nerf_downstream_tpu.ops.pallas.window_gather import (
            window_bwd_pallas,
        )

        d_in, d_w = window_bwd_pallas(
            g_pad, feats_pad[:n_in], inv_starts, inv_idx,
            w_t, inv_tile, window, compute_dtype, inv_blocks,
        )
    else:
        d_in = _window_gather_matmul(
            g_pad, inv_starts, inv_idx, w_t, inv_tile, window,
            compute_dtype, inv_blocks, out_dtype=compute_dtype,
        )[:n_in]
        d_w = _window_dw(
            feats_pad, starts, idx, gc, tile, window,
            compute_dtype, blocks,
        )
    d_feats = jnp.concatenate(
        [d_in, jnp.zeros((blocks * window, cin), d_in.dtype)], axis=0
    ).astype(feats_pad.dtype)
    return d_feats, None, None, None, None, d_w.astype(w_perm.dtype)


_window_conv_core.defvjp(_core_fwd, _core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _window_conv_core_dw_only(feats_pad, starts, idx, tile, window,
                              compute_dtype, blocks, w_perm):
    return _window_gather_matmul(
        feats_pad, starts, idx, w_perm, tile, window, compute_dtype,
        blocks, out_dtype=compute_dtype,
    )


def _core_dw_fwd(feats_pad, starts, idx, tile, window, compute_dtype,
                 blocks, w_perm):
    out = _window_gather_matmul(
        feats_pad, starts, idx, w_perm, tile, window, compute_dtype,
        blocks, out_dtype=compute_dtype,
    )
    return out, (feats_pad, starts, idx, w_perm)


def _core_dw_bwd(tile, window, compute_dtype, blocks, res, g):
    (feats_pad, starts, idx, w_perm) = res
    d_w = _window_dw(
        feats_pad, starts, idx, g.astype(compute_dtype), tile, window,
        compute_dtype, blocks,
    )
    # the caller DECLARED the input non-differentiated (input_grad=False:
    # first-layer convs whose input is the data batch) — d_feats is a
    # zeros cotangent, and the whole d_feats window sweep (the fused
    # backward's expensive half; ~half the stem conv's bwd time at
    # [65536, 27]) never runs
    return jnp.zeros_like(feats_pad), None, None, d_w.astype(w_perm.dtype)


_window_conv_core_dw_only.defvjp(_core_dw_fwd, _core_dw_bwd)


def block_live_spec(
    block_live: np.ndarray, perm: tuple, g_count: int, m: int
) -> tuple:
    """Static per-(group, member) live (Cin-block, Cout-block) pair spec
    from per-offset block liveness bool[K', nbi, nbo] (rows in the SAME
    offset order the plan was built from — subset/padding already
    applied). Returns nested tuples (hashable, trace-static)."""
    bl = np.asarray(block_live)[list(perm)].reshape(
        g_count, m, *np.asarray(block_live).shape[1:]
    )
    return tuple(
        tuple(
            tuple(
                (int(bi), int(bo))
                for bi, bo in np.argwhere(bl[g, j])
            )
            for j in range(m)
        )
        for g in range(g_count)
    )


def window_conv_apply_blocksparse(
    feats: jax.Array,
    plan: WindowPlan,
    weights: jax.Array,
    block_live: np.ndarray,
    bias: jax.Array | None = None,
    compute_dtype=jnp.float32,
    guard: bool = True,
    block: int = 128,
) -> jax.Array:
    """Inference-only windowed conv that SKIPS dead weight blocks — the
    intra-offset structured-sparsity tier (reference csr/coo spmm,
    sparse_conv.py:122-152, re-expressed at MXU granularity).

    ``block_live`` bool[K', nbi, nbo] marks live (Cin, Cout) blocks per
    offset (ops/weight_sparse.block_live_from_weights), rows aligned with
    ``weights`` [K', Cin, Cout]. Dead members skip their dispatch rows,
    dead Cin blocks their dispatch columns, dead pairs their weight
    matmul. Forward only (no VJP): the pruned-eval path
    (co3d_3d/eval.py --sparsify, layouts csr/coo) is where intra-matrix
    sparsity exists. The XLA fallback runs dense-masked (identical values:
    dead blocks are zero)."""
    n_in, cin = feats.shape
    g_count, _, m, _ = plan.idx.shape
    feats_pad = jnp.concatenate(
        [feats, jnp.zeros((plan.blocks * plan.window, cin), feats.dtype)],
        axis=0,
    ).astype(compute_dtype)
    w = weights.astype(compute_dtype)[jnp.asarray(plan.perm)].reshape(
        g_count, m, cin, weights.shape[-1]
    )
    if _use_pallas():
        from nerf_downstream_tpu.ops.pallas.window_gather import (
            window_gather_matmul_pallas_bs,
        )

        live = block_live_spec(block_live, plan.perm, g_count, m)
        out = window_gather_matmul_pallas_bs(
            feats_pad, plan.starts, plan.idx, w, plan.tile, plan.window,
            compute_dtype, plan.blocks, block, live,
            out_dtype=compute_dtype,
        )
    else:
        out = _window_gather_matmul(
            feats_pad, plan.starts, plan.idx, w, plan.tile, plan.window,
            compute_dtype, plan.blocks, out_dtype=compute_dtype,
        )
    if plan.esc_k is not None:
        out = _esc_scatter(
            out, feats.astype(compute_dtype), plan.esc_k, plan.esc_i,
            plan.esc_j, w.reshape(g_count * m, cin, -1),
        )
    if guard:
        out = out * jnp.where(
            plan.n_escaped > 0, jnp.nan, 1.0
        ).astype(out.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def window_conv_apply(
    feats: jax.Array,
    plan: WindowPlan,
    inv_plan: WindowPlan | None,
    weights: jax.Array,
    bias: jax.Array | None = None,
    compute_dtype=jnp.float32,
    guard: bool = True,
    input_grad: bool = True,
) -> jax.Array:
    """Sparse conv via windowed one-hot gathers (drop-in for
    ``sparse_conv_apply`` where both coordinate sets are key-sorted).

    ``plan``/``inv_plan`` come from ``build_plan`` over the forward and
    transpose kernel maps (CoordinateContext caches both). ``weights``
    [K, Cin, Cout] in kernel-offset order. Returns [N_out, Cout] in
    ``compute_dtype`` (f32 accumulation inside the kernels; one rounding
    on store — bf16 production runs skip the old standalone cast pass).
    """
    if input_grad:
        assert plan.window == inv_plan.window
        # the backward pairs w[k] with inv rows by position: both plans
        # must have been built with the same offsets (same group perm)
        assert plan.perm == inv_plan.perm, (plan.perm, inv_plan.perm)
    n_in, cin = feats.shape
    g_count, _, m, _ = plan.idx.shape
    feats_pad = jnp.concatenate(
        [feats, jnp.zeros((plan.blocks * plan.window, cin), feats.dtype)],
        axis=0,
    ).astype(compute_dtype)
    w = weights.astype(compute_dtype)[jnp.asarray(plan.perm)].reshape(
        g_count, m, cin, weights.shape[-1]
    )
    # the inverse plan's groups order offsets by the NEGATED offsets'
    # (dx, dy); pair weights by the inverse plan's own permutation
    if input_grad:
        out = _window_conv_core(
            feats_pad, plan.starts, plan.idx, inv_plan.starts,
            inv_plan.idx, plan.tile, inv_plan.tile, plan.window,
            compute_dtype, plan.blocks, inv_plan.blocks, w,
        )
    else:
        # input declared non-differentiated (first-layer convs on data):
        # d_w-only backward, no inverse plan, no d_feats sweep
        out = _window_conv_core_dw_only(
            feats_pad, plan.starts, plan.idx, plan.tile, plan.window,
            compute_dtype, plan.blocks, w,
        )
    if plan.esc_k is not None:
        out = _esc_scatter(
            out, feats.astype(compute_dtype), plan.esc_k, plan.esc_i,
            plan.esc_j, w.reshape(g_count * m, cin, -1),
        )
    if guard:
        # fail loud on window escapes (cf. block-cap overflow poison):
        # a silent drop would train on truncated neighborhoods
        bad = plan.n_escaped > 0
        if inv_plan is not None:
            bad = bad | (inv_plan.n_escaped > 0)
        out = out * jnp.where(bad, jnp.nan, 1.0).astype(out.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
