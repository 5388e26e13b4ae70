"""Pallas TPU kernels for the windowed gather-matmul sparse conv.

The XLA formulation (ops/window_conv.py) materializes each offset's
one-hot dispatch matrix in HBM — 27 * N * coverage bytes per conv, the
dominant cost. Here the one-hot never exists outside VMEM: the grid
streams ONE step per output tile; per step the pipeline DMAs

  - EVERY group's ``blocks`` aligned W-row feature blocks (the windows),
    driven by the scalar-prefetched ``starts`` table through BlockSpec
    index maps — no per-tile descriptor issue on the scalar core (the
    round-2 dead end that killed per-block DMA gathers, 7.7 us/descriptor),
    and per-grid-step overhead (DMA issue, semaphores, bubbles) amortized
    over all G groups (a (tile, group) grid measured 20% slower end to end
    at half the step count);
  - the [G, M, T] in-window index block and the full [G, M, C, Cout]
    weights (constant index map — fetched once per call, not per tile);

and the kernel builds one one-hot per (group, member) straight from the
indices, runs the gather as a single stacked [M*T, coverage] x
[coverage, C] MXU matmul per group, and applies the per-member weights
into the revisited f32 output block. (The earlier anchor+shifted-window
+row-mask-select form measured SLOWER: the rolled-window VMEM
materialization and the [T, C] selects cost more than the M-1 one-hot
compares they saved — scratch/kernel_probe.py.)

Traffic per conv: windows blocks*N*C/tile-reuse bytes per group (vs
27 * N * coverage one-hot bytes) — the arithmetic moves from HBM to the
MXU where it is ~free. ``blocks`` (coverage = blocks * window) widens the
reach for cross-set maps (strided down convs advance ~4-8 input ranks per
output row) without shrinking the tile into Pallas-grid dust.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """``NDT_WINDOW_PALLAS=interpret`` runs these kernels through the
    Pallas interpreter on any backend — the CPU correctness tier for
    small hosts (tests/test_window_kernels.py), where the Mosaic compiles
    of the real TPU path are unaffordable."""
    return os.environ.get("NDT_WINDOW_PALLAS") == "interpret"


def _win_specs_all_groups(window, c, blocks, g_count):
    """G x blocks window-block specs for the tile-per-step kernels: grid is
    (nT,) and one step streams every group's window blocks together —
    per-grid-step overhead (DMA issue, semaphores, pipeline bubbles)
    amortizes over G groups instead of being paid G times per tile
    (measured: halving grid steps cut whole-model device time 20%)."""
    return [
        pl.BlockSpec(
            (window, c),
            functools.partial(
                lambda g, j, t, st: (st[g, t] // window + j, 0), g, j
            ),
            memory_space=pltpu.VMEM,
        )
        for g in range(g_count)
        for j in range(blocks)
    ]


def _gather_members(m, compute_dtype, idx_rows, win_refs):
    """[T, C] member-gathered rows via per-member one-hots and ONE stacked
    [M*T, cov] matmul.

    ``idx_rows`` [M, T] (array, already loaded): member j's in-window
    index (-1 when absent — compares to nothing, yielding a zero row).
    The earlier anchor+select form built ONE one-hot and routed
    shifted-window matmul column blocks to members with [T, C] row-mask
    selects; measured on the bench L0 plan (scratch/kernel_probe.py) the
    VPU selects and the rolled-window VMEM materialization cost MORE than
    the M-1 extra one-hot compares they save: direct per-member one-hots
    run the same conv in 1.60 ms vs 2.65 ms (C=96) / 2.43 ms (C=32),
    bit-identical output. Consuming idx directly also drops the
    consecutive-dz-rank invariant, so arbitrary offset subsets (pruned
    kernels) ride this path.
    """
    win = jnp.concatenate([r[:] for r in win_refs], axis=0)  # [cov, C]
    cov, c = win.shape
    tile = idx_rows.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, cov), 1)
    ohs = jnp.concatenate(
        [
            (idx_rows[j].reshape(tile, 1) == iota).astype(compute_dtype)
            for j in range(m)
        ],
        axis=0,
    )  # [M*T, cov]
    # Mosaic matmuls accumulate in f32 (bf16 acc is rejected); values are
    # exact row selects either way
    gall = jnp.dot(
        ohs, win, preferred_element_type=jnp.float32
    ).astype(compute_dtype)  # [M*T, C]
    # kept as a per-member list: Mosaic cannot shape-cast [M, C, Cout]
    # weights to [M*C, Cout], so the weight matmuls stay per-member
    return [gall[j * tile:(j + 1) * tile] for j in range(m)]  # M x [T, C]


def _fwd_kernel(g_count, m, blocks, compute_dtype, starts_ref, idx_ref,
                w_ref, *refs):
    win_refs, out_ref = refs[:-1], refs[-1]
    tile = idx_ref.shape[-1]
    idx_all = idx_ref[:]  # [G, 1, M, T]
    acc = jnp.zeros((tile, out_ref.shape[-1]), jnp.float32)
    for g in range(g_count):
        parts = _gather_members(
            m, compute_dtype, idx_all[g, 0],
            win_refs[g * blocks:(g + 1) * blocks],
        )
        for j in range(m):
            acc = acc + jnp.dot(
                parts[j], w_ref[g, j], preferred_element_type=jnp.float32
            )
    # accumulation stays f32; the store rounds once to the requested
    # output dtype (bf16 in production) — emitting bf16 directly halves
    # the kernel's HBM write AND removes the standalone f32->bf16 cast
    # fusion every conv previously paid (trace: ~0.4-0.6 ms each at
    # [65536, 96])
    out_ref[:] = acc.astype(out_ref.dtype)


def window_gather_matmul_pallas(feats_pad, starts, idx, w_perm,
                                tile, window, compute_dtype, blocks=2,
                                out_dtype=jnp.float32):
    """sum_{g,m} onehot(idx[g,m]) @ window_g @ w[g,m] -> [N, Cout].

    feats_pad [n_in + blocks*W, C] (compute dtype); starts int32[G, nT];
    idx int32[G, nT, M, T] tile-major (in-window indices, -1 = absent —
    the layout the match kernel emits and this kernel's BlockSpec streams,
    so no relayout copy ever materializes between them); w_perm
    [G, M, C, Cout] (compute dtype). Output ``out_dtype`` (f32
    accumulation in-kernel, one rounding on store). Grid is one step per
    output tile: all G groups' windows stream in together and the weights
    live in VMEM for the whole call.
    """
    g_count, nt, m, _ = idx.shape
    n_out = nt * tile
    c = feats_pad.shape[1]
    cout = w_perm.shape[-1]
    idx_p = idx

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (g_count, 1, m, tile),
                lambda t, st: (0, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g_count, m, c, cout),
                lambda t, st: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *_win_specs_all_groups(window, c, blocks, g_count),
        ],
        out_specs=pl.BlockSpec(
            (tile, cout), lambda t, st: (t, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    w2 = blocks * window
    flops = 2 * g_count * (n_out * w2 * m * c + n_out * m * c * cout)
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, g_count, m, blocks, compute_dtype
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, cout), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=blocks * n_out * c * g_count + n_out * cout * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(starts, idx_p, w_perm, *([feats_pad] * g_count * blocks))


def _gather_members_subset(members, compute_dtype, idx_rows, win_live):
    """[len(members)*T, C_live] gathered rows for a STATIC member subset —
    the block-sparse tier skips dead (padded / fully-pruned) members'
    dispatch rows entirely."""
    cov = win_live.shape[0]
    tile = idx_rows.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, cov), 1)
    ohs = jnp.concatenate(
        [
            (idx_rows[j].reshape(tile, 1) == iota).astype(compute_dtype)
            for j in members
        ],
        axis=0,
    )  # [Mlive*T, cov]
    gall = jnp.dot(
        ohs, win_live, preferred_element_type=jnp.float32
    ).astype(compute_dtype)
    return {
        j: gall[p * tile:(p + 1) * tile] for p, j in enumerate(members)
    }


def _fwd_kernel_bs(g_count, m, blocks, compute_dtype, block, live, cout,
                   starts_ref, idx_ref, w_ref, *refs):
    """Block-structured sparse forward: ``live[g][j]`` is a static tuple of
    live (Cin-block, Cout-block) pairs for member j of group g (pairs whose
    weight tile is entirely zero are absent). Compute skipped at three
    levels: dead members contribute no dispatch rows, dead Cin blocks no
    dispatch columns, dead (bi, bo) pairs no weight matmul."""
    win_refs, out_ref = refs[:-1], refs[-1]
    tile = idx_ref.shape[-1]
    idx_all = idx_ref[:]  # [G, 1, M, T]
    c = win_refs[0].shape[-1]
    nbo = -(-cout // block)
    accs: list = [None] * nbo
    for g in range(g_count):
        members = tuple(j for j in range(m) if live[g][j])
        if not members:
            continue
        live_bi = sorted({bi for j in members for bi, _ in live[g][j]})
        win = jnp.concatenate(
            [r[:] for r in win_refs[g * blocks:(g + 1) * blocks]], axis=0
        )  # [cov, C]
        nbi_all = -(-c // block)
        if len(live_bi) == nbi_all:
            # full Cin-block union: dispatch over the window as-is — the
            # packed copy below would cost a [cov, C] VMEM materialization
            # per group for zero dispatch savings (measured 0.82x overall)
            win_live = win
            col_off = {
                bi: (bi * block, min(block, c - bi * block))
                for bi in live_bi
            }
        else:
            col_off = {}
            off = 0
            parts_w = []
            for bi in live_bi:
                wbi = min(block, c - bi * block)
                parts_w.append(win[:, bi * block:bi * block + wbi])
                col_off[bi] = (off, wbi)
                off += wbi
            win_live = (
                parts_w[0] if len(parts_w) == 1
                else jnp.concatenate(parts_w, axis=1)
            )
        gs = _gather_members_subset(
            members, compute_dtype, idx_all[g, 0], win_live
        )
        for j in members:
            gj = gs[j]
            for bi, bo in live[g][j]:
                o, wbi = col_off[bi]
                wbo = min(block, cout - bo * block)
                part = jnp.dot(
                    gj[:, o:o + wbi],
                    w_ref[
                        g, j, bi * block:bi * block + wbi,
                        bo * block:bo * block + wbo,
                    ],
                    preferred_element_type=jnp.float32,
                )
                accs[bo] = part if accs[bo] is None else accs[bo] + part
    outs = [
        accs[bo]
        if accs[bo] is not None
        else jnp.zeros(
            (tile, min(block, cout - bo * block)), jnp.float32
        )
        for bo in range(nbo)
    ]
    full = outs[0] if nbo == 1 else jnp.concatenate(outs, axis=1)
    out_ref[:] = full.astype(out_ref.dtype)


def window_gather_matmul_pallas_bs(feats_pad, starts, idx, w_perm,
                                   tile, window, compute_dtype, blocks,
                                   block, live, out_dtype=jnp.float32):
    """Block-structured sparse variant of ``window_gather_matmul_pallas``
    (forward/inference only — the training path stays dense). ``live`` is
    the static nested liveness spec: per group, per member, a tuple of
    live (Cin-block, Cout-block) index pairs at ``block`` granularity.
    Same plan/window layout as the dense kernel; output f32 [N, Cout]."""
    g_count, nt, m, _ = idx.shape
    n_out = nt * tile
    c = feats_pad.shape[1]
    cout = w_perm.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (g_count, 1, m, tile),
                lambda t, st: (0, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g_count, m, c, cout),
                lambda t, st: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *_win_specs_all_groups(window, c, blocks, g_count),
        ],
        out_specs=pl.BlockSpec(
            (tile, cout), lambda t, st: (t, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    n_pairs = sum(len(mem) for grp in live for mem in grp)
    w2 = blocks * window
    flops = 2 * n_out * (
        sum(
            len({bi for mem in grp for bi, _ in mem})
            * len([j for j in grp if j]) * w2 * block
            for grp in live
        )
        + n_pairs * block * block
    )
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel_bs, g_count, m, blocks, compute_dtype, block,
            live, cout,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, cout), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=blocks * n_out * c * g_count + n_out * cout * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(starts, idx, w_perm, *([feats_pad] * g_count * blocks))


def _match_kernel(g_count, m, blocks, deltas, starts_ref, oh_ref, ol_ref,
                  om_ref, *refs):
    hi_refs = refs[:g_count * blocks]
    lo_refs = refs[g_count * blocks:2 * g_count * blocks]
    idx_ref = refs[-1]
    tile = oh_ref.shape[-1]
    oh = oh_ref[0].reshape(1, tile)  # [1, T] i32 (bit view of uint32 keys)
    ol = ol_ref[0].reshape(1, tile)
    om = om_ref[0].reshape(1, tile)
    sign = jnp.int32(-2147483648)
    inval_h = jnp.int32(-1)  # 0xFFFFFFFF
    inval_l = jnp.int32(-2)  # 0xFFFFFFFE (shift_keys' masked-lo sentinel)
    ol_u = ol ^ sign
    for g in range(g_count):
        win_hi = jnp.concatenate(
            [r[:] for r in hi_refs[g * blocks:(g + 1) * blocks]], axis=0
        )  # [cov, 1]
        win_lo = jnp.concatenate(
            [r[:] for r in lo_refs[g * blocks:(g + 1) * blocks]], axis=0
        )
        w2 = win_hi.shape[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (w2, tile), 0)
        for j in range(m):
            # query keys computed IN-KERNEL from the static per-(g, m)
            # 64-bit delta (uniform unsigned add, bit-identical to
            # packing.shift_keys — same trick as the escape search): the
            # [G, M, N] q_hi/q_lo arrays this kernel used to stream cost
            # two {1,0,2} relayout copies (2 x 0.83 ms/step) plus their
            # producer fusions at bench scale
            wh, wl = deltas[g][j]
            ql = ol + jnp.int32(wl)  # wrapping add == uint32 add
            if wl == 0:
                qh = oh + jnp.int32(wh)
            else:
                carry = ((ql ^ sign) < ol_u).astype(jnp.int32)
                qh = oh + jnp.int32(wh) + carry
            qh = jnp.where(om != 0, qh, inval_h)
            ql = jnp.where(om != 0, ql, inval_l)
            match = (win_hi == qh) & (win_lo == ql)  # [cov, T]
            # keys are unique, so <=1 match per column; -1 where none
            idx_ref[g, 0, j, :] = jnp.max(jnp.where(match, iota, -1), axis=0)


def window_match_pallas(hi, lo, o_hi, o_lo, out_mask, deltas_gm, starts,
                        tile, window, blocks=2):
    """In-window neighbor indices by key equality: idx int32[G, nT, M, T]
    (tile-major — the layout the conv kernels consume directly).

    ``hi``/``lo``: the level's sorted packed keys [N] (uint32);
    ``o_hi``/``o_lo``/``out_mask``: the QUERY set's keys + validity [N]
    (same arrays for same-set plans); ``deltas_gm``: static nested tuple
    [G][M] of (hi, lo) int32-word views of each offset's 64-bit packed-key
    delta (window_conv.build_plan_direct precomputes it); ``starts``:
    quantized window starts int32[G, nT]. The kernel streams the same
    aligned key windows the conv kernel streams for features, shifts each
    tile's query keys in-register per (group, member), and
    equality-matches — the whole kernel-map + plan pipeline never touches
    HBM at row granularity, and no [G, M, N] query array ever exists.
    """
    g_count = len(deltas_gm)
    m = len(deltas_gm[0])
    n_out = o_hi.shape[0]
    nt = n_out // tile
    i32 = jnp.int32
    hi_pad = jnp.concatenate(
        [hi.astype(i32), jnp.full((blocks * window,), -1, i32)]
    )[:, None]
    lo_pad = jnp.concatenate(
        [lo.astype(i32), jnp.full((blocks * window,), -1, i32)]
    )[:, None]
    oh_p = o_hi.astype(i32).reshape(1, n_out)
    ol_p = o_lo.astype(i32).reshape(1, n_out)
    om_p = out_mask.astype(i32).reshape(1, n_out)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (1, tile), lambda t, st: (0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile), lambda t, st: (0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile), lambda t, st: (0, t),
                memory_space=pltpu.VMEM,
            ),
            *_win_specs_all_groups(window, 1, blocks, g_count),
            *_win_specs_all_groups(window, 1, blocks, g_count),
        ],
        out_specs=pl.BlockSpec(
            (g_count, 1, m, tile), lambda t, st: (0, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    idx_p = pl.pallas_call(
        functools.partial(_match_kernel, g_count, m, blocks, deltas_gm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g_count, nt, m, tile), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=3 * g_count * m * n_out * blocks * window,
            bytes_accessed=8 * n_out * blocks + 12 * n_out,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(
        starts, oh_p, ol_p, om_p,
        *([hi_pad] * g_count * blocks), *([lo_pad] * g_count * blocks),
    )
    return idx_p


def _bwd_kernel(g_count, m, blocks, compute_dtype, starts_ref, idx_ref,
                feats_ref, wt_ref, *refs):
    """Fused backward: d_feats AND d_w from ONE pass over the inverse
    plan's gradient windows.

    The inverse map pairs exactly the same (input j, output i) pairs as
    the forward map, so with parts[g][m][j] = g_out[inv_map_{g,m}(j)]:
      d_feats[j] = sum_{g,m} parts[g][m][j] @ w[g,m]^T      (as before)
      d_w[g,m]   = sum_j feats[j]^T parts[g][m][j]
    — the expensive window DMA + anchor one-hot gather is paid once for
    both, eliminating the standalone dw kernel (~1/3 of conv time).
    """
    win_refs = refs[:-2]
    din_ref, dw_ref = refs[-2], refs[-1]
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    idx_all = idx_ref[:]  # [G, 1, M, T]
    feats_tile = feats_ref[:]  # [T, C]
    tile = idx_all.shape[-1]
    acc = jnp.zeros((tile, din_ref.shape[-1]), jnp.float32)
    for g in range(g_count):
        parts = _gather_members(
            m, compute_dtype, idx_all[g, 0],
            win_refs[g * blocks:(g + 1) * blocks],
        )  # M x [T, Co] gathered gradient rows
        for j in range(m):
            acc = acc + jnp.dot(
                parts[j], wt_ref[g, j], preferred_element_type=jnp.float32
            )
            # [C, Co] = feats_tile^T @ parts_j
            dw_ref[g, j] = dw_ref[g, j] + jax.lax.dot_general(
                feats_tile, parts[j],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    # d_feats rounds once on store (production bf16 — the consumer chain
    # is bf16 anyway and previously paid a separate cast pass); the d_w
    # accumulator ref stays f32 (revisited every grid step)
    din_ref[:] = acc.astype(din_ref.dtype)


def window_bwd_pallas(g_pad, feats, inv_starts, inv_idx, w_t,
                      tile, window, compute_dtype, blocks=2):
    """(d_feats [N_in, C] f32, d_w [G, M, C, Cout] f32) in one fused pass.

    g_pad [n_out + blocks*W, Cout] (compute dtype, padded gradient);
    feats [N_in, C] (compute dtype, NOT padded — tiles of the inverse
    plan's output set); inv_* come from the INVERSE plan (inv_idx
    tile-major int32[G, nT, M, T]); w_t [G, M, Cout, C]
    channel-transposed weights in the (shared) forward perm.
    """
    g_count, nt, m, _ = inv_idx.shape
    n_in = nt * tile
    co = g_pad.shape[1]
    c = feats.shape[1]
    idx_p = inv_idx

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (g_count, 1, m, tile),
                lambda t, st: (0, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, c), lambda t, st: (t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g_count, m, co, c),
                lambda t, st: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *_win_specs_all_groups(window, co, blocks, g_count),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile, c), lambda t, st: (t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g_count, m, c, co), lambda t, st: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, g_count, m, blocks, compute_dtype),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_in, c), compute_dtype),
            jax.ShapeDtypeStruct((g_count, m, c, co), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        inv_starts, idx_p, feats, w_t,
        *([g_pad] * g_count * blocks),
    )


def _dw_kernel(g_count, m, blocks, compute_dtype, starts_ref, idx_ref,
               gout_ref, *refs):
    win_refs, dw_ref = refs[:-1], refs[-1]
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    idx_all = idx_ref[:]  # [G, 1, M, T]
    gout = gout_ref[:]  # [T, Cout]
    for g in range(g_count):
        parts = _gather_members(
            m, compute_dtype, idx_all[g, 0],
            win_refs[g * blocks:(g + 1) * blocks],
        )
        for j in range(m):
            # [C, Cout] = gathered_j^T @ gout
            dw_ref[g, j] = dw_ref[g, j] + jax.lax.dot_general(
                parts[j], gout,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def window_dw_pallas(feats_pad, starts, idx, g_out, tile, window,
                     compute_dtype, blocks=2):
    """d_w[g, m] = gathered[g, m]^T @ g_out -> [G, M, C, Cout] f32.

    One grid step per tile (see window_gather_matmul_pallas); ``idx`` is
    tile-major int32[G, nT, M, T]; the [G, M, C, Cout] accumulator block
    is revisited every step.
    """
    g_count, nt, m, _ = idx.shape
    c = feats_pad.shape[1]
    cout = g_out.shape[-1]
    idx_p = idx

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (g_count, 1, m, tile),
                lambda t, st: (0, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, cout), lambda t, st: (t, 0),
                memory_space=pltpu.VMEM,
            ),
            *_win_specs_all_groups(window, c, blocks, g_count),
        ],
        out_specs=pl.BlockSpec(
            (g_count, m, c, cout), lambda t, st: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_dw_kernel, g_count, m, blocks, compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g_count, m, c, cout), jnp.float32),
        interpret=_interpret(),
    )(
        starts, idx_p, g_out.astype(compute_dtype),
        *([feats_pad] * g_count * blocks),
    )
