"""Pallas TPU kernels for the windowed gather-matmul sparse conv.

The XLA formulation (ops/window_conv.py) materializes each offset's
one-hot dispatch matrix in HBM — 27 * N * coverage bytes per conv, the
dominant cost. Here the one-hot never exists outside VMEM: the grid
streams (output-tile, offset-group) steps; per step the pipeline DMAs

  - the tile's ``blocks`` aligned W-row feature blocks (the window),
    driven by the scalar-prefetched ``starts`` table through BlockSpec
    index maps — no per-tile descriptor issue on the scalar core (the
    round-2 dead end that killed per-block DMA gathers, 7.7 us/descriptor);
  - the [M, T] in-window index block and the group's [M, C, Cout] weights;

and the kernel generates onehot(idx) in registers, runs the gather as a
[T, coverage] x [coverage, C] MXU matmul, and accumulates [T, C] x
[C, Cout] into the revisited f32 output block (offset groups are the
innermost, consecutive grid dimension).

Traffic per conv: windows blocks*N*C/tile-reuse bytes per group (vs
27 * N * coverage one-hot bytes) — the arithmetic moves from HBM to the
MXU where it is ~free. ``blocks`` (coverage = blocks * window) widens the
reach for cross-set maps (strided down convs advance ~4-8 input ranks per
output row) without shrinking the tile into Pallas-grid dust.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _win_specs(window, c, blocks):
    """``blocks`` aligned window-block specs driven by the starts table."""
    return [
        pl.BlockSpec(
            (window, c),
            functools.partial(
                lambda j, t, g, st: (st[g, t] // window + j, 0), j
            ),
            memory_space=pltpu.VMEM,
        )
        for j in range(blocks)
    ]


def _fwd_kernel(m, compute_dtype, starts_ref, idx_ref, w_ref, *refs):
    win_refs, out_ref = refs[:-1], refs[-1]
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    win = jnp.concatenate([r[:] for r in win_refs], axis=0)  # [coverage, C]
    w2 = win.shape[0]
    tile = idx_ref.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, w2), 1)
    acc = out_ref[:]
    for j in range(m):
        idx_j = idx_ref[0, 0, j, :].reshape(tile, 1)
        oh = (idx_j == iota).astype(compute_dtype)
        # Mosaic matmuls accumulate in f32 (bf16 acc is rejected); values
        # are exact row selects either way
        gathered = jnp.dot(
            oh, win, preferred_element_type=jnp.float32
        ).astype(compute_dtype)  # [T, C]
        acc = acc + jnp.dot(
            gathered, w_ref[0, j], preferred_element_type=jnp.float32
        )
    out_ref[:] = acc


def window_gather_matmul_pallas(feats_pad, starts, idx, w_perm, tile,
                                window, compute_dtype, blocks=2):
    """sum_{g,m} onehot(idx[g,m]) @ window_g @ w[g,m] -> [N_out, Cout] f32.

    feats_pad [n_in + blocks*W, C] (compute dtype); starts int32[G, nT];
    idx int32[G, M, N_out]; w_perm [G, M, C, Cout] (compute dtype).
    """
    g_count, m, n_out = idx.shape
    nt = n_out // tile
    c = feats_pad.shape[1]
    cout = w_perm.shape[-1]
    idx_p = idx.reshape(g_count, m, nt, tile).transpose(0, 2, 1, 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt, g_count),
        in_specs=[
            pl.BlockSpec(
                (1, 1, m, tile),
                lambda t, g, st: (g, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, m, c, cout),
                lambda t, g, st: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *_win_specs(window, c, blocks),
        ],
        out_specs=pl.BlockSpec(
            (tile, cout), lambda t, g, st: (t, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    w2 = blocks * window
    flops = 2 * g_count * m * (n_out * w2 * c + n_out * c * cout)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, m, compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=blocks * n_out * c * g_count + n_out * cout * 4,
            transcendentals=0,
        ),
    )(starts, idx_p, w_perm, *([feats_pad] * blocks))


def _match_kernel(m, blocks, starts_ref, qh_ref, ql_ref, *refs):
    hi_refs = refs[:blocks]
    lo_refs = refs[blocks:2 * blocks]
    idx_ref = refs[-1]
    win_hi = jnp.concatenate([r[:] for r in hi_refs], axis=0)  # [cov, 1]
    win_lo = jnp.concatenate([r[:] for r in lo_refs], axis=0)
    w2 = win_hi.shape[0]
    tile = qh_ref.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (w2, tile), 0)
    for j in range(m):
        qh = qh_ref[0, 0, j, :].reshape(1, tile)
        ql = ql_ref[0, 0, j, :].reshape(1, tile)
        match = (win_hi == qh) & (win_lo == ql)  # [cov, T]
        # keys are unique, so <=1 match per column; -1 where none
        idx_ref[0, 0, j, :] = jnp.max(jnp.where(match, iota, -1), axis=0)


def window_match_pallas(hi, lo, q_hi, q_lo, starts, tile, window, blocks=2):
    """In-window neighbor indices by key equality: idx int32[G, M, N].

    ``hi``/``lo``: the level's sorted packed keys [N] (uint32);
    ``q_hi``/``q_lo``: per-(group, member) shifted query keys [G, M, N];
    ``starts``: quantized window starts int32[G, nT]. Streams the same
    aligned key windows the conv kernel streams for features; the one-hot
    equality that the conv later rebuilds from ``idx`` is computed here
    against *keys* — so the whole kernel-map + plan pipeline never touches
    HBM at row granularity.
    """
    g_count, m, n_out = q_hi.shape
    nt = n_out // tile
    i32 = jnp.int32
    hi_pad = jnp.concatenate(
        [hi.astype(i32), jnp.full((blocks * window,), -1, i32)]
    )[:, None]
    lo_pad = jnp.concatenate(
        [lo.astype(i32), jnp.full((blocks * window,), -1, i32)]
    )[:, None]
    qh_p = q_hi.astype(i32).reshape(g_count, m, nt, tile).transpose(0, 2, 1, 3)
    ql_p = q_lo.astype(i32).reshape(g_count, m, nt, tile).transpose(0, 2, 1, 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt, g_count),
        in_specs=[
            pl.BlockSpec(
                (1, 1, m, tile),
                lambda t, g, st: (g, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, m, tile),
                lambda t, g, st: (g, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *_win_specs(window, 1, blocks),
            *_win_specs(window, 1, blocks),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, m, tile), lambda t, g, st: (g, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    idx_p = pl.pallas_call(
        functools.partial(_match_kernel, m, blocks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g_count, nt, m, tile), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=3 * g_count * m * n_out * blocks * window,
            bytes_accessed=8 * n_out * (g_count * m + blocks),
            transcendentals=0,
        ),
    )(
        starts, qh_p, ql_p,
        *([hi_pad] * blocks), *([lo_pad] * blocks),
    )
    return idx_p.transpose(0, 2, 1, 3).reshape(g_count, m, n_out)


def _dw_kernel(m, compute_dtype, starts_ref, idx_ref, gout_ref, *refs):
    win_refs, dw_ref = refs[:-1], refs[-1]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    win = jnp.concatenate([r[:] for r in win_refs], axis=0)
    w2 = win.shape[0]
    tile = idx_ref.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, w2), 1)
    gout = gout_ref[:]  # [T, Cout]
    for j in range(m):
        idx_j = idx_ref[0, 0, j, :].reshape(tile, 1)
        oh = (idx_j == iota).astype(compute_dtype)
        gathered = jnp.dot(
            oh, win, preferred_element_type=jnp.float32
        ).astype(compute_dtype)  # [T, C]
        # [C, Cout] = gathered^T @ gout
        dw_ref[0, j] = dw_ref[0, j] + jax.lax.dot_general(
            gathered, gout,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def window_dw_pallas(feats_pad, starts, idx, g_out, tile, window,
                     compute_dtype, blocks=2):
    """d_w[g, m] = gathered[g, m]^T @ g_out -> [G, M, C, Cout] f32."""
    g_count, m, n_out = idx.shape
    nt = n_out // tile
    c = feats_pad.shape[1]
    cout = g_out.shape[-1]
    idx_p = idx.reshape(g_count, m, nt, tile).transpose(0, 2, 1, 3)

    def _dw_win_specs():
        return [
            pl.BlockSpec(
                (window, c),
                functools.partial(
                    lambda j, g, t, st: (st[g, t] // window + j, 0), j
                ),
                memory_space=pltpu.VMEM,
            )
            for j in range(blocks)
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g_count, nt),
        in_specs=[
            pl.BlockSpec(
                (1, 1, m, tile),
                lambda g, t, st: (g, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, cout), lambda g, t, st: (t, 0),
                memory_space=pltpu.VMEM,
            ),
            *_dw_win_specs(),
        ],
        out_specs=pl.BlockSpec(
            (1, m, c, cout), lambda g, t, st: (g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_dw_kernel, m, compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g_count, m, c, cout), jnp.float32),
    )(
        starts, idx_p, g_out.astype(compute_dtype),
        *([feats_pad] * blocks),
    )
