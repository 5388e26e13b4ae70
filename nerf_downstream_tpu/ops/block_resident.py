"""Block-resident stride levels: keep a whole level in the dense layout.

Round-1 block mode densified/undensified around every k3/s1 conv
(~8.5 ms x ~20 convs per Res16UNet step). Here a stride level lives in the
dense [n_blocks * 4^3, C] cell layout end-to-end:

- :class:`BlockVoxels` duck-types :class:`SparseVoxels` (``feats`` are the
  dense cells, ``mask`` is the cell-occupancy mask), so norms, nonlinearities,
  residual adds, skip concats and 1x1 convs run unchanged on cells;
- k3/s1 convs call the halo+conv core directly (no densify/undensify);
- k2/s2 convs and poolings read only cells inside one block (block origins
  are even in cell units, so the 2^3 input window of every output cell stays
  in-block) and re-block into the coarser level with ONE precomputed scatter
  per level transition;
- k2/s2 transpose convs are the adjoint: gather each fine block's 2^3 chunk
  from the coarse level, expand in-block with an einsum.

Invariant: ``BlockVoxels.feats`` is zero at unoccupied cells (including the
sentinel block). Densify establishes it, convs/ReLU/add/concat preserve it,
and every op that breaks it (BN/LN/IN affine, conv bias, transpose-conv
expansion) re-masks its output — the mask select fuses into the producing
elementwise op for free.

Reference semantics being reproduced: MinkowskiConvolution with
kernel_size 2 / stride 2 and its transpose (the Res16UNet level transitions,
co3d_3d/src/models/mink/res16unet.py:236-388), window poolings
(resnet.py:62-64) — re-derived for the TPU block layout, not translated.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from nerf_downstream_tpu.ops.block_conv import (
    BLOCK,
    CELLS,
    BlockLayout,
    block_core5,
    densify,
)
from nerf_downstream_tpu.sparse.types import SparseVoxels

# chunk-cell offsets in cell order (x * 16 + y * 4 + z), x-major 2^3 corner
_CHUNK_OFFS = np.array(
    [i * BLOCK * BLOCK + j * BLOCK + k
     for i in (0, 1) for j in (0, 1) for k in (0, 1)],
    np.int32,
)


@flax.struct.dataclass
class LevelTransition:
    """Fine-level -> coarse-level block mapping (one per stride transition).

    ``slot_base[b]`` is the flat cell index (in the coarse dense layout) of
    fine block ``b``'s 2^3 chunk origin; invalid/unmapped fine blocks point
    past the coarse array (dropped by scatters, zero-read by gathers via
    clipping to the zero sentinel block).
    """

    slot_base: jax.Array  # int32[Bb_fine]
    valid: jax.Array  # bool[Bb_fine]


@flax.struct.dataclass
class BlockVoxels:
    """A stride level resident in the dense block-cell layout.

    Duck-types the ``SparseVoxels`` surface used by layers: ``feats`` are
    cell features [(Bb+1) * 64, C] (sentinel block last, all-zero), ``mask``
    is cell occupancy. ``coords``/``row_mask`` keep the row-level identity of
    the level alive for CoordinateContext caching and row materialization.
    """

    coords: jax.Array  # int32[N, 4] row-level coords of this level
    row_mask: jax.Array  # bool[N]
    feats: jax.Array  # [(Bb+1), 4, 4, 4, C] cells (5-D: the flat form forces
    #     XLA relayout copies around every conv — measured ~100ms/step)
    mask: jax.Array  # bool[(Bb+1), 4, 4, 4] cell occupancy
    layout: BlockLayout
    stride: int = flax.struct.field(pytree_node=False, default=1)

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]

    @property
    def num_channels(self) -> int:
        return self.feats.shape[-1]

    def count(self) -> jax.Array:
        return jnp.sum(self.row_mask.astype(jnp.int32))

    def batch_ids(self, num_batches: int) -> jax.Array:
        """FLAT per-cell batch index (pairs with ``masked_feats``);
        unoccupied cells map to ``num_batches``."""
        bb = self.layout.n_blocks
        blk_b = jnp.where(
            self.layout.block_mask, self.layout.block_coords[:, 0], num_batches
        ).astype(jnp.int32)
        blk_b = jnp.concatenate(
            [blk_b, jnp.full((1,), num_batches, jnp.int32)]
        )
        per_cell = jnp.repeat(blk_b, CELLS, total_repeat_length=(bb + 1) * CELLS)
        return jnp.where(self.mask.reshape(-1), per_cell, num_batches)

    def masked_feats(self) -> jax.Array:
        """FLAT [(Bb+1)*64, C] masked cells — the row-like view for global
        poolings / segment ops; resident convs read ``feats`` (5-D) directly."""
        flat = self.feats.reshape(-1, self.num_channels)
        return jnp.where(self.mask.reshape(-1)[:, None], flat, 0)

    def replace_feats(self, feats: jax.Array) -> "BlockVoxels":
        return self.replace(feats=feats)


def cell_mask_of(layout: BlockLayout) -> jax.Array:
    """Occupancy mask over dense cells ((Bb+1)*64; sentinel block False).

    Valid rows occupy unique cells; invalid rows all carry the sentinel
    slot (``build_block_layout``), so a plain scatter-set is collision-safe.
    """
    bb = layout.n_blocks
    return (
        jnp.zeros(((bb + 1) * CELLS,), bool)
        .at[layout.row_slot]
        .set(layout.row_valid, mode="drop")
    ).reshape(bb + 1, BLOCK, BLOCK, BLOCK)


def overflow_poison(feats: jax.Array, layout: BlockLayout) -> jax.Array:
    """Fail-loud guard: if the block cap overflowed (rows silently dropped),
    poison the level's features with NaN so the loss/metrics surface it at
    the next host fetch instead of training on truncated inputs. One fused
    scalar select per level entry — free when nothing overflows."""
    scale = jnp.where(
        layout.overflow > 0,
        jnp.asarray(float("nan"), feats.dtype),
        jnp.asarray(1.0, feats.dtype),
    )
    return feats * scale


def to_block(sv: SparseVoxels, layout: BlockLayout, cell_mask: jax.Array,
             guard: bool = True) -> BlockVoxels:
    """Enter the block-resident representation (once per level)."""
    c = sv.feats.shape[-1]
    cells = densify(layout, sv.feats, sv.mask).reshape(
        layout.n_blocks + 1, BLOCK, BLOCK, BLOCK, c
    )
    if guard:
        cells = overflow_poison(cells, layout)
    return BlockVoxels(
        coords=sv.coords,
        row_mask=sv.mask,
        feats=cells,
        mask=cell_mask,
        layout=layout,
        stride=sv.stride,
    )


def to_rows(bv: BlockVoxels) -> SparseVoxels:
    """Materialize row features (once, at level exit / model output)."""
    flat = bv.feats.reshape(-1, bv.num_channels)
    rows = flat[bv.layout.row_slot.clip(0, flat.shape[0] - 1)]
    rows = jnp.where(bv.layout.row_valid[:, None], rows, 0)
    return SparseVoxels(
        coords=bv.coords, feats=rows, mask=bv.row_mask, stride=bv.stride
    )


def conv3_cells(bv: BlockVoxels, w: jax.Array) -> jax.Array:
    """k=3/s=1 conv on resident 5-D cells (halo + dense conv, no densify).

    Output is re-masked to uphold the module invariant (feats zero at
    unoccupied cells): the conv writes ghost values into unoccupied cells of
    occupied blocks, and downstream ops that read raw cells (down_conv2,
    down_sample_conv1, pool2_cells) must never see them. The select fuses
    into the conv epilogue — measured free."""
    bb = bv.layout.n_blocks
    c = bv.num_channels
    cout = w.shape[-1]
    out = block_core5(bv.feats, bv.layout.nbr, w, bb, c, cout)
    out = jnp.concatenate(
        [out, jnp.zeros((1, BLOCK, BLOCK, BLOCK, cout), out.dtype)], axis=0
    )
    return jnp.where(bv.mask[..., None], out, 0)


_ZM_K, _ZP_K = 4, 22  # OFFS indices of (0,0,-1) / (0,0,1)


def _zext_impl(blocks_ext, nbr, bb):
    """z-extended tile [Bb, 4, 4, 6, C]: only the two z-face neighbors
    contribute (the ZAXIS halo is 2 slice gathers, not 26)."""
    zm = blocks_ext[:, :, :, 3:4, :][nbr[_ZM_K]]
    zp = blocks_ext[:, :, :, 0:1, :][nbr[_ZP_K]]
    return jnp.concatenate([zm, blocks_ext[:bb], zp], axis=3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _zext(blocks_ext, nbr, bb):
    return _zext_impl(blocks_ext, nbr, bb)


def _zext_fwd(blocks_ext, nbr, bb):
    return _zext_impl(blocks_ext, nbr, bb), nbr


def _zext_bwd(bb, nbr, g):
    """Adjoint as pure gathers (blocks unique, z offsets invert through the
    opposite offset — same trick as the full halo adjoint)."""
    g_ext = jnp.concatenate(
        [g, jnp.zeros((1,) + g.shape[1:], g.dtype)], axis=0
    )
    d = jnp.zeros((bb + 1, BLOCK, BLOCK, BLOCK, g.shape[-1]), g.dtype)
    d = d.at[:bb].set(g[:, :, :, 1:BLOCK + 1, :])
    inv_zm = jnp.where(nbr[_ZP_K] < bb, nbr[_ZP_K], bb)
    inv_zp = jnp.where(nbr[_ZM_K] < bb, nbr[_ZM_K], bb)
    d = d.at[:bb, :, :, BLOCK - 1 : BLOCK, :].add(
        g_ext[:, :, :, 0:1, :][inv_zm]
    )
    d = d.at[:bb, :, :, 0:1, :].add(
        g_ext[:, :, :, BLOCK + 1 : BLOCK + 2, :][inv_zp]
    )
    return d, None


_zext.defvjp(_zext_fwd, _zext_bwd)


def conv3_zaxis_cells(bv: BlockVoxels, w3: jax.Array) -> jax.Array:
    """ZAXIS k=[1,1,3]/s=1 conv on resident cells (the reference's
    weight-sparse inference offset subset, sparse_conv.py:346-379): the
    halo shrinks to the two z-face slices. ``w3``: [3, Cin, Cout] in dz
    order (-1, 0, +1). Output re-masked (module invariant)."""
    bb = bv.layout.n_blocks
    c = bv.num_channels
    cout = w3.shape[-1]
    tile = _zext(bv.feats, bv.layout.nbr, bb)  # [Bb, 4, 4, 6, C]
    # out[z] = sum_dz w3[dz] in[z + dz]; tile z is shifted by +1
    filt = w3.reshape(1, 1, 3, c, cout)
    out = jax.lax.conv_general_dilated(
        tile, filt, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    out = jnp.concatenate(
        [out, jnp.zeros((1, BLOCK, BLOCK, BLOCK, cout), out.dtype)], axis=0
    )
    return jnp.where(bv.mask[..., None], out, 0)


def _w222(w: jax.Array, cin: int, cout: int) -> jax.Array:
    # kernel_offsets order is x fastest -> reshape [z, y, x, ci, co],
    # transpose spatial to (x, y, z) to match the cell layout.
    return jnp.transpose(w.reshape(2, 2, 2, cin, cout), (2, 1, 0, 3, 4))


def _blocks_of(bv: BlockVoxels) -> jax.Array:
    return bv.feats[: bv.layout.n_blocks]


def down_conv2(bv: BlockVoxels, w: jax.Array, coarse_layout: BlockLayout,
               trans: LevelTransition, cout: int) -> jax.Array:
    """k=2/s=2 conv: a strided VALID ``lax.conv`` per block, then one
    re-block scatter.

    Returns coarse dense cells [(Bbc+1)*CELLS, cout].
    w: [8, Cin, Cout] in kernel-offset order. (An einsum over the 8-D
    chunk view computes the same thing but forces ~2ms layout-churn copies
    of [Bb,2,2,2,2,2,2,C] per call — XLA-trace finding.)
    """
    cin = bv.num_channels
    chunk = jax.lax.conv_general_dilated(
        _blocks_of(bv), _w222(w, cin, cout), (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )  # [Bb, 2, 2, 2, Cout]
    return _scatter_chunks(
        chunk.astype(bv.feats.dtype).reshape(-1, 8, cout),
        coarse_layout, trans,
    )


def _scatter_chunks(chunk, coarse_layout, trans):
    """[Bbf, 8, C] chunks -> coarse dense 5-D cells (no collisions: fine
    blocks are unique, so (coarse block, chunk corner) pairs are unique)."""
    bbc = coarse_layout.n_blocks
    cout = chunk.shape[-1]
    slots = trans.slot_base[:, None] + jnp.asarray(_CHUNK_OFFS)[None, :]
    slots = jnp.where(trans.valid[:, None], slots, (bbc + 1) * CELLS)
    flat = (
        jnp.zeros(((bbc + 1) * CELLS, cout), chunk.dtype)
        .at[slots.reshape(-1)]
        .set(chunk.reshape(-1, cout), mode="drop")
    )
    return flat.reshape(bbc + 1, BLOCK, BLOCK, BLOCK, cout)


def _gather_chunks(coarse_cells5, trans):
    """Coarse dense 5-D cells -> [Bbf, 2, 2, 2, C] chunks (invalid fine
    blocks read the all-zero sentinel block)."""
    c = coarse_cells5.shape[-1]
    coarse_flat = coarse_cells5.reshape(-1, c)
    n = coarse_flat.shape[0]
    base = jnp.where(trans.valid, trans.slot_base, n - CELLS)
    slots = base[:, None] + jnp.asarray(_CHUNK_OFFS)[None, :]
    flat = coarse_flat[slots.reshape(-1)]
    return flat.reshape(-1, 2, 2, 2, c)


def up_conv2(bv_coarse: BlockVoxels, w: jax.Array, fine_layout: BlockLayout,
             fine_cell_mask: jax.Array, trans: LevelTransition,
             cout: int) -> jax.Array:
    """k=2/up-stride=2 transpose conv onto the cached finer level.

    Each fine cell receives exactly one coarse contributor (its covering
    coarse cell) with the weight row of its in-window corner — the adjoint
    of :func:`down_conv2`. Returns fine dense cells, re-masked (expansion
    writes into non-existent fine cells of occupied blocks).
    """
    cin = bv_coarse.num_channels
    chunk = _gather_chunks(bv_coarse.feats, trans)  # [Bbf, 2, 2, 2, Cin]
    # transpose conv as lhs-dilated conv with per-axis-reversed filter:
    # out[x] = chunk[x//2] . W[x%2] per axis
    filt = _w222(w, cin, cout)[::-1, ::-1, ::-1]
    out = jax.lax.conv_general_dilated(
        chunk, filt, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
        lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ).astype(bv_coarse.feats.dtype)  # [Bbf, 4, 4, 4, Cout]
    out = jnp.concatenate(
        [out, jnp.zeros((1, BLOCK, BLOCK, BLOCK, cout), out.dtype)], 0
    )
    return jnp.where(fine_cell_mask[..., None], out, 0)


def down_sample_conv1(bv: BlockVoxels, w1: jax.Array,
                      coarse_layout: BlockLayout,
                      trans: LevelTransition) -> jax.Array:
    """k=1/s=2 conv (ResNet downsample shortcut): sample the window origin
    cell of each chunk, apply the 1x1 weight, re-block."""
    cin = bv.num_channels
    cout = w1.shape[-1]
    origin = _blocks_of(bv)[:, ::2, ::2, ::2, :]  # [Bbf, 2, 2, 2, Cin]
    chunk = jnp.einsum(
        "bijkc,cd->bijkd", origin, w1, preferred_element_type=jnp.float32
    ).astype(bv.feats.dtype)
    return _scatter_chunks(chunk.reshape(-1, 8, cout), coarse_layout, trans)


def pool2_cells(bv: BlockVoxels, mode: str, coarse_layout: BlockLayout,
                trans: LevelTransition) -> jax.Array:
    """k=2/s=2 window pooling in-block (sum / avg over present cells / max),
    matching ``ops.pool.window_pool`` semantics on the kernel map.

    Implemented as 8 strided slices combined elementwise (NOT
    ``lax.reduce_window`` with a custom computation, which has no
    reverse-mode autodiff rule, and NOT an 8-D window reshape, which forces
    XLA relayout copies — round-2 trace lesson)."""
    c = bv.num_channels
    bbf = bv.layout.n_blocks
    blocks = _blocks_of(bv)
    m = bv.mask[:bbf][..., None]

    def corners(x):
        return [
            x[:, i::2, j::2, k::2]
            for i in (0, 1) for j in (0, 1) for k in (0, 1)
        ]

    if mode == "max":
        neg = jnp.asarray(jnp.finfo(jnp.float32).min, bv.feats.dtype)
        parts = corners(jnp.where(m, blocks, neg))
        red = parts[0]
        for p in parts[1:]:
            red = jnp.maximum(red, p)
        red = jnp.where(red == neg, 0, red)
    else:
        parts = corners(jnp.where(m, blocks, 0).astype(jnp.float32))
        red = sum(parts[1:], parts[0])
        if mode == "avg":
            mparts = corners(
                jnp.broadcast_to(m, blocks.shape).astype(jnp.float32)
            )
            cnt = sum(mparts[1:], mparts[0])
            red = red / jnp.maximum(cnt, 1.0)
        elif mode != "sum":
            raise ValueError(f"unknown pool mode {mode!r}")
        red = red.astype(bv.feats.dtype)
    return _scatter_chunks(red.reshape(-1, 8, c), coarse_layout, trans)


def build_level_transition(fine_layout: BlockLayout,
                           coarse_layout: BlockLayout,
                           coarse_grid, coarse_origin,
                           num_batches: int,
                           coarse_block_extent: int) -> LevelTransition:
    """Map each fine block to its covering coarse block's chunk slot.

    Fine block (b, x, y, z) covers fine cells [4x, 4x+4) -> coarse cells
    [2x, 2x+2): the chunk at coarse block floor(xyz/2), corner xyz mod 2.
    Lookup rides the coarse layout's block grid index (one gather).
    """
    from nerf_downstream_tpu.sparse.kernels import lookup_grid

    fb = fine_layout.block_coords
    bbc = coarse_layout.n_blocks
    q = jnp.concatenate([fb[:, :1], fb[:, 1:] // 2], axis=1)
    cb_rank = lookup_grid(
        coarse_grid, coarse_origin, num_batches, coarse_block_extent, 1,
        q, fine_layout.block_mask, bbc,
    )
    corner = fb[:, 1:] % 2
    base = (
        cb_rank * CELLS
        + corner[:, 0] * (2 * BLOCK * BLOCK)
        + corner[:, 1] * (2 * BLOCK)
        + corner[:, 2] * 2
    ).astype(jnp.int32)
    valid = fine_layout.block_mask & (cb_rank < bbc)
    return LevelTransition(slot_base=base, valid=valid)
