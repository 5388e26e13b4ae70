"""Block-dense sparse convolution (TPU-native formulation).

Real Plenoxel grids are surface shells: occupied voxels cluster into
locally-dense 4^3 blocks. Instead of per-row gathers (latency-bound on
TPU), this path:

1. partitions rows into occupied 4^3 blocks (sort/unique on block keys;
   neighbor table via the dense grid index);
2. scatters row features into a dense [n_blocks, 64, C] layout (one
   N-index scatter);
3. builds each block's 6^3 halo tile by gathering only the needed
   boundary slices of neighbors (statically pre-sliced, concat-assembled);
4. runs a dense 3D convolution (lax.conv_general_dilated, VALID) over
   [n_blocks, 6,6,6, C] — the conv reaches ~35% MXU vs ~1-2% for row
   gathers;
5. gathers occupied outputs back to rows.

Custom VJP: the halo adjoint is pure gathers (block uniqueness makes
``nbr[26-k]`` the inverse neighbor map).

Backward is scatter-free: d_dense is a VALID conv of the *halo of the
output cotangent* with the flipped/transposed filter; d_w is the conv
filter-grad on a recomputed input tile.

Measured on TPU v5e at 18% in-block occupancy (64k rows, C=128):
forward 14.8ms vs 24.4ms for the row path (1.65x); fwd+bwd ~37ms vs 27ms
(crosses over in the block path's favor at the ~25-40% occupancies of
real reconstructions). Round-2 plan: block-resident levels (densify once
per stride level, k2/s2 convs become in-block ops) removes the per-conv
densify and one halo, putting fwd+bwd below the row path at all
occupancies. Use directly via ``block_conv3``.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from nerf_downstream_tpu.sparse import packing

import os as _os
BLOCK = int(_os.environ.get("NDT_BLOCK", "4"))
CELLS = BLOCK**3

# neighbor offsets, x fastest (matches kernel_offsets enumeration)
OFFS = np.array(
    [(x, y, z) for z in (-1, 0, 1) for y in (-1, 0, 1) for x in (-1, 0, 1)],
    np.int32,
)


@flax.struct.dataclass
class BlockLayout:
    block_coords: jax.Array  # int32[Bb, 4] in block-grid units
    block_mask: jax.Array  # bool[Bb]
    row_slot: jax.Array  # int32[N]: block_rank * 64 + cell; sentinel Bb*64
    row_valid: jax.Array  # bool[N]
    nbr: jax.Array  # int32[27, Bb]; sentinel Bb
    overflow: jax.Array  # int32 count of dropped rows
    n_blocks: int = flax.struct.field(pytree_node=False, default=0)


def block_grid(block_coords, block_mask, num_batches: int, grid_extent: int):
    """Dense grid index over *block* coordinates (shared by the neighbor
    table and the level-transition lookup). Returns (grid, origin, extent)."""
    from nerf_downstream_tpu.sparse.kernels import build_grid_index

    block_extent = 1 << max(
        1, int(np.ceil(np.log2(max(grid_extent // BLOCK, 2))))
    )
    bgrid, borigin = build_grid_index(
        block_coords, block_mask, num_batches, block_extent, 1
    )
    return bgrid, borigin, block_extent


def build_block_layout(coords, mask, stride: int, n_blocks_cap: int,
                       num_batches: int, grid_extent: int = 512):
    """Partition rows into 4^3 blocks.

    Returns dict with:
      block_coords int32[Bb, 4] (block-grid units), block_mask bool[Bb],
      row_slot int32[N] (block_rank * 64 + cell, sentinel Bb*64),
      nbr int32[27, Bb] neighbor block ranks (sentinel Bb).
    """
    from nerf_downstream_tpu.sparse.kernels import unique_coords

    n = coords.shape[0]
    cell_xyz = coords[:, 1:] // stride
    block_xyz = jnp.floor_divide(cell_xyz, BLOCK)
    in_block = cell_xyz - block_xyz * BLOCK
    bcoords = jnp.concatenate([coords[:, :1], block_xyz], axis=1)
    uniq, uniq_mask, row_to_block = unique_coords(bcoords, mask)
    block_coords = uniq[:n_blocks_cap]
    block_mask = uniq_mask[:n_blocks_cap]
    overflow = row_to_block >= n_blocks_cap
    cell = (in_block[:, 0] * BLOCK + in_block[:, 1]) * BLOCK + in_block[:, 2]
    row_slot = jnp.where(
        mask & ~overflow,
        row_to_block * CELLS + cell,
        n_blocks_cap * CELLS,
    ).astype(jnp.int32)

    # neighbor table via a dense grid over block coords (binary search costs
    # ~100ms at bench scale; the grid lookup is one scalar gather)
    from nerf_downstream_tpu.sparse.kernels import build_kernel_map_grid

    bgrid, borigin, block_extent = block_grid(
        block_coords, block_mask, num_batches, grid_extent
    )
    nbr = build_kernel_map_grid(
        bgrid, borigin, num_batches, block_extent, 1, n_blocks_cap,
        block_coords, block_mask, OFFS,
    )
    return BlockLayout(
        block_coords=block_coords,
        block_mask=block_mask,
        row_slot=row_slot,
        row_valid=mask & ~overflow,
        nbr=nbr,
        overflow=jnp.sum((mask & overflow).astype(jnp.int32)),
        n_blocks=n_blocks_cap,
    )


def densify(layout, feats, mask):
    """Rows -> [Bb * 64 (+64 pad), C] dense block cells.

    Invalid/overflow rows scatter zeros (their slot is the sentinel block,
    which halo gathers read and therefore must stay all-zero)."""
    bb = layout.n_blocks
    c = feats.shape[1]
    valid = layout.row_valid
    dense = (
        jnp.zeros(((bb + 1) * CELLS, c), feats.dtype)
        .at[layout.row_slot]
        .set(jnp.where(valid[:, None], feats, 0), mode="drop")
    )
    return dense


def undensify(layout, dense, n_rows: int):
    """Dense block cells -> rows (padding rows get zeros)."""
    return dense[layout.row_slot.clip(0, dense.shape[0] - 1)]


def _halo_tiles(layout, dense, c):
    return _halo(dense, layout.nbr, layout.n_blocks, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _halo(dense, nbr, n_blocks, c):
    return _halo_tiles_impl(dense, nbr, n_blocks, c)


def _halo_fwd(dense, nbr, n_blocks, c):
    return _halo_tiles_impl(dense, nbr, n_blocks, c), nbr


def _halo_bwd(n_blocks, c, nbr, g):
    return _halo_adjoint(g, nbr, n_blocks, c), None


_halo.defvjp(_halo_fwd, _halo_bwd)


def _halo_adjoint(g, nbr, bb, c):
    """Adjoint as pure gathers: block coords are unique, so the neighbor
    relation inverts through the opposite offset — d_blocks[b][src(k)] +=
    d_tile[nbr[26-k][b]][dst(k)] (OFFS[26-k] == -OFFS[k]). Autodiff would
    instead emit 26 scatter-adds (~2x gather cost on TPU)."""
    g_ext = jnp.concatenate(
        [g, jnp.zeros((1,) + g.shape[1:], g.dtype)], axis=0
    )  # sentinel tile row for missing inverse neighbors

    def src(d):
        if d == -1:
            return (BLOCK - 1, BLOCK)
        if d == 0:
            return (0, BLOCK)
        return (0, 1)

    def dst(d):
        if d == -1:
            return (0, 1)
        if d == 0:
            return (1, BLOCK + 1)
        return (BLOCK + 1, BLOCK + 2)

    d_blocks = jnp.zeros((bb + 1, BLOCK, BLOCK, BLOCK, c), g.dtype)
    d_blocks = d_blocks.at[:bb].set(
        g[:, 1 : BLOCK + 1, 1 : BLOCK + 1, 1 : BLOCK + 1, :]
    )
    for k in range(27):
        dx, dy, dz = (int(v) for v in OFFS[k])
        if (dx, dy, dz) == (0, 0, 0):
            continue
        inv_rows = jnp.where(nbr[26 - k] < bb, nbr[26 - k], bb)
        (sx0, sx1) = src(dx)
        (sy0, sy1) = src(dy)
        (sz0, sz1) = src(dz)
        (tx0, tx1) = dst(dx)
        (ty0, ty1) = dst(dy)
        (tz0, tz1) = dst(dz)
        # pre-slice the tile grad before gathering (gather-then-slice would
        # materialize the full 216-cell tile per offset)
        g_sliced = g_ext[:, tx0:tx1, ty0:ty1, tz0:tz1, :]
        piece = g_sliced[inv_rows]
        d_blocks = d_blocks.at[:bb, sx0:sx1, sy0:sy1, sz0:sz1, :].add(piece)
    return d_blocks.reshape((bb + 1) * CELLS, c)


def _halo_tiles_impl(dense, nbr, bb, c):
    """[Bb, 6, 6, 6, C] halo tiles assembled by hierarchical concatenation.

    The center block is a reshape; each of the 26 neighbors contributes only
    its boundary slice (face 16 cells / edge 4 / corner 1), statically
    pre-sliced from the dense layout *before* the gather so the gather moves
    exactly the needed cells. Concat assembly materializes the tile once
    (chained dynamic-update-slices re-copy the buffer per update) and its
    adjoint is a clean split + per-piece scatter-add."""
    blocks = dense.reshape(bb + 1, BLOCK, BLOCK, BLOCK, c)
    return _halo_tiles_impl5(blocks, nbr, bb, c)


def _halo_tiles_impl5(blocks, nbr, bb, c):
    def src(d):
        if d == -1:
            return (BLOCK - 1, BLOCK)
        if d == 0:
            return (0, BLOCK)
        return (0, 1)

    def piece(dx, dy, dz):
        if (dx, dy, dz) == (0, 0, 0):
            return blocks[:bb]
        k = (dz + 1) * 9 + (dy + 1) * 3 + (dx + 1)
        (sx0, sx1) = src(dx)
        (sy0, sy1) = src(dy)
        (sz0, sz1) = src(dz)
        pre = blocks[:, sx0:sx1, sy0:sy1, sz0:sz1, :]
        return pre[nbr[k]]

    planes = []
    for dz in (-1, 0, 1):
        strips = []
        for dy in (-1, 0, 1):
            strips.append(
                jnp.concatenate(
                    [piece(dx, dy, dz) for dx in (-1, 0, 1)], axis=1
                )
            )
        planes.append(jnp.concatenate(strips, axis=2))
    return jnp.concatenate(planes, axis=3)


def _filt(w, c, cout):
    # w rows enumerate offsets x fastest: index k = (z+1)*9 + (y+1)*3 + (x+1)
    # -> reshape gives [z, y, x, ci, co]; conv spatial dims follow the tile
    # dims (x, y, z) -> transpose to [x, y, z].
    return jnp.transpose(w.reshape(3, 3, 3, c, cout), (2, 1, 0, 3, 4))


def _valid_conv(tile, filt):
    return jax.lax.conv_general_dilated(
        tile, filt, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        # same-dtype in/out keeps VJPs dtype-consistent; the TPU conv
        # accumulates in f32 internally regardless
    )


# ---- 5-D core: cells stay [(Bb+1), 4, 4, 4, C] end-to-end -----------------
# The flat [(Bb+1)*64, C] form forces XLA to relayout around every conv
# (~2ms copies each way per conv at bench scale, ~100ms/step); block-resident
# levels therefore hold the 5-D form and only the flat wrappers below reshape
# (per-op ``block_conv3`` compatibility).


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _halo5(blocks, nbr, bb, c):
    return _halo_tiles_impl5(blocks, nbr, bb, c)


def _halo5_fwd(blocks, nbr, bb, c):
    return _halo_tiles_impl5(blocks, nbr, bb, c), nbr


def _halo5_bwd(bb, c, nbr, g):
    return _halo_adjoint5(g, nbr, bb, c), None


def _halo_adjoint5(g, nbr, bb, c):
    return _halo_adjoint(g, nbr, bb, c).reshape(bb + 1, BLOCK, BLOCK, BLOCK, c)


_halo5.defvjp(_halo5_fwd, _halo5_bwd)


def _block_core_impl5(blocks, nbr, w, bb, c, cout):
    tile = _halo5(blocks, nbr, bb, c)
    return _valid_conv(tile, _filt(w, c, cout))  # [bb, 4, 4, 4, cout]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def block_core5(blocks, nbr, w, bb, c, cout):
    """k3/s1 conv on 5-D resident cells: [(bb+1),4,4,4,C] -> [bb,4,4,4,Cout]."""
    return _block_core_impl5(blocks, nbr, w, bb, c, cout)


def _block_core5_fwd(blocks, nbr, w, bb, c, cout):
    return _block_core_impl5(blocks, nbr, w, bb, c, cout), (blocks, nbr, w)


def _block_core5_bwd(bb, c, cout, res, g):
    blocks, nbr, w = res
    g_blocks = jnp.concatenate(
        [g, jnp.zeros((1, BLOCK, BLOCK, BLOCK, cout), g.dtype)], axis=0
    )
    g_tile = _halo5(g_blocks, nbr, bb, cout)
    filt = _filt(w, c, cout)
    filt_rev = jnp.transpose(filt[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))
    d_blocks = _valid_conv(g_tile, filt_rev)  # [bb, 4,4,4, Cin]
    d_blocks = jnp.concatenate(
        [d_blocks, jnp.zeros((1, BLOCK, BLOCK, BLOCK, c), d_blocks.dtype)],
        axis=0,
    ).astype(blocks.dtype)

    tile = _halo5(blocks, nbr, bb, c)
    g_conv = g.astype(tile.dtype)

    def conv_only(w_):
        return _valid_conv(tile, _filt(w_, c, cout))

    _, vjp = jax.vjp(conv_only, w)
    (d_w,) = vjp(g_conv)
    return d_blocks, None, d_w.astype(w.dtype)


block_core5.defvjp(_block_core5_fwd, _block_core5_bwd)


def _block_core_impl(dense, nbr, w, bb, c, cout):
    tile = _halo(dense, nbr, bb, c)
    out = _valid_conv(tile, _filt(w, c, cout))
    return out.reshape(bb * CELLS, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _block_core(dense, nbr, w, bb, c, cout):
    return _block_core_impl(dense, nbr, w, bb, c, cout)


def _block_core_fwd(dense, nbr, w, bb, c, cout):
    return _block_core_impl(dense, nbr, w, bb, c, cout), (dense, nbr, w)


def _block_core_bwd(bb, c, cout, res, g):
    """Backward without any scatters:
    - d_dense = VALID conv of the *halo of g* with the flipped, transposed
      filter (out[q] = sum_f in[q+f-1] W[f]  =>  d_in[p] = sum_f'
      g[p+f'-1] W[2-f']^T), which pulls neighbor-block cotangents through
      the same gather-based halo;
    - d_w via conv filter-grad on a recomputed input tile (one extra halo)."""
    dense, nbr, w = res
    g_dense = jnp.concatenate(
        [g, jnp.zeros((CELLS, cout), g.dtype)], axis=0
    )
    g_tile = _halo(g_dense, nbr, bb, cout)
    # flipped filter, channels transposed: W'[f'] = W[2 - f']^T per axis
    filt = _filt(w, c, cout)
    filt_rev = jnp.transpose(filt[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))
    d_dense_blocks = _valid_conv(g_tile, filt_rev)  # [Bb, 4,4,4, Cin]
    d_dense = jnp.concatenate(
        [
            d_dense_blocks.reshape(bb * CELLS, c),
            jnp.zeros((CELLS, c), d_dense_blocks.dtype),
        ],
        axis=0,
    ).astype(dense.dtype)

    # filter grad: autodiff of the conv alone, input tile recomputed (one
    # extra halo; cheaper than saving ~450MB tiles per conv as residuals)
    tile = _halo(dense, nbr, bb, c)
    g_conv = g.reshape(bb, BLOCK, BLOCK, BLOCK, cout).astype(tile.dtype)

    def conv_only(w_):
        return _valid_conv(tile, _filt(w_, c, cout))

    _, vjp = jax.vjp(conv_only, w)
    (d_w,) = vjp(g_conv)
    return d_dense, None, d_w.astype(w.dtype)


_block_core.defvjp(_block_core_fwd, _block_core_bwd)


@jax.jit
def block_conv3(layout, feats, mask, w):
    """k=3, stride-1, same-coordinates sparse conv via block-dense tiles.

    w: [27, Cin, Cout] in kernel-offset order (x fastest — matching
    ``kernel_offsets(3, stride)``). Returns row features [N, Cout] f32.
    """
    c = feats.shape[1]
    cout = w.shape[-1]
    bb = layout.n_blocks
    dense = densify(layout, feats, mask)
    out_cells = _block_core(dense, layout.nbr, w, bb, c, cout)
    dense_out = jnp.concatenate(
        [out_cells, jnp.zeros((CELLS, cout), out_cells.dtype)], 0
    )
    rows = dense_out[layout.row_slot.clip(0, dense_out.shape[0] - 1)]
    valid = layout.row_slot < bb * CELLS
    return jnp.where(valid[:, None], rows.astype(jnp.float32), 0.0)
