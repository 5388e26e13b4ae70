"""Per-forward coordinate context: kernel-map, grid-index, stride caching.

MinkowskiEngine caches coordinate maps and kernel maps in its
CoordinateManager so that the many convs sharing a stride level reuse one
map (reference: sparse_conv.py:397-405 fetches cached maps by
CoordinateMapKey). Here the equivalent is a Python dict keyed by the
*traced array identities* of the coordinate sets: within one ``jit`` trace,
the same coordinate arrays are the same Python objects, so every conv at a
level reuses a single lookup-structure subgraph.

Two kernel-map builders:
- dense-grid index (default when ``grid_extent`` is set): one scatter per
  coordinate set, one gather per map — the TPU-fast path (binary search is
  both a Mosaic compile bomb and latency-bound at runtime);
- sort + vectorized binary search: unbounded extent fallback (e.g. outdoor
  SemanticKITTI at fine strides). Select via
  ``CoordinateContext.grid_extent = None``.

The transpose map of an already-built forward map is derived by a cheap
scatter inversion instead of a fresh lookup.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nerf_downstream_tpu import config as cfg
from nerf_downstream_tpu.sparse import kernels
from nerf_downstream_tpu.sparse.types import SparseVoxels


@cfg.configurable("CoordinateContext")
class CoordinateContext:
    def __init__(
        self,
        num_batches: int = 1,
        grid_extent: int | None = None,
        method: str = "auto",
        block_cap_divisor: float = 3,
        block_caps: tuple | None = None,
        overflow_guard: bool = True,
        window_tile: int = 256,
        window_size: int = 512,
        window_blocks: int = 2,
        window_escape_cap=None,
        window_escape_tiles: int = 64,
        window_expand_factor: int = 2,
        window_cross_blocks: int | None = None,
        level_caps: tuple | None = None,
        level_cap_decay: float | None = None,
        valid_offsets_map=None,
        block_live_map=None,
        block_live_granularity: int = 128,
    ):
        # {module path ("block1_0/conv1") -> live offset tuple}: per-layer
        # offset subsets derived from a pruned checkpoint's weights (the
        # reference's per-layer valid_kernel, sparse_conv.py:346-379).
        # Set programmatically by co3d_3d/eval.py --sparsify for
        # csr/coo/strided layouts; consulted by mode-1 (SPARSE) convs.
        self.valid_offsets_map = valid_offsets_map
        # {module path -> bool[K, nbi, nbo]}: per-offset weight-block
        # liveness at MXU (128) granularity — the intra-offset structured
        # tier of the pruned-eval path (utils/prune.block_live_map; the
        # TPU re-expression of the reference's csr/coo spmm,
        # sparse_conv.py:122-152). Consulted by windowed s1 convs at
        # inference; dead blocks skip dispatch + weight matmuls
        # (ops/window_conv.window_conv_apply_blocksparse). The
        # granularity is the MXU tile edge (128) in production; tests
        # shrink it to exercise the tier at toy channel counts.
        self.block_live_map = block_live_map
        self.block_live_granularity = block_live_granularity
        # grid_extent is configured per dataset (coordinate span in finest
        # voxel units, e.g. ``CoordinateContext.grid_extent = 320`` for
        # PeRFception-ScanNet); None selects the unbounded search builder.
        # method "auto" (the default) resolves to the FASTEST proven path:
        # block-resident levels whenever a grid_extent is configured
        # (individual convs that are block-ineligible — dilation>1, offset
        # subsets — fall back to the row path per-op). "row" forces the
        # row/gather path; "block" routes k3/s1 convs through the per-op
        # block-dense path (ops/block_conv.py, densify per conv);
        # "block_resident" keeps each stride level in the dense block layout
        # end-to-end (ops/block_resident.py). Capacity per level: block_caps[i]
        # (i = log2 of the level's relative stride, from dataset statistics)
        # when given, else capacity // (block_cap_divisor * stride^2) —
        # surface shells thin ~quadratically under coarsening. With
        # overflow_guard, a level whose occupied blocks exceed the cap
        # poisons its features with NaN (fail loud, never train on
        # silently-truncated inputs).
        self.num_batches = num_batches
        self.grid_extent = grid_extent
        self.method = method
        self.block_cap_divisor = block_cap_divisor
        self.block_caps = block_caps
        self.overflow_guard = overflow_guard
        # windowed-gather conv knobs (ops/window_conv.py): per-dataset like
        # grid_extent; escapes NaN-poison (raise window_size if they occur)
        self.window_tile = window_tile
        self.window_size = window_size
        # coverage = window_blocks * window_size rows per tile; smaller
        # window_size with more blocks = same reach, finer start
        # quantization (less wasted gather arithmetic)
        self.window_blocks = window_blocks
        # escape fallback for SAME-SET plans: entries whose neighbor falls
        # outside the window run through a tiny gather/scatter side path
        # instead of poisoning — coverage can then be sized for the common
        # case, not the worst outlier tile. int = cap for every level;
        # tuple = per-level (log2 of absolute stride, like level_caps);
        # None/0 = off (escapes poison, the strict default). Overflowing
        # the cap (or window_escape_tiles candidate tiles) still poisons.
        # window_escape_tiles is int-or-per-level-tuple alike: the
        # candidate search costs ~tiles * M * tile * slice compares
        # independent of level size, so deep levels should bind few.
        self.window_escape_cap = window_escape_cap
        self.window_escape_tiles = window_escape_tiles
        # EXPANDING cross-set maps (stride-2 down convs consume ~4-8 input
        # ranks per output row) get window_expand_factor * window_blocks
        # coverage blocks at half the tile — decoupled from the same-set
        # blocks so same-set coverage can shrink (with the escape
        # fallback) without starving down-conv spans
        self.window_expand_factor = window_expand_factor
        # CROSS-SET plans (down convs + transpose convs) have no escape
        # fallback — their coverage is a hard correctness bound — but
        # their conv cost is ~8x below the same-set stride-1 stages (they
        # run at the coarse level's tile count). Decoupling their block
        # count lets the expensive same-set coverage shrink to the
        # escape-fallback frontier while cross spans stay safely covered.
        # None = follow window_blocks (the historical coupling).
        self.window_cross_blocks = window_cross_blocks
        # per-level ROW capacities (level i = log2 of absolute tensor
        # stride, like block_caps): occupied rows of surface-shell data
        # thin ~4x per stride doubling, so carrying the finest capacity
        # through every level wastes capacity-proportional work in every
        # op. Derived from dataset statistics; a level whose unique coords
        # exceed its cap NaN-poisons that level's features (fail loud,
        # same contract as block-cap overflow / window escapes).
        self.level_caps = level_caps
        # fraction-based alternative to absolute level_caps: each stride
        # doubling caps the level at ceil(decay * input capacity) rounded
        # up to a window_tile multiple. Surface shells thin ~4x per
        # doubling, so 0.5 carries ~2x slack; random/volumetric data does
        # NOT thin like that — only bind this for shell-like datasets (the
        # overflow guard NaN-poisons loudly on a bad fit).
        self.level_cap_decay = level_cap_decay
        self._window_plans: dict = {}
        self._kmaps: dict = {}
        self._strided: dict = {}
        self._level_overflow: dict = {}
        self._grids: dict = {}
        self._block_layouts: dict = {}
        self._block_grids: dict = {}
        self._cell_masks: dict = {}
        self._transitions: dict = {}

    def use_block_conv(self) -> bool:
        return self.method == "block" and self.grid_extent is not None

    def use_window(self) -> bool:
        """Windowed-gather convs (ops/window_conv.py) — route every conv /
        conv-transpose through monotone-map window gathers."""
        return self.method == "window"

    def window_plan(self, kernel_map, n_in: int, offsets, expansion: int = 1):
        """Window plan for a monotone kernel map (cached per map).

        ``expansion``: input-rank advance per output row — (out_stride /
        in_stride)^3 for maps into a coarser set (a stride-2 down conv
        consumes up to 8 fine ranks per coarse row), 1 otherwise.
        """
        key = (id(kernel_map),)
        if key not in self._window_plans:
            from nerf_downstream_tpu.ops.window_conv import build_plan

            self._window_plans[key] = build_plan(
                kernel_map, n_in, offsets,
                tile=self.window_tile, window=self.window_size,
                expansion=expansion,
            )
        return self._window_plans[key]

    @staticmethod
    def _per_level(value, stride: int) -> int:
        if value is None:
            return 0
        if isinstance(value, (tuple, list)):
            level = max(0, int(round(float(np.log2(max(stride, 1))))))
            return int(value[min(level, len(value) - 1)])
        return int(value)

    def escape_cap_for(self, stride: int) -> int:
        return self._per_level(self.window_escape_cap, stride)

    def escape_tiles_for(self, stride: int) -> int:
        # the candidate-tile search costs ~TE * M * tile * slice compares
        # regardless of the level's size — deeper (smaller) levels should
        # bind far fewer tiles (they have proportionally fewer escapes)
        return self._per_level(self.window_escape_tiles, stride) or 64

    def window_plan_direct(self, coords, mask, offsets, transpose=False,
                           stride: int = 1):
        """Window plan for a same-set stride-preserving conv, built straight
        from the level's sorted packed keys (no kernel map, no grid index) —
        see ops/window_conv.py::build_plan_direct. Cached per (coords,
        offsets, transpose) like kernel maps. ``stride`` selects the
        level's escape cap (see ``window_escape_cap``)."""
        key = (id(coords), offsets.tobytes(), bool(transpose), "direct")
        if key not in self._window_plans:
            from nerf_downstream_tpu.ops.window_conv import (
                build_plan_direct,
                negation_perm,
                transpose_plan,
            )

            # a same-set transpose plan is a static relabeling of the
            # forward plan when the offset set is symmetric (full k^3):
            # skip the whole key-shift + match pipeline for the second of
            # the pair (measured ~half a level's first-conv device time)
            other = (id(coords), offsets.tobytes(), not transpose, "direct")
            derived = (
                transpose_plan(self._window_plans[other], offsets)
                if other in self._window_plans
                else None
            )
            cap = self.escape_cap_for(stride)
            if cap and negation_perm(offsets) is None:
                cap = 0  # asymmetric subset: strict poison semantics
            self._window_plans[key] = (
                derived
                if derived is not None
                else build_plan_direct(
                    coords, mask, offsets,
                    tile=self.window_tile, window=self.window_size,
                    blocks=self.window_blocks, transpose=transpose,
                    escape_cap=cap,
                    escape_tiles=self.escape_tiles_for(stride),
                )
            )
        return self._window_plans[key]

    def window_plan_cross(
        self, table_sv, query_sv, offsets, transpose=False, expanding=False
    ):
        """Window plan for a cross-set map (strided down conv / transpose
        up conv): neighbor ranks of ``query_sv``'s coords matched in
        ``table_sv``'s sorted key table.

        ``expanding``: the map advances >1 table rank per query row (a
        stride-2 down conv consumes ~4-8 fine ranks per coarse row) —
        halve the tile and widen coverage to 4 window blocks; contracting
        maps (transpose convs: ~1/4 rank per row) keep the same-set
        geometry. Escapes NaN-poison either way (fail loud; raise
        ``window_size`` if it fires)."""
        key = (
            id(table_sv.coords), id(query_sv.coords), offsets.tobytes(),
            bool(transpose), "cross",
        )
        if key not in self._window_plans:
            from nerf_downstream_tpu.ops.window_conv import build_plan_direct

            cross_blocks = self.window_cross_blocks or self.window_blocks
            if expanding:
                tile = max(32, self.window_tile // 2)
                blocks = self.window_expand_factor * cross_blocks
            else:
                tile, blocks = self.window_tile, cross_blocks
            self._window_plans[key] = build_plan_direct(
                table_sv.coords, table_sv.mask, offsets,
                tile=tile, window=self.window_size, blocks=blocks,
                transpose=transpose,
                out_coords=query_sv.coords, out_mask=query_sv.mask,
            )
        return self._window_plans[key]

    def use_block_resident(self) -> bool:
        # "block_resident" pins the pure block-dense path (kept for
        # workloads whose occupancy favors dense 4^3 tiles). The "auto"
        # default resolves to the fully-windowed path (use_window_full).
        return (
            self.method == "block_resident" and self.grid_extent is not None
        )

    def use_window_full(self) -> bool:
        """The fast default (method "auto"/"hybrid" with a configured
        grid_extent): EVERY conv rides sorted-key windowed gathers —
        stride-preserving k3 convs at every level (per-level row caps keep
        the work proportional to live rows), k2/k1 stride-2 down convs and
        k2 transpose up convs as cross-set window plans. No block layouts,
        no grid kernel maps anywhere on this path (see ROADMAP round-3
        measurements). Escape/cap guards NaN-poison on misconfiguration
        (fail loud).

        The path needs only packed-key order, NOT a dense grid, so an
        EXPLICIT ``method = "hybrid"`` also runs without a grid_extent
        (unbounded outdoor datasets like SemanticKITTI — packing covers
        x in [-2^19, 2^19), y/z in [-2^15, 2^15)); "auto" stays
        extent-gated so extent-less configs keep the conservative row
        path unless they opt in."""
        return self.method == "hybrid" or (
            self.method == "auto" and self.grid_extent is not None
        )

    def block_layout(self, coords, mask, stride: int):
        key = (id(coords), stride)
        if key not in self._block_layouts:
            from nerf_downstream_tpu.ops.block_conv import build_block_layout

            # occupied-block count shrinks ~stride^2 at coarser levels for
            # surface-like data (a shell's blocks thin out quadratically as
            # the voxel grid coarsens; measured on the bench workload:
            # 17894 / 3770 / 847 / 210 / 32 blocks at strides 1..16 for a
            # 64k-row batch). Coarse levels carry the wide channels, so cap
            # slack there is the expensive kind — stride^2 scaling keeps
            # them tight while divisor 3 leaves 20-45% headroom at every
            # level. Overflowed blocks would silently drop rows; see
            # BlockLayout.overflow for the diagnostic counter.
            # divisor may be fractional (per-dataset tuning knob)
            if self.block_caps is not None:
                level = max(0, int(round(float(np.log2(stride)))))
                cap = int(
                    self.block_caps[min(level, len(self.block_caps) - 1)]
                )
            else:
                cap = max(
                    int(coords.shape[0] / (self.block_cap_divisor * stride * stride)),
                    64,
                )
            # occupied blocks can never exceed valid rows, and layouts with
            # cap > capacity would break the sentinel convention
            cap = min(cap, coords.shape[0])
            self._block_layouts[key] = build_block_layout(
                coords, mask, stride, cap, self.num_batches,
                self.grid_extent or 512,
            )
        return self._block_layouts[key]

    def cell_mask(self, layout):
        key = id(layout)
        if key not in self._cell_masks:
            from nerf_downstream_tpu.ops.block_resident import cell_mask_of

            self._cell_masks[key] = cell_mask_of(layout)
        return self._cell_masks[key]

    def to_block(self, sv):
        """Enter the block-resident layout for ``sv``'s level (cached maps)."""
        from nerf_downstream_tpu.ops import block_resident as br

        layout = self.block_layout(sv.coords, sv.mask, sv.stride)
        return br.to_block(
            sv, layout, self.cell_mask(layout), guard=self.overflow_guard
        )

    def level_transition(self, bv):
        """(coarse SparseVoxels, coarse layout, coarse cell mask, transition)
        for the stride-2 step down from block-resident level ``bv``."""
        return self.level_transition_for(
            bv.coords, bv.row_mask, bv.stride, bv.feats.dtype
        )

    def level_transition_for(self, coords, row_mask, stride, dtype):
        key = (id(coords), stride)
        if key not in self._transitions:
            from nerf_downstream_tpu.ops import block_resident as br
            from nerf_downstream_tpu.ops.block_conv import block_grid

            fine_sv = SparseVoxels(
                coords=coords,
                feats=jnp.zeros((coords.shape[0], 0), dtype),
                mask=row_mask,
                stride=stride,
            )
            coarse_sv = self.strided(fine_sv, 2)
            coarse_layout = self.block_layout(
                coarse_sv.coords, coarse_sv.mask, coarse_sv.stride
            )
            gkey = (id(coarse_sv.coords), coarse_sv.stride)
            if gkey not in self._block_grids:
                self._block_grids[gkey] = block_grid(
                    coarse_layout.block_coords,
                    coarse_layout.block_mask,
                    self.num_batches,
                    self.grid_extent or 512,
                )
            grid, origin, extent = self._block_grids[gkey]
            trans = br.build_level_transition(
                self.block_layout(coords, row_mask, stride),
                coarse_layout, grid, origin, self.num_batches, extent,
            )
            self._transitions[key] = (
                coarse_sv, coarse_layout, self.cell_mask(coarse_layout), trans
            )
        return self._transitions[key]

    def strided(self, sv: SparseVoxels, stride: int) -> SparseVoxels:
        key = (id(sv.coords), sv.stride, stride)
        if key not in self._strided:
            out, lost = kernels.stride_coords_capped(
                sv, stride,
                self.level_cap(sv.stride * stride, sv.capacity, sv.stride),
            )
            self._strided[key] = out
            self._level_overflow[id(out.coords)] = lost
        return self._strided[key]

    def level_cap(
        self, stride: int, in_capacity: int | None = None,
        in_stride: int = 1,
    ) -> int | None:
        """Row capacity for the level at absolute tensor stride ``stride``.

        Absolute ``level_caps`` win; otherwise ``level_cap_decay`` derives
        the cap from the input level's capacity (``in_capacity`` at
        ``in_stride``): decay per stride doubling, rounded up to a
        window_tile multiple so window plans keep whole tiles.
        """
        if self.level_caps is not None:
            level = max(0, int(round(float(np.log2(max(stride, 1))))))
            return int(self.level_caps[min(level, len(self.level_caps) - 1)])
        if self.level_cap_decay is not None and in_capacity is not None:
            doublings = max(
                0,
                int(round(float(np.log2(max(stride, 1)))))
                - int(round(float(np.log2(max(in_stride, 1))))),
            )
            cap = int(in_capacity * self.level_cap_decay ** doublings)
            tile = self.window_tile
            cap = max(tile, ((cap + tile - 1) // tile) * tile)
            return min(cap, in_capacity)
        return None

    def level_poison(self, coords, feats):
        """NaN-poison ``feats`` if the level at ``coords`` overflowed its
        row cap (valid coordinates were sliced off by level_caps) — the
        fail-loud counterpart of BlockLayout.overflow."""
        lost = self._level_overflow.get(id(coords))
        if lost is None or not self.overflow_guard:
            return feats
        scale = jnp.where(lost > 0, jnp.float32(jnp.nan), jnp.float32(1.0))
        return feats * scale.astype(feats.dtype)

    def _use_grid(self) -> bool:
        return self.method != "search" and self.grid_extent is not None

    def grid_index(self, coords, mask, stride: int):
        key = (id(coords), stride)
        if key not in self._grids:
            self._grids[key] = kernels.build_grid_index(
                coords, mask, self.num_batches, self.grid_extent, stride
            )
        return self._grids[key]

    def kernel_map(
        self,
        in_coords: jax.Array,
        in_mask: jax.Array,
        out_coords: jax.Array,
        out_mask: jax.Array,
        offsets: np.ndarray,
        transpose: bool = False,
        in_stride: int = 1,
    ) -> jax.Array:
        okey = offsets.tobytes()
        key = (id(in_coords), id(out_coords), okey, transpose)
        if key in self._kmaps:
            return self._kmaps[key]
        # A transpose map is the inversion of the corresponding forward map;
        # if that one exists, invert it with a scatter instead of searching.
        fwd_key = (id(out_coords), id(in_coords), okey, not transpose)
        if fwd_key in self._kmaps:
            km = invert_kernel_map(self._kmaps[fwd_key], out_coords.shape[0])
        elif self._use_grid():
            grid, origin = self.grid_index(in_coords, in_mask, in_stride)
            km = kernels.build_kernel_map_grid(
                grid,
                origin,
                self.num_batches,
                self.grid_extent,
                in_stride,
                in_coords.shape[0],
                out_coords,
                out_mask,
                offsets,
                transpose,
            )
        else:
            km = kernels.build_kernel_map(
                in_coords, in_mask, out_coords, out_mask, offsets, transpose
            )
        self._kmaps[key] = km
        return km


def invert_kernel_map(km: jax.Array, n_out: int) -> jax.Array:
    """Invert a kernel map: fwd[k, o] = i  =>  inv[k, i] = o.

    ``km`` is int32[K, N_fwd_out] with sentinel = the inverse's output
    count; the result is int32[K, n_out] with sentinel = N_fwd_out (the
    inverse's input capacity).
    """
    k, n_fwd_out = km.shape
    sentinel = n_fwd_out
    rows = jnp.broadcast_to(
        jnp.arange(n_fwd_out, dtype=jnp.int32)[None, :], km.shape
    )
    init = jnp.full((k, n_out + 1), sentinel, jnp.int32)
    kk = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[:, None], km.shape)
    inv = init.at[kk.reshape(-1), km.reshape(-1).clip(0, n_out)].set(
        rows.reshape(-1), mode="drop"
    )
    # entries pointing at n_out (missing) were scattered into the extra
    # column; slice it off.
    return inv[:, :n_out]
