"""Flax layers over SparseVoxels: conv, conv-transpose, norms, nonlinearities.

Functional re-design of the reference's conv/norm factory layer
(co3d_3d/src/models/mink/modules/common.py:22-204). A layer takes a
``SparseVoxels`` plus a ``CoordinateContext`` (the per-forward kernel-map
cache) and returns a new ``SparseVoxels``; parameters live in flax
collections, statistics in ``batch_stats``.

SyncBatchNorm note: under ``pjit``/GSPMD the masked statistics are global
sums, so cross-replica BN is automatic; ``axis_name`` exists for
``shard_map``/``pmap`` uses (reference's explicit SyncBN conversion:
co3d_3d/train.py:106-107).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nerf_downstream_tpu.ops import block_resident as br
from nerf_downstream_tpu.ops.block_resident import BlockVoxels
from nerf_downstream_tpu.ops.norm import (
    batch_norm_apply,
    instance_norm_stats,
    layer_norm,
    masked_mean_var,
)
from nerf_downstream_tpu.ops.pool import global_pool, window_pool
from nerf_downstream_tpu.ops.sparse_conv import sparse_conv_apply
from nerf_downstream_tpu.ops.window_conv import window_conv_apply
from nerf_downstream_tpu.sparse import kernel_offsets
from nerf_downstream_tpu.sparse.context import CoordinateContext
from nerf_downstream_tpu.sparse.types import SparseVoxels


def as_rows(sv):
    """Materialize a block-resident level back to row features (no-op on
    SparseVoxels) — the boundary for row-semantics consumers (field slicing,
    interpolation, per-point heads)."""
    if isinstance(sv, BlockVoxels):
        return br.to_rows(sv)
    return sv


def _window_groups_ok(offs) -> bool:
    """Windowed gathers need uniform-size (dx, dy) offset groups (full
    kernel grids and ZAXIS subsets qualify; arbitrary pruned subsets may
    not — those fall back to the row gather)."""
    from nerf_downstream_tpu.ops.window_conv import group_offsets

    try:
        group_offsets(offs)
        return True
    except AssertionError:
        return False


def _kaiming_conv_init(key, shape, dtype=jnp.float32):
    """He-normal over fan_in = K * Cin (ME kaiming kernel init)."""
    k, cin, cout = shape
    std = (2.0 / (k * cin)) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


class SparseConv(nn.Module):
    """Sparse convolution. stride>1 emits a strided coordinate set.

    ``conv_mode`` mirrors the reference SparseConvMode (common.py:73-127):
    0 = dense; 2 = ZAXIS (z-column offsets only); a static ``valid_offsets``
    tuple (from pruned weights) subsets the kernel for the weight-sparse
    inference path (sparse_conv.py:346-379)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    compute_dtype: Any = jnp.float32
    conv_mode: int = 0
    valid_offsets: tuple | None = None
    # False declares the INPUT is never differentiated through (first
    # convs whose input is the data batch): the windowed path then runs a
    # d_w-only backward — no inverse plan, no d_feats window sweep
    # (~half a stem conv's backward at [65536, 27])
    input_grad: bool = True

    @nn.compact
    def __call__(
        self, sv: SparseVoxels, ctx: CoordinateContext
    ) -> SparseVoxels:
        cin = sv.num_channels
        if self.kernel_size == 1 and self.stride == 1:
            w = self.param("kernel", _kaiming_conv_init, (1, cin, self.out_channels))
            feats = sv.feats if isinstance(sv, BlockVoxels) else sv.masked_feats()
            out_f = jnp.dot(
                feats.astype(self.compute_dtype),
                w[0].astype(self.compute_dtype),
                preferred_element_type=jnp.float32,
            )
            if self.use_bias:
                out_f = out_f + self.param(
                    "bias", nn.initializers.zeros, (self.out_channels,)
                )
                if isinstance(sv, BlockVoxels):
                    out_f = jnp.where(sv.mask[..., None], out_f, 0)
            return sv.replace(feats=out_f)

        full_offs = kernel_offsets(self.kernel_size, sv.stride, self.dilation)
        subset = self.valid_offsets
        if self.conv_mode == 2 and subset is None:  # ZAXIS
            from nerf_downstream_tpu.ops.weight_sparse import zaxis_offsets

            subset = zaxis_offsets(full_offs)
        if self.conv_mode == 1 and subset is None:  # SPARSE (pruned ckpt)
            # per-layer live offsets derived from the pruned checkpoint
            # (eval.py --sparsify builds the map; reference valid_kernel,
            # sparse_conv.py:346-379); absent entry = not pruned = dense
            vm = getattr(ctx, "valid_offsets_map", None)
            if vm:
                sub = vm.get("/".join(self.path))
                if sub is not None and 0 < len(sub) < len(full_offs):
                    subset = tuple(int(i) for i in sub)

        # a z-column offset subset (the ZAXIS sparsified-inference mode and
        # any pruning that keeps only dx==dy==0 offsets) stays on the block
        # path: its halo is just the two z-face slices
        zaxis_subset = None
        if (
            subset is not None
            and self.kernel_size == 3
            and self.stride == 1
            and len(subset) == 3
        ):
            sub_offs = full_offs[list(subset)]
            if (sub_offs[:, :2] == 0).all() and (
                sorted(sub_offs[:, 2].tolist()) == [-1, 0, 1]
            ):
                zaxis_subset = tuple(
                    int(subset[i]) for i in np.argsort(sub_offs[:, 2])
                )
        blockable = self.dilation == 1 and (
            (subset is None or zaxis_subset is not None)
            and (self.kernel_size == 3 and self.stride == 1)
            or subset is None
            and (
                (self.kernel_size == 2 and self.stride == 2)
                or (self.kernel_size == 1 and self.stride == 2)
            )
        )

        # the fully-windowed default (method "auto"/"hybrid"): every conv
        # rides sorted-key window gathers — s1 k3 convs at EVERY level
        # (per-level row caps keep work proportional to live rows, see
        # CoordinateContext.level_caps), s2 k2/k1 down convs as cross-set
        # plans. No block layouts, no grid kernel maps on this path.
        if ctx.use_window_full() and self.dilation == 1:
            # arbitrary pruned offset subsets ride the windowed path too:
            # non-uniform (dx, dy) groups are padded with zero-weight
            # duplicate slots (the kernels consume per-member indices, so
            # a padded member just multiplies its matches by 0) — compute
            # scales with the live offset count instead of falling back to
            # the dense-masked row path (weight_sparse.pad_offset_groups)
            w_rows = None
            if subset is None:
                offs_w = full_offs
            else:
                offs_w = full_offs[list(subset)]
                if not _window_groups_ok(offs_w):
                    from nerf_downstream_tpu.ops.weight_sparse import (
                        pad_offset_groups,
                    )

                    offs_w, w_rows = pad_offset_groups(full_offs, subset)
            s1_ok = self.kernel_size == 3 and self.stride == 1
            down_ok = (
                self.kernel_size in (1, 2)
                and self.stride == 2
                and subset is None
            )
            if s1_ok or down_ok:
                if isinstance(sv, BlockVoxels):
                    sv = br.to_rows(sv)
                # plans come straight from the level's sorted keys — the
                # row kernel map (grid scatter + K*N gathers, ~45 ms/step
                # at 64k) is never built on this path
                if s1_ok:
                    out_sv = sv
                    plan = ctx.window_plan_direct(
                        sv.coords, sv.mask, offs_w, stride=sv.stride
                    )
                    inv_plan = (
                        ctx.window_plan_direct(
                            sv.coords, sv.mask, offs_w, transpose=True,
                            stride=sv.stride,
                        )
                        if self.input_grad
                        else None
                    )
                else:
                    out_sv = ctx.strided(sv, 2)
                    plan = ctx.window_plan_cross(
                        sv, out_sv, offs_w, expanding=True
                    )
                    inv_plan = ctx.window_plan_cross(
                        out_sv, sv, offs_w, transpose=True
                    )
                w = self.param(
                    "kernel",
                    _kaiming_conv_init,
                    (len(full_offs), cin, self.out_channels),
                )
                if w_rows is not None:
                    w = jnp.where(
                        jnp.asarray(w_rows >= 0)[:, None, None],
                        w[jnp.asarray(np.clip(w_rows, 0, None))],
                        0.0,
                    )
                elif subset is not None:
                    w = w[jnp.asarray(list(subset))]
                b = (
                    self.param(
                        "bias", nn.initializers.zeros, (self.out_channels,)
                    )
                    if self.use_bias
                    else None
                )
                # intra-offset block-structured tier (inference): dead
                # 128x128 weight blocks from a pruned checkpoint skip
                # their dispatch + weight matmuls — the TPU analogue of
                # the reference's per-offset csr/coo spmm
                # (sparse_conv.py:122-152); bound by eval.py --sparsify
                # via CoordinateContext.block_live_map
                bl = None
                blm = getattr(ctx, "block_live_map", None)
                if blm:
                    bl = blm.get("/".join(self.path))
                    if bl is not None:
                        bl = np.asarray(bl)
                        if w_rows is not None:
                            bl = np.where(
                                (w_rows >= 0)[:, None, None],
                                bl[np.clip(w_rows, 0, None)],
                                False,
                            )
                        elif subset is not None:
                            bl = bl[list(subset)]
                        # the tier pays kernel restructuring overhead
                        # (packed dispatch, per-pair matmuls): below ~25%
                        # dead blocks the dense kernel measured faster
                        # (scratch/bench_blocksparse.py), so stay dense
                        if bl.all() or (
                            1.0 - bl.sum() / bl.size
                        ) < 0.25:
                            bl = None
                if bl is not None:
                    from nerf_downstream_tpu.ops.window_conv import (
                        window_conv_apply_blocksparse,
                    )

                    out_f = window_conv_apply_blocksparse(
                        sv.feats, plan, w, bl, b,
                        compute_dtype=self.compute_dtype,
                        guard=ctx.overflow_guard,
                        block=getattr(ctx, "block_live_granularity", 128),
                    ).astype(self.compute_dtype)
                else:
                    out_f = window_conv_apply(
                        sv.feats, plan, inv_plan, w, b,
                        compute_dtype=self.compute_dtype,
                        guard=ctx.overflow_guard,
                        input_grad=self.input_grad or not s1_ok,
                    ).astype(self.compute_dtype)
                out_f = ctx.level_poison(out_sv.coords, out_f)
                return SparseVoxels(
                    coords=out_sv.coords, feats=out_f, mask=out_sv.mask,
                    stride=out_sv.stride,
                )
        if ctx.use_block_resident() and blockable:
            if sv.feats.dtype != self.compute_dtype:
                # cast on rows/cells BEFORE densify so the scatter moves
                # half the bytes when entering the block layout
                sv = sv.replace(feats=sv.feats.astype(self.compute_dtype))
            if not isinstance(sv, BlockVoxels):
                sv = ctx.to_block(sv)
            w = self.param(
                "kernel",
                _kaiming_conv_init,
                (len(full_offs), cin, self.out_channels),
            )
            w = w.astype(self.compute_dtype)
            if self.kernel_size == 3:  # s=1: stay on this level's cells
                if zaxis_subset is not None:
                    out = sv.replace(feats=br.conv3_zaxis_cells(
                        sv, w[jnp.asarray(zaxis_subset)]
                    ))
                else:
                    out = sv.replace(feats=br.conv3_cells(sv, w))
            else:  # k2/s2 or k1/s2: in-block transition to the coarser level
                coarse_sv, coarse_layout, coarse_cmask, trans = (
                    ctx.level_transition(sv)
                )
                if self.kernel_size == 2:
                    out_f = br.down_conv2(
                        sv, w, coarse_layout, trans, self.out_channels
                    )
                else:
                    out_f = br.down_sample_conv1(sv, w[0], coarse_layout, trans)
                if ctx.overflow_guard:
                    out_f = br.overflow_poison(out_f, coarse_layout)
                out = BlockVoxels(
                    coords=coarse_sv.coords,
                    row_mask=coarse_sv.mask,
                    feats=out_f,
                    mask=coarse_cmask,
                    layout=coarse_layout,
                    stride=coarse_sv.stride,
                )
            if self.use_bias:
                out_f = out.feats + self.param(
                    "bias", nn.initializers.zeros, (self.out_channels,)
                )
                out_f = jnp.where(out.mask[..., None], out_f, 0)
                out = out.replace(feats=out_f)
            return out.replace(feats=out.feats.astype(self.compute_dtype))

        if isinstance(sv, BlockVoxels):  # unsupported shape: leave the level
            sv = br.to_rows(sv)

        if (
            self.kernel_size == 3
            and self.stride == 1
            and self.dilation == 1
            and subset is None
            and ctx.use_block_conv()
        ):
            # block-dense path: dense lax.conv over 4^3 occupied blocks
            from nerf_downstream_tpu.ops.block_conv import block_conv3

            layout = ctx.block_layout(sv.coords, sv.mask, sv.stride)
            w = self.param(
                "kernel",
                _kaiming_conv_init,
                (len(full_offs), cin, self.out_channels),
            )
            out_f = block_conv3(
                layout, sv.feats.astype(self.compute_dtype), sv.mask,
                w.astype(self.compute_dtype),
            )
            if self.use_bias:
                out_f = out_f + self.param(
                    "bias", nn.initializers.zeros, (self.out_channels,)
                )
            return sv.replace(feats=out_f.astype(self.compute_dtype))

        offs = full_offs if subset is None else full_offs[list(subset)]
        if self.stride > 1:
            out_sv = ctx.strided(sv, self.stride)
        else:
            out_sv = sv
        km = ctx.kernel_map(
            sv.coords, sv.mask, out_sv.coords, out_sv.mask, offs,
            in_stride=sv.stride,
        )
        # inverted map makes the backward d_feats a gather, not a scatter
        inv = ctx.kernel_map(
            out_sv.coords, out_sv.mask, sv.coords, sv.mask, offs,
            transpose=True, in_stride=out_sv.stride,
        )
        w = self.param(
            "kernel",
            _kaiming_conv_init,
            (len(full_offs), cin, self.out_channels),
        )
        if subset is not None:
            w = w[jnp.asarray(list(subset))]
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.use_bias
            else None
        )
        # windowed gathers apply to stride-PRESERVING convs only: a strided
        # conv's map advances ~stride^3 input ranks per output row, which
        # forces degenerate tile sizes (measured: tile-32 Pallas grids of
        # 8k steps cost more than the row gather they replace); strided
        # convs run at coarse levels where the row path is already cheap.
        if (
            ctx.use_window()
            and out_sv.stride == sv.stride
            and _window_groups_ok(offs)
        ):
            plan = ctx.window_plan(km, sv.capacity, offs)
            inv_plan = ctx.window_plan(inv, out_sv.capacity, offs)
            out_f = window_conv_apply(
                sv.feats, plan, inv_plan, w, b,
                compute_dtype=self.compute_dtype, guard=ctx.overflow_guard,
            ).astype(self.compute_dtype)
        else:
            out_f = sparse_conv_apply(
                sv.feats, km, w, b, compute_dtype=self.compute_dtype,
                inv_map=inv,
            ).astype(self.compute_dtype)
        if out_sv is not sv:
            out_f = ctx.level_poison(out_sv.coords, out_f)
        return SparseVoxels(
            coords=out_sv.coords,
            feats=out_f,
            mask=out_sv.mask,
            stride=out_sv.stride,
        )


class SparseConvTranspose(nn.Module):
    """Transposed conv onto an existing (cached) finer coordinate set.

    The reference's conv_tr relies on ME's coordinate manager to find the
    finer map (common.py:128-180); here the decoder passes the encoder's
    pyramid level explicitly as ``target``.
    """

    out_channels: int
    kernel_size: int = 2
    upsample_stride: int = 2
    dilation: int = 1
    use_bias: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, sv: SparseVoxels, ctx: CoordinateContext, target: SparseVoxels
    ) -> SparseVoxels:
        cin = sv.num_channels
        if (
            ctx.use_window_full()
            and self.kernel_size == 2
            and self.upsample_stride == 2
            and self.dilation == 1
        ):
            # windowed transpose conv: the coarse->fine map contracts (~1/4
            # table rank per output row — tiny spans), and its inverse is
            # exactly the encoder down conv's forward plan (ctx cache hit)
            if isinstance(sv, BlockVoxels):
                sv = br.to_rows(sv)
            if isinstance(target, BlockVoxels):
                target = br.to_rows(target)
            offs = kernel_offsets(
                self.kernel_size, target.stride, self.dilation
            )
            if _window_groups_ok(offs):
                plan = ctx.window_plan_cross(sv, target, offs, transpose=True)
                inv_plan = ctx.window_plan_cross(
                    target, sv, offs, expanding=True
                )
                w = self.param(
                    "kernel", _kaiming_conv_init,
                    (len(offs), cin, self.out_channels),
                )
                b = (
                    self.param(
                        "bias", nn.initializers.zeros, (self.out_channels,)
                    )
                    if self.use_bias
                    else None
                )
                out_f = window_conv_apply(
                    sv.feats, plan, inv_plan, w, b,
                    compute_dtype=self.compute_dtype,
                    guard=ctx.overflow_guard,
                ).astype(self.compute_dtype)
                out_f = ctx.level_poison(target.coords, out_f)
                return SparseVoxels(
                    coords=target.coords, feats=out_f, mask=target.mask,
                    stride=target.stride,
                )
        if (
            ctx.use_block_resident()
            and self.kernel_size == 2
            and self.upsample_stride == 2
            and self.dilation == 1
        ):
            if not isinstance(sv, BlockVoxels):
                sv = ctx.to_block(sv)
            if sv.feats.dtype != self.compute_dtype:
                sv = sv.replace(feats=sv.feats.astype(self.compute_dtype))
            t_mask = (
                target.row_mask if isinstance(target, BlockVoxels) else target.mask
            )
            # the decoder's fine->coarse transition is the one the encoder's
            # down conv built (same coordinate objects -> ctx cache hit)
            _, _, _, trans = ctx.level_transition_for(
                target.coords, t_mask, target.stride, sv.feats.dtype
            )
            fine_layout = ctx.block_layout(target.coords, t_mask, target.stride)
            fine_cmask = ctx.cell_mask(fine_layout)
            offs = kernel_offsets(self.kernel_size, target.stride, self.dilation)
            w = self.param(
                "kernel", _kaiming_conv_init, (len(offs), cin, self.out_channels)
            )
            out_f = br.up_conv2(
                sv, w.astype(self.compute_dtype), fine_layout, fine_cmask,
                trans, self.out_channels,
            )
            if ctx.overflow_guard:
                out_f = br.overflow_poison(out_f, fine_layout)
            if self.use_bias:
                out_f = jnp.where(
                    fine_cmask[..., None],
                    out_f + self.param(
                        "bias", nn.initializers.zeros, (self.out_channels,)
                    ),
                    0,
                )
            return BlockVoxels(
                coords=target.coords,
                row_mask=t_mask,
                feats=out_f.astype(self.compute_dtype),
                mask=fine_cmask,
                layout=fine_layout,
                stride=target.stride,
            )

        if isinstance(sv, BlockVoxels):
            sv = br.to_rows(sv)
        if isinstance(target, BlockVoxels):
            target = br.to_rows(target)
        # offsets are in units of the *finer* (output) tensor stride —
        # the adjoint of the forward conv that produced ``sv`` from ``target``.
        offs = kernel_offsets(
            self.kernel_size, target.stride, self.dilation
        )
        km = ctx.kernel_map(
            sv.coords,
            sv.mask,
            target.coords,
            target.mask,
            offs,
            transpose=True,
            in_stride=sv.stride,
        )
        inv = ctx.kernel_map(
            target.coords, target.mask, sv.coords, sv.mask, offs,
            transpose=False, in_stride=target.stride,
        )
        w = self.param(
            "kernel", _kaiming_conv_init, (len(offs), cin, self.out_channels)
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.use_bias
            else None
        )
        # transpose convs stay on the row path under method='window': the
        # fine->coarse forward map contracts, but its inverse (the backward
        # gather) expands ~up_stride^3 ranks per row — same degenerate-tile
        # problem as strided convs, at levels the row path handles cheaply.
        out_f = sparse_conv_apply(
            sv.feats, km, w, b, compute_dtype=self.compute_dtype,
            inv_map=inv,
        ).astype(self.compute_dtype)
        return SparseVoxels(
            coords=target.coords,
            feats=out_f,
            mask=target.mask,
            stride=target.stride,
        )


class SparsePool(nn.Module):
    """Strided window pooling (sum/avg/max), e.g. the ResNet stem's
    SumPooling(kernel=2, stride=2) (reference resnet.py:62-64)."""

    kernel_size: int = 2
    stride: int = 2
    mode: str = "sum"

    @nn.compact
    def __call__(self, sv: SparseVoxels, ctx: CoordinateContext) -> SparseVoxels:
        if (
            isinstance(sv, BlockVoxels)
            and self.kernel_size == 2
            and self.stride == 2
        ):
            coarse_sv, coarse_layout, coarse_cmask, trans = (
                ctx.level_transition(sv)
            )
            out_f = br.pool2_cells(sv, self.mode, coarse_layout, trans)
            if ctx.overflow_guard:
                out_f = br.overflow_poison(out_f, coarse_layout)
            return BlockVoxels(
                coords=coarse_sv.coords,
                row_mask=coarse_sv.mask,
                feats=out_f,
                mask=coarse_cmask,
                layout=coarse_layout,
                stride=coarse_sv.stride,
            )
        if isinstance(sv, BlockVoxels):
            sv = br.to_rows(sv)
        offs = kernel_offsets(self.kernel_size, sv.stride)
        out_sv = ctx.strided(sv, self.stride) if self.stride > 1 else sv
        km = ctx.kernel_map(
            sv.coords, sv.mask, out_sv.coords, out_sv.mask, offs,
            in_stride=sv.stride,
        )
        out_f = window_pool(sv.masked_feats(), km, self.mode)
        if out_sv is not sv:
            out_f = ctx.level_poison(out_sv.coords, out_f)
        return SparseVoxels(
            coords=out_sv.coords,
            feats=out_f,
            mask=out_sv.mask,
            stride=out_sv.stride,
        )


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid rows with running statistics.

    momentum follows torch convention (0.1 = weight of the new batch,
    reference bn_momentum default common.py:22)."""

    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: str | None = None

    @nn.compact
    def __call__(self, sv: SparseVoxels, train: bool) -> SparseVoxels:
        c = sv.num_channels
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if train:
            mean, var, cnt = masked_mean_var(
                sv.feats, sv.mask, self.axis_name, return_count=True
            )
            if not self.is_initializing():
                m = self.momentum
                # torch/ME BN stores the *unbiased* variance in running_var
                # (normalization itself uses the biased batch variance).
                unbiased = var * (cnt / jnp.maximum(cnt - 1.0, 1.0))
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        out = batch_norm_apply(sv.feats, mean, var, scale, bias, self.eps)
        if isinstance(sv, BlockVoxels):  # keep unoccupied cells zero
            out = jnp.where(sv.mask[..., None], out, 0)
        return sv.replace(feats=out)


class MinkLayerNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, sv: SparseVoxels, train: bool = False) -> SparseVoxels:
        c = sv.num_channels
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        out = layer_norm(sv.feats, scale, bias, self.eps)
        if isinstance(sv, BlockVoxels):
            out = jnp.where(sv.mask[..., None], out, 0)
        return sv.replace(feats=out)


class MinkInstanceNorm(nn.Module):
    """Per-sample norm (ME.MinkowskiInstanceNorm). Needs the static batch
    count; stored as a module field."""

    num_batches: int = 1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, sv: SparseVoxels, train: bool = False) -> SparseVoxels:
        c = sv.num_channels
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        bid = sv.batch_ids(self.num_batches)
        flat = sv.feats.reshape(-1, c)
        mean, var = instance_norm_stats(flat, bid, self.num_batches)
        f = (flat.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        out = ((f * scale + bias).astype(sv.feats.dtype)).reshape(
            sv.feats.shape
        )
        if isinstance(sv, BlockVoxels):
            out = jnp.where(sv.mask[..., None], out, 0)
        return sv.replace(feats=out)


NONLINEARITIES: dict[str, Callable] = {
    "ReLU": jax.nn.relu,
    "MinkowskiReLU": jax.nn.relu,
    "LeakyReLU": lambda x: jax.nn.leaky_relu(x, 0.01),
    "MinkowskiLeakyReLU": lambda x: jax.nn.leaky_relu(x, 0.01),
    "ELU": jax.nn.elu,
    "MinkowskiELU": jax.nn.elu,
    "GELU": jax.nn.gelu,
    "MinkowskiGELU": jax.nn.gelu,
    "SiLU": jax.nn.silu,
    "MinkowskiSiLU": jax.nn.silu,
    "Tanh": jnp.tanh,
    "Sigmoid": jax.nn.sigmoid,
}


def get_nonlinearity(name: str) -> Callable:
    """Registry mirroring common.py:35-70."""
    if name not in NONLINEARITIES:
        raise ValueError(f"unknown nonlinearity {name!r}")
    fn = NONLINEARITIES[name]

    def apply(sv: SparseVoxels) -> SparseVoxels:
        out = fn(sv.feats)
        if isinstance(sv, BlockVoxels):
            # sigmoid/others don't map 0 -> 0; keep unoccupied cells zero
            # (the select fuses into the elementwise op)
            out = jnp.where(sv.mask[..., None], out, 0)
        return sv.replace(feats=out)

    return apply


def make_norm(
    norm_type: str,
    *,
    bn_momentum: float = 0.1,
    num_batches: int = 1,
    axis_name: str | None = None,
) -> nn.Module:
    """Norm factory mirroring get_norm (common.py:22-32): BN/IN/LN(/PN)."""
    if norm_type == "BN":
        return MaskedBatchNorm(momentum=bn_momentum, axis_name=axis_name)
    if norm_type == "IN":
        return MinkInstanceNorm(num_batches=num_batches)
    if norm_type == "LN":
        return MinkLayerNorm()
    if norm_type == "PN":
        from nerf_downstream_tpu.models.mink.powernorm import MinkPowerNorm

        return MinkPowerNorm()
    raise ValueError(f"unknown norm type {norm_type!r}")


class GlobalPool(nn.Module):
    """Global pooling to dense [B, C] (ME GlobalAvg/MaxPooling)."""

    mode: str = "avg"
    num_batches: int = 1

    @nn.compact
    def __call__(self, sv: SparseVoxels) -> jax.Array:
        return global_pool(
            sv.masked_feats(), sv.batch_ids(self.num_batches),
            self.num_batches, self.mode,
        )


def cat(a: SparseVoxels, b: SparseVoxels) -> SparseVoxels:
    """Feature concat of two tensors on the same coordinate set (me.cat,
    used for UNet skip connections res16unet.py:409-424).

    Mixed representations (one side fell back to rows — e.g. a ZAXIS conv —
    while the other stayed block-resident) are aligned to rows first."""
    if isinstance(a, BlockVoxels) != isinstance(b, BlockVoxels):
        a, b = as_rows(a), as_rows(b)
    return a.replace(feats=jnp.concatenate([a.feats, b.feats], axis=-1))
