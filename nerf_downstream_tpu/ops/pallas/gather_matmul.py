"""Pallas TPU kernel: fused gather -> matmul -> accumulate sparse conv.

Computes  out[n, :] = sum_k  x[idx[k, n], :] @ w[k]  entirely on-chip:
row gathers are per-row DMAs from HBM into a VMEM staging buffer, which
feeds the MXU directly — XLA's take() instead materializes each gathered
[N, Cin] array to HBM before the matmul, paying the traffic twice plus
latency.

Index plumbing: the kernel map is reshaped to [K, tiles, tile_n/128, 128]
VMEM blocks (TPU tiling rules), copied to an SMEM scratch per tile, and
scalar-read to drive the row DMAs.

Grid: (tiles_n, K); k is the inner (reduction) dimension accumulating into
a VMEM f32 scratch; the out block is written at k == K-1.

Sentinel rows (idx == N_in, "no neighbor") point at the extra zero row of
``x_ext`` (same convention as the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _kernel(idx_ref, x_hbm, w_ref, out_ref, idx_smem, gbuf, acc, copy_sem,
            sems):
    k = pl.program_id(1)
    num_k = pl.num_programs(1)
    rows8, lanes = idx_smem.shape
    tile_n = rows8 * lanes

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    # stage this tile's indices into SMEM for scalar reads
    cp = pltpu.make_async_copy(idx_ref.at[0, 0], idx_smem, copy_sem)
    cp.start()
    cp.wait()

    def issue(j, _):
        row = idx_smem[j // lanes, j % lanes]
        pltpu.make_async_copy(
            x_hbm.at[row], gbuf.at[j], sems
        ).start()
        return 0

    jax.lax.fori_loop(0, tile_n, issue, 0)

    def wait(j, _):
        row = idx_smem[j // lanes, j % lanes]
        pltpu.make_async_copy(
            x_hbm.at[row], gbuf.at[j], sems
        ).wait()
        return 0

    jax.lax.fori_loop(0, tile_n, wait, 0)

    acc[:] = acc[:] + jnp.dot(
        gbuf[:, 0, :], w_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(k == num_k - 1)
    def _():
        out_ref[:] = acc[:]


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def gather_matmul(
    x_ext: jax.Array,  # [N_in + 1, Cin] (last row zero), any float dtype
    kernel_map: jax.Array,  # int32 [K, N_out]
    w: jax.Array,  # [K, Cin, Cout], same dtype as x_ext
    tile_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Fused sparse-conv forward; returns f32 [N_out, Cout]."""
    k, n_out = kernel_map.shape
    cin = x_ext.shape[1]
    cout = w.shape[-1]
    assert n_out % tile_n == 0 and tile_n % _LANES == 0, (n_out, tile_n)
    tiles = n_out // tile_n
    rows8 = tile_n // _LANES
    idx4 = kernel_map.reshape(k, tiles, rows8, _LANES)
    # row-granular HBM DMA needs each row in its own tile slab; bf16 packs
    # 2 rows per sublane word, so pad the slab dim to the pack factor
    pack = max(1, 4 // x_ext.dtype.itemsize)
    x3 = jnp.broadcast_to(x_ext[:, None, :], (x_ext.shape[0], pack, cin))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(tiles, k),
        in_specs=[
            pl.BlockSpec(
                (1, 1, rows8, _LANES),
                lambda i, kk: (kk, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, cin, cout), lambda i, kk: (kk, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_n, cout), lambda i, kk: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((rows8, _LANES), jnp.int32),
            pltpu.VMEM((tile_n, pack, cin), x_ext.dtype),
            pltpu.VMEM((tile_n, cout), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(idx4, x3, w)


def gather_matmul_reference(x_ext, kernel_map, w):
    def step(acc, xs):
        w_k, idx_k = xs
        return acc + jnp.dot(
            x_ext[idx_k], w_k, preferred_element_type=jnp.float32
        ), None

    out, _ = jax.lax.scan(
        step,
        jnp.zeros((kernel_map.shape[1], w.shape[-1]), jnp.float32),
        (w, kernel_map),
    )
    return out
