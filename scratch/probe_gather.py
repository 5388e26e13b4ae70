"""Probe: does Mosaic support a per-row VMEM gather (vector index along
sublanes) — and how fast vs the one-hot matmul dispatch?

The windowed conv's dispatch matmul [M*T, cov] @ [cov, C] runs ~55% MXU
and its FLOPs are cov/Cout ~= 5.3x the useful weight-matmul FLOPs
(ROADMAP round-5). A true VMEM gather would make dispatch ~free. Known
options to probe on this toolchain:
  a) fancy indexing win[idx] / jnp.take(win, idx, axis=0)
  b) one-hot matmul (the shipped kernel) as control
"""

from __future__ import annotations

import functools
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE, COV, C, M, G = 256, 512, 96, 3, 9
NT = 256  # 65536 rows


def bench(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 20 * 1e3


def _take_kernel(idx_ref, win_ref, out_ref):
    idx = idx_ref[0]  # [T] (block is [8, T]; row 0 used)
    win = win_ref[:]  # [COV, C]
    idxf = idx_ref[:]  # [8, T]
    idx2 = jnp.broadcast_to(
        idxf.reshape(-1)[:COV].reshape(COV, 1), (COV, win.shape[1])
    )
    g = jnp.take_along_axis(win, idx2, axis=0)  # equal-shape gather
    out_ref[:] = g[:TILE]


def _onehot_kernel(idx_ref, win_ref, out_ref):
    idx = idx_ref[0]
    win = win_ref[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, COV), 1)
    oh = (idx.reshape(TILE, 1) == iota).astype(jnp.bfloat16)
    out_ref[:] = jnp.dot(
        oh, win.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )


def run(kernel, name):
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, COV, (NT * 8, TILE), np.int32)
    )
    win = jnp.asarray(
        np.random.default_rng(1).normal(size=(COV, C)).astype(np.float32)
    )

    @jax.jit
    def call(idx, win):
        return pl.pallas_call(
            kernel,
            grid=(NT,),
            in_specs=[
                pl.BlockSpec((8, TILE), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((COV, C), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, C), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NT * TILE, C), jnp.float32),
        )(idx, win)

    try:
        ms = bench(call, idx, win)
        print(f"{name}: {ms:.3f} ms")
        return call(idx, win)
    except Exception as e:
        print(f"{name}: FAILED - {type(e).__name__}: {str(e)[:300]}")
        return None


if __name__ == "__main__":
    a = run(_take_kernel, "take/fancy-gather")
    b = run(_onehot_kernel, "one-hot matmul (control)")
    if a is not None and b is not None:
        # one-hot path treats any idx as match-or-zero; take uses fill
        print("allclose:", bool(jnp.allclose(a, b, atol=1e-3)))
