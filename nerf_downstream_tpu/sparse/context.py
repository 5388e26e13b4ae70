"""Per-forward coordinate context: kernel-map and stride caching.

MinkowskiEngine caches coordinate maps and kernel maps in its
CoordinateManager so that the many convs sharing a stride level reuse one
map (reference: sparse_conv.py:397-405 fetches cached maps by CoordinateMapKey).
Here the equivalent is a plain Python dict keyed by the *traced array
identities* of the coordinate sets: within one ``jit`` trace, the same
coordinate arrays are the same Python objects, so every conv at a level
reuses a single sort + binary-search subgraph.

The transpose map of an already-built forward map is derived by a cheap
scatter inversion instead of a fresh binary search.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nerf_downstream_tpu.sparse import kernels
from nerf_downstream_tpu.sparse.types import SparseVoxels


class CoordinateContext:
    def __init__(self):
        self._kmaps: dict = {}
        self._strided: dict = {}

    def strided(self, sv: SparseVoxels, stride: int) -> SparseVoxels:
        key = (id(sv.coords), sv.stride, stride)
        if key not in self._strided:
            self._strided[key] = kernels.stride_coords(sv, stride)
        return self._strided[key]

    def kernel_map(
        self,
        in_coords: jax.Array,
        in_mask: jax.Array,
        out_coords: jax.Array,
        out_mask: jax.Array,
        offsets: np.ndarray,
        transpose: bool = False,
    ) -> jax.Array:
        okey = offsets.tobytes()
        key = (id(in_coords), id(out_coords), okey, transpose)
        if key in self._kmaps:
            return self._kmaps[key]
        # A transpose map is the inversion of the corresponding forward map;
        # if that one exists, invert it with a scatter instead of searching.
        fwd_key = (id(out_coords), id(in_coords), okey, not transpose)
        if fwd_key in self._kmaps:
            km = invert_kernel_map(
                self._kmaps[fwd_key], out_coords.shape[0]
            )
        else:
            km = kernels.build_kernel_map(
                in_coords, in_mask, out_coords, out_mask, offsets, transpose
            )
        self._kmaps[key] = km
        return km


def invert_kernel_map(km: jax.Array, n_out: int) -> jax.Array:
    """Invert a kernel map: fwd[k, o] = i  =>  inv[k, i] = o.

    ``km`` is int32[K, N_in_of_inverse] with sentinel = its input capacity;
    result is int32[K, n_out] with sentinel = km.shape[1]... note the
    inverse's sentinel equals the forward map's *output* count, i.e. the
    inverse's input capacity.
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
