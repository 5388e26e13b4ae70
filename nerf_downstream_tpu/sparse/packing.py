"""Coordinate packing, sorting, and exact search under static shapes.

MinkowskiEngine builds coordinate maps with a C++ hashmap
(reference: ME CoordinateManager, used at
co3d_3d/src/models/mink/modules/sparse_conv.py:90-96,398-405). On TPU we need
static shapes and compiler-friendly primitives, so the equivalent here is:

- pack batched integer coordinates ``(b, x, y, z)`` into a 64-bit key stored
  as a pair of uint32s (JAX x64 stays off; TPU has no fast int64 anyway);
- ``lax.sort`` with ``num_keys=2`` for lexicographic ordering;
- a vectorized binary search (``log2(N)`` rounds of gathers) for exact
  neighbor lookup — this is what replaces the hashmap probe.

Supported coordinate ranges (generous for every reference dataset, incl.
SemanticKITTI outdoor scans): batch < 2048, x in [-2^19, 2^19),
y,z in [-2^15, 2^15).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Bit layout: hi = b(11 bits) | x(20 bits, biased); lo = y(16) | z(16, biased)
_X_BITS = 20
_Y_BITS = 16
_Z_BITS = 16
_X_BIAS = 1 << (_X_BITS - 1)
_Y_BIAS = 1 << (_Y_BITS - 1)
_Z_BIAS = 1 << (_Z_BITS - 1)

# Invalid rows sort after every valid key. (numpy scalar, NOT jnp: a
# module-level jnp constant initializes the XLA backend at import, which
# breaks jax.distributed.initialize in multi-process CLIs)
INVALID_KEY = np.uint32(0xFFFFFFFF)


def pack(coords: jax.Array, mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Pack int32 coords [N, 4] + validity mask [N] into uint32 key pair.

    Invalid rows get the maximal key so they sort last and never match a
    lookup query.
    """
    b = coords[:, 0].astype(jnp.uint32)
    x = (coords[:, 1] + _X_BIAS).astype(jnp.uint32)
    y = (coords[:, 2] + _Y_BIAS).astype(jnp.uint32)
    z = (coords[:, 3] + _Z_BIAS).astype(jnp.uint32)
    hi = (b << _X_BITS) | (x & jnp.uint32((1 << _X_BITS) - 1))
    lo = (y << _Z_BITS) | (z & jnp.uint32((1 << _Z_BITS) - 1))
    hi = jnp.where(mask, hi, INVALID_KEY)
    lo = jnp.where(mask, lo, INVALID_KEY)
    return hi, lo


def sort_with_payload(hi, lo, *payload):
    """Lexicographically sort by (hi, lo), carrying payload arrays along."""
    return jax.lax.sort((hi, lo) + tuple(payload), num_keys=2)


def _less(a_hi, a_lo, b_hi, b_lo):
    return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))


def lower_bound(s_hi, s_lo, q_hi, q_lo):
    """Vectorized lower_bound of queries in a (hi, lo)-sorted key array.

    Returns, for each query, the first index i with sorted[i] >= query
    (i.e. insertion point), in [0, N].
    """
    n = s_hi.shape[0]
    steps = max(1, (n).bit_length())
    lo_i = jnp.zeros(q_hi.shape, jnp.int32)
    hi_i = jnp.full(q_hi.shape, n, jnp.int32)

    def body(_, carry):
        lo_i, hi_i = carry
        mid = (lo_i + hi_i) >> 1
        m_hi = s_hi[mid]
        m_lo = s_lo[mid]
        less = _less(m_hi, m_lo, q_hi, q_lo)
        return jnp.where(less, mid + 1, lo_i), jnp.where(less, hi_i, mid)

    lo_i, _ = jax.lax.fori_loop(0, steps, body, (lo_i, hi_i))
    return lo_i


def lower_bound_hier(s_hi, s_lo, q_hi, q_lo, block: int = 256):
    """``lower_bound`` without the binary-search loop: two-level
    hierarchical count for SMALL query sets.

    The fori_loop binary search costs ~17 serial gather rounds; traced at
    ~3 ms/step for the K*(nT+1) ~= 7k tile-boundary queries of each plan
    build (round-5 log). Here level A counts block-top keys < query (one
    [Q, N/block] broadcast compare), level B row-gathers the one candidate
    block and counts inside it — fully static, two compares and one
    row-gather total. Memory is Q*N/block ints, so this is for boundary-
    scale Q (thousands), not the match fallback's millions.
    """
    n = s_hi.shape[0]
    if n % block or n <= block:
        return lower_bound(s_hi, s_lo, q_hi, q_lo)
    nb = n // block
    shape = q_hi.shape
    qh, ql = q_hi.reshape(-1), q_lo.reshape(-1)
    top_hi, top_lo = s_hi[::block], s_lo[::block]  # [nb]
    less_a = _less(top_hi[None, :], top_lo[None, :], qh[:, None], ql[:, None])
    b_idx = jnp.clip(
        jnp.sum(less_a.astype(jnp.int32), axis=1) - 1, 0, nb - 1
    )  # [Q] candidate block (query > its top key, or block 0)
    rows_hi = s_hi.reshape(nb, block)[b_idx]  # [Q, block]
    rows_lo = s_lo.reshape(nb, block)[b_idx]
    less_b = _less(rows_hi, rows_lo, qh[:, None], ql[:, None])
    pos = b_idx * block + jnp.sum(less_b.astype(jnp.int32), axis=1)
    return pos.reshape(shape)


def find(s_hi, s_lo, q_hi, q_lo, *, missing: int | None = None):
    """Exact search: index of each query key in the sorted array, or
    ``missing`` (default N) when absent."""
    n = s_hi.shape[0]
    if missing is None:
        missing = n
    pos = lower_bound(s_hi, s_lo, q_hi, q_lo)
    safe = jnp.minimum(pos, n - 1)
    found = (pos < n) & (s_hi[safe] == q_hi) & (s_lo[safe] == q_lo)
    # queries that are themselves invalid-key never match (sorted invalid rows
    # carry INVALID_KEY too) — exclude them explicitly.
    valid_q = ~((q_hi == INVALID_KEY) & (q_lo == INVALID_KEY))
    return jnp.where(found & valid_q, pos, missing)


def offset_delta(d, stride_bits: int = 0) -> tuple[int, int]:
    """Packed-key delta of a coordinate offset ``d = (dx, dy, dz)``.

    Because the bit layout is positional (b|x in hi, y|z in lo), the key of
    ``coord + d`` equals ``key + delta`` as a 64-bit add — for ANY coord,
    with no grid-extent aliasing: a neighbor outside the occupied set simply
    produces a key that exists nowhere in the (unique) key table.
    """
    dx, dy, dz = (int(v) for v in d)
    return dx, dy * (1 << _Z_BITS) + dz


def shift_keys(hi, lo, d_hi: int, d_lo: int, mask=None):
    """Keys of ``coord + d`` via 64-bit (hi, lo) add with carry/borrow.

    ``d_hi``/``d_lo`` are static Python ints from ``offset_delta``. Rows
    where ``mask`` is False get a key that matches nothing — hi=INVALID_KEY
    with lo != INVALID_KEY, a combination no packed or padding key carries.
    """
    u_lo = jnp.uint32(np.uint32(d_lo & 0xFFFFFFFF))
    q_lo = lo + u_lo
    if d_lo > 0:
        carry = (q_lo < lo).astype(jnp.uint32)
    elif d_lo < 0:
        carry = jnp.uint32(0) - (q_lo > lo).astype(jnp.uint32)
    else:
        carry = jnp.uint32(0)
    q_hi = hi + jnp.uint32(np.uint32(d_hi & 0xFFFFFFFF)) + carry
    if mask is not None:
        q_hi = jnp.where(mask, q_hi, INVALID_KEY)
        q_lo = jnp.where(mask, q_lo, jnp.uint32(0xFFFFFFFE))
    return q_hi, q_lo


def unique_first_occurrence(s_hi, s_lo, s_valid):
    """Flags [N] marking the first row of each distinct valid key in a
    sorted key array."""
    prev_hi = jnp.concatenate([jnp.array([INVALID_KEY]), s_hi[:-1]])
    prev_lo = jnp.concatenate([jnp.array([INVALID_KEY]), s_lo[:-1]])
    is_new = (s_hi != prev_hi) | (s_lo != prev_lo)
    is_new = is_new.at[0].set(True)
    return is_new & s_valid
