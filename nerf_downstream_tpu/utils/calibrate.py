"""Auto-calibration of the windowed-conv capacity knobs from a dataset scan.

The fast path's per-level row caps, window coverage, and escape budgets
are workload statistics (occupied rows thin ~4x per stride doubling for
surface shells; per-tile input spans depend on scene geometry and batch
composition). Hand-tuning them per dataset — bench.py's historical
approach — is exactly the class of constant that trips on real-data
distribution shifts (a scene-order shuffle alone moved escapes to every
level, ROADMAP 2026-08-18). This module derives them by measuring real
batches with the SAME boundary/escape logic the runtime uses
(ops/window_conv.py::build_plan_direct), over scene-order permutations —
deterministic Williams-design orders covering every ordered scene-pair
adjacency (window spans change only at scene boundaries in rank space;
see ``_adjacency_orders``) plus extra random shuffles:

- ``level_caps[i]``: max unique coarsened rows at stride 2^i across the
  sampled batches x slack, rounded up to a window-tile multiple;
- ``window_blocks``: the smallest coverage whose measured escape count
  stays under ``max_escape_frac`` of the level's rows at every level;
- ``window_escape_cap[i]`` / ``window_escape_tiles[i]``: measured max
  escaped entries / escaped+demoted candidate tiles x slack, rounded up
  (pow2 for caps).

MinkowskiEngine gets the same generality from dynamic hashing
(CoordinateManager, reference sparse_conv.py:90-96); under XLA static
shapes the equivalent is this measure-then-bind pass. Every guard still
NaN-poisons on overflow, so a calibration that undershoots a later
distribution shift fails loudly, never silently truncates.
"""

from __future__ import annotations

import logging
from typing import Iterable

import numpy as np

from nerf_downstream_tpu import config as cfg

STRIDES = (1, 2, 4, 8, 16)
BLOCK_CHOICES = (2, 3, 4, 6, 8)


def _level_rows(batch: dict, stride: int) -> np.ndarray:
    """Valid unique (b, x, y, z) rows of the stride level (floor-coarsened
    in finest-voxel units, the model's level-transition convention)."""
    coords = np.asarray(batch["coordinates"])
    mask = np.asarray(batch["mask"]).astype(bool)
    c = coords[mask]
    v = np.floor(c[:, 1:4]).astype(np.int64)
    b = c[:, :1].astype(np.int64)
    v = (v // stride) * stride
    return np.unique(np.concatenate([b, v], 1), axis=0)


def _sorted_level_coords(rows: np.ndarray, tile: int, cap: int):
    """Pad to the shared level capacity and key-sort (build_plan_direct
    requires key order; a shared capacity keeps one compiled shape per
    stride across all measured variants)."""
    import jax.numpy as jnp

    from nerf_downstream_tpu.sparse import packing

    n_valid = rows.shape[0]
    assert cap >= n_valid and cap % tile == 0
    coords = np.zeros((cap, 4), np.float32)
    coords[:n_valid] = rows
    mask = np.arange(cap) < n_valid
    cj = jnp.asarray(coords)
    mj = jnp.asarray(mask)
    hi, lo = packing.pack(cj, mj)
    _, _, order = packing.sort_with_payload(
        hi, lo, jnp.arange(cap, dtype=jnp.int32)
    )
    return cj[order], mj[order]


def _plan_escape_stats(coords, mask, tile: int, window: int, blocks: int,
                       stride: int = 1):
    """(escaped entries, candidate tiles, far-overflow?) for a same-set k3
    plan at the given coverage — the exact runtime escape accounting.

    ``stride`` must be the level's tensor stride: the runtime's same-set
    conv at a stride-s level uses ±s offsets on multiple-of-s coords
    (kernel_offsets(3, s)), and the boundary spans of ±1-shifted keys
    differ by just enough ranks to flip threshold tiles (measured: ±1
    offsets on the stride-2 level said n_gt=0 where the runtime's ±2
    plan flags 4 tiles — which then poisoned at the bound cap of 0)."""
    import jax.numpy as jnp

    from nerf_downstream_tpu.ops import window_conv as W
    from nerf_downstream_tpu.sparse.kernels import kernel_offsets

    offs = kernel_offsets(3, stride)
    n = coords.shape[0]
    g_count = 9
    nt = max(1, n // max(tile, 1))
    # uncapped accounting: every candidate tile, entry cap = the top_k
    # candidate pool size
    te = g_count * nt
    plan = W.build_plan_direct(
        coords, mask, offs, tile=tile, window=window, blocks=blocks,
        escape_cap=1 << 30, escape_tiles=te,
    )
    # the EXACT quantities the runtime overflow guard budgets: n_gt
    # (bounds-escaped candidate tiles — conservative, includes spurious
    # ones), n_dt (demoted-entry tiles), n_esc (escape-list entries).
    # n_escaped>0 here can only mean far-overflow (span > cov + esc_span).
    n_gt, n_dt, n_esc = (int(v) for v in np.asarray(plan.esc_stats))
    far = int(np.asarray(plan.n_escaped)) > 0
    return n_esc, max(n_gt, n_dt), far


def _cross_escapes(per: dict, s: int, tile: int, window: int, blocks: int,
                   expanding: bool) -> int:
    """Escape count of the stride s -> 2s cross-set plan (the runtime's
    window_plan_cross geometry: expanding = coarse query over the fine
    table at half tile; contracting = fine query over the coarse table at
    the same-set geometry, transposed offsets)."""
    from nerf_downstream_tpu.ops import window_conv as W
    from nerf_downstream_tpu.sparse.kernels import kernel_offsets

    fine_c, fine_m = per[s]
    coarse_c, coarse_m = per[2 * s]
    offs = kernel_offsets(2, s)
    if expanding:
        plan = W.build_plan_direct(
            fine_c, fine_m, offs, tile=max(32, tile // 2), window=window,
            blocks=blocks, out_coords=coarse_c, out_mask=coarse_m,
        )
    else:
        plan = W.build_plan_direct(
            coarse_c, coarse_m, offs, tile=tile, window=window,
            blocks=blocks, transpose=True, out_coords=fine_c,
            out_mask=fine_m,
        )
    return int(np.asarray(plan.n_escaped))


def _adjacency_orders(n: int) -> list:
    """Deterministic scene orders covering every ORDERED scene pair as
    rank-space neighbors at least once (Williams row-complete designs).

    Permuting scene order moves rows only at scene BOUNDARIES: within a
    scene the sorted-key layout (and thus every per-tile window span) is
    permutation-invariant, because query row and neighbor row shift by
    the same scene-block offset. What shifts is which scene pair a
    boundary-straddling tile covers — so measuring every ordered
    adjacency measures every boundary geometry the shuffled loader can
    produce. The Williams sequence u = [0, 1, n-1, 2, n-2, ...] has the
    property that its n cyclic shifts cover every ordered pair exactly
    once for even n; for odd n the reversed sequence's shifts supply the
    missing directions.
    """
    if n <= 1:
        return []
    u = [0]
    for k in range(1, n):
        u.append((k + 1) // 2 if k % 2 else n - k // 2)
    rows = [u]
    if n % 2:
        rows.append(list(reversed(u)))
    out = []
    for base in rows:
        for shift in range(n):
            out.append(np.asarray([(v + shift) % n for v in base]))
    # drop the identity (the unpermuted batch is always measured)
    return [o for o in out if not np.array_equal(o, np.arange(n))]


def _permuted(batch: dict, order: np.ndarray) -> dict:
    coords = np.asarray(batch["coordinates"]).copy()
    bidx = coords[:, 0].astype(int)
    remap = np.argsort(order)
    coords[:, 0] = remap[np.clip(bidx, 0, len(order) - 1)].astype(
        coords.dtype
    )
    return dict(batch, coordinates=coords)


def _apply_device_coord_transforms(batch: dict, seed: int = 0) -> dict:
    """Calibration must measure the coordinate distribution the MODEL sees:
    coordinate transforms moved into the jitted step
    (``train.device_transforms``, e.g. ElasticDistortion) warp coords
    AFTER collate, so their host twins are applied to the scanned batch
    here — otherwise the derived escape caps undershoot the warped spans
    and the run NaN-poisons mid-training."""
    from nerf_downstream_tpu.data import device_transforms as DT
    from nerf_downstream_tpu.data import transforms as T

    names = [
        n for n in DT.configured_names() if n in T.COORD_AFFECTING
    ]
    if not names:
        return batch
    T.seed(seed)
    tfs = [T.TRANSFORMS[n]() for n in names]
    coords = np.array(batch["coordinates"], copy=True)
    mask = np.asarray(batch["mask"]).astype(bool)
    sidx = coords[:, 0].astype(np.int64)
    for s in np.unique(sidx[mask]):
        rows = mask & (sidx == s)
        xyz = coords[rows, 1:4]
        for t in tfs:
            xyz, _, _ = t(xyz, None, None)
        coords[rows, 1:4] = xyz
    return dict(batch, coordinates=coords)


def calibrate(
    batches: Iterable[dict],
    tile: int = 256,
    window: int = 128,
    permutations: int = 4,
    slack: float = 1.2,
    max_escape_frac: float = 0.05,
    seed: int = 0,
) -> dict:
    """Measure batches -> the CoordinateContext knob dict.

    ``batches``: collated train batches (coordinates/mask at least); a
    handful is enough — every batch is additionally re-measured under
    ``permutations`` random scene orders (shuffle robustness).
    """
    rng = np.random.default_rng(seed)
    assert batches, "calibration needs at least one batch"
    # Stochastic device-side coordinate transforms (the ED warp) draw a
    # FRESH realization every training step; a single warped copy per
    # batch measures a 1-sample tail and the derived escape caps
    # undershoot at runtime (measured: calibrated L0 cap 2048 poisoned
    # the bench whose hand cap is 8192). Sample several realizations per
    # batch; the heavy-tail margin below covers the rest.
    from nerf_downstream_tpu.data import device_transforms as DT
    from nerf_downstream_tpu.data import transforms as T

    warped = any(
        n in T.COORD_AFFECTING for n in DT.configured_names()
    )
    warp_samples = 4 if warped else 1
    batches = [
        _apply_device_coord_transforms(b, seed + 1000 * r)
        for b in batches
        for r in range(warp_samples)
    ]
    n_scenes = int(
        max(np.asarray(b["coordinates"])[:, 0].max() for b in batches)
    ) + 1

    variants = []
    adj = _adjacency_orders(n_scenes)
    for bi, b in enumerate(batches):
        variants.append(b)
        # deterministic boundary coverage (every ordered scene pair
        # adjacent somewhere) on the first warp realization of each
        # source batch; random orders on the rest — boundary geometry is
        # order-driven, span geometry warp-driven, so the cross product
        # need not be exhaustive
        if bi % warp_samples == 0:
            for order in adj:
                variants.append(_permuted(b, order))
        for _ in range(permutations):
            variants.append(_permuted(b, rng.permutation(n_scenes)))

    all_rows = {s: [] for s in STRIDES}
    for v in variants:
        for s in STRIDES:
            all_rows[s].append(_level_rows(v, s))
    max_rows = {s: max(r.shape[0] for r in all_rows[s]) for s in STRIDES}
    level_caps = tuple(
        max(tile, int(np.ceil(max_rows[s] * slack / tile)) * tile)
        for s in STRIDES
    )
    # measurement capacities must MATCH the runtime's: the stride-1 plan
    # is built on the batch's input capacity (level_caps[0] never applies
    # at L0), and escape/tile budgets shift with the padded tile count —
    # a budget measured at a rounded-down capacity under-counts the
    # runtime's candidate tiles (the bug this comment commemorates)
    in_cap = int(
        max(np.asarray(b["coordinates"]).shape[0] for b in batches)
    )
    meas_caps = (max(in_cap, level_caps[0]),) + level_caps[1:]
    # one compiled shape per stride: pad every variant to the level cap
    level_sets = []
    for vi in range(len(variants)):
        per = {
            s: _sorted_level_coords(
                all_rows[s][vi], tile, meas_caps[i]
            )
            for i, s in enumerate(STRIDES)
        }
        level_sets.append(per)

    # smallest same-set coverage whose escapes stay under max_escape_frac
    # at every level — same-set plans carry the escape fallback, so their
    # coverage is a PERFORMANCE frontier (the gather matmul cost is
    # coverage-proportional), not a correctness bound
    chosen = None
    stats = None
    for blocks in BLOCK_CHOICES:
        ok = True
        per_level_entries = {s: 0 for s in STRIDES}
        per_level_tiles = {s: 0 for s in STRIDES}
        for per in level_sets:
            for s in STRIDES:
                coords, mask = per[s]
                entries, tiles, far = _plan_escape_stats(
                    coords, mask, tile, window, blocks, stride=s
                )
                if far or entries > max_escape_frac * max_rows[s] * 3:
                    ok = False
                    break
                per_level_entries[s] = max(per_level_entries[s], entries)
                per_level_tiles[s] = max(per_level_tiles[s], tiles)
            if not ok:
                break
        if ok:
            chosen, stats = blocks, (per_level_entries, per_level_tiles)
            break
    assert chosen is not None, (
        f"no coverage in {BLOCK_CHOICES} fits this workload at window "
        f"{window} / tile {tile} — raise window or inspect the data"
    )
    entries, tiles = stats

    # cross-set plans (down convs + transpose convs) have NO escape
    # fallback — their coverage is a hard bound, derived independently
    # (window_cross_blocks) so the expensive same-set coverage above can
    # sit at the escape-fallback frontier. Contracting side first:
    cross = None
    for blocks in BLOCK_CHOICES:
        if blocks < chosen:
            continue
        if all(
            _cross_escapes(per, s, tile, window, blocks, expanding=False)
            == 0
            for per in level_sets
            for s in STRIDES[:-1]
        ):
            cross = blocks
            break
    assert cross is not None, (
        f"no cross-set coverage in {BLOCK_CHOICES} covers the transpose "
        f"spans at window {window} — raise window"
    )

    # expanding cross-set coverage (s2 down convs consume ~4-8 fine ranks
    # per coarse row): smallest factor with zero escapes everywhere
    expand = None
    for cand in (2, 3, 4, 6):
        if all(
            _cross_escapes(per, s, tile, window, cross * cand,
                           expanding=True) == 0
            for per in level_sets
            for s in STRIDES[:-1]
        ):
            expand = cand
            break
    assert expand is not None, (
        "no window_expand_factor in (2, 3, 4, 6) covers the down-conv "
        f"spans at window {window} — raise window"
    )

    def pow2_cap(x: int) -> int:
        # slack + a fixed floor: escape counts on unseen batches vary by
        # more than a multiplicative factor when the measured count is
        # small (a handful of boundary pairs)
        return 1 << int(np.ceil(np.log2(max(int(x * slack) + 32, 1))))

    # a level may bind escape_cap = 0 ONLY when no variant produced ANY
    # bounds-escaped or demoted candidate tile: at cap 0 the runtime
    # poisons on the CONSERVATIVE tile-boundary indicator (n_gt), which
    # can flag tiles whose true escaped-entry count is zero (uneven local
    # key density). Measured zero entries but nonzero candidate tiles ->
    # the level still needs the escape machinery to absorb the flags.
    # heavy-tail margin for stochastic warps: the measured max over
    # warp_samples realizations still undersamples a training run's
    # hundreds of draws — give every escaping level one extra pow2
    # doubling, and a floor cap to levels that measured clean but sit
    # below an escaping one (their spans ride the same warp tails; the
    # scatter cost of a small cap is ~tens of microseconds)
    warp_mult = 2 if warped else 1
    escape_cap = list(
        pow2_cap(entries[s]) * warp_mult
        if (entries[s] or tiles[s]) else 0
        for s in STRIDES
    )
    escape_tiles = list(
        max(4, int(np.ceil(tiles[s] * slack * warp_mult)) + 2)
        if escape_cap[i] else 4
        for i, s in enumerate(STRIDES)
    )
    if warped and any(escape_cap):
        deepest = max(i for i, c in enumerate(escape_cap) if c)
        for i in range(deepest + 1, len(escape_cap)):
            # stride-16 levels fit entirely in one coverage: escapes are
            # structurally impossible, keep 0 there
            if max_rows[STRIDES[i]] > chosen * window:
                escape_cap[i] = 256
                escape_tiles[i] = max(escape_tiles[i], 4)
    escape_cap = tuple(escape_cap)
    escape_tiles = tuple(escape_tiles)
    knobs = {
        "level_caps": level_caps,
        "window_tile": tile,
        "window_size": window,
        "window_blocks": chosen,
        "window_cross_blocks": cross,
        "window_expand_factor": expand,
        "window_escape_cap": escape_cap,
        "window_escape_tiles": escape_tiles,
    }
    logging.info(f"calibrated CoordinateContext knobs: {knobs}")
    return knobs


def gin_text(knobs: dict) -> str:
    lines = ["# auto-generated by nerf_downstream_tpu.utils.calibrate"]
    for k, v in knobs.items():
        lines.append(f"CoordinateContext.{k} = {v!r}")
    return "\n".join(lines) + "\n"


def bind(knobs: dict):
    for k, v in knobs.items():
        cfg.bind("CoordinateContext", k, v)


def maybe_auto_calibrate(
    data_module, num_batches: int = 2, dry_run: bool = False, **kw
) -> bool:
    """Measure-and-bind when the windowed path is active and the caps are
    unbound — ME-style it-just-works generality under static shapes. Reads
    a few train batches through the real DataModule (real transforms,
    real collate). Returns True when bindings were installed.

    ``dry_run``: only report whether calibration WOULD run (multi-process
    launchers use this to fail loudly instead of letting each process scan
    its own data shard and derive divergent static shapes)."""
    caps = cfg.query_parameter("CoordinateContext.level_caps", default=None)
    esc = cfg.query_parameter(
        "CoordinateContext.window_escape_cap", default=None
    )
    method = cfg.query_parameter("CoordinateContext.method", default="auto")
    extent = cfg.query_parameter(
        "CoordinateContext.grid_extent", default=None
    )
    windowed = method == "hybrid" or (method == "auto" and extent)
    # only when the config carries NO manual capacity knobs: a config that
    # binds any of them is a measured config — don't second-guess it
    if caps is not None or esc is not None or not windowed:
        return False
    if dry_run:
        return True
    tile = cfg.query_parameter("CoordinateContext.window_tile", default=256)
    win = cfg.query_parameter("CoordinateContext.window_size", default=128)
    kw.setdefault("tile", int(tile))
    kw.setdefault("window", int(win))
    it = data_module.train_batches()
    batches = [next(it) for _ in range(num_batches)]
    knobs = calibrate(batches, **kw)
    bind(knobs)
    return True
