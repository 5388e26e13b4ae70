"""Device-side (jitted) augmentations: host transforms moved into the step.

The reference runs every augmentation in DataLoader worker processes
(co3d_3d/src/data/transforms.py). On TPU the host input pipeline competes
with feeding the chip — at bench scale ``RandomFeatureJitter`` alone is
~24 ms/batch of host RNG (1.7M normals), a third of the measured
data_time — while the same noise costs microseconds fused into the jitted
train step. Transforms listed in the ``train.device_transforms`` gin
binding are therefore dropped from the host ``Compose``
(transforms.build) and applied by the task inside ``train_step``.

Device implementations reproduce the host semantics exactly in
distribution: per-SCENE application gating (the host applies each
transform independently per sample), the same noise shape, the same
gin-configured parameters (the factory instantiates the host transform
class, so bindings like ``RandomFeatureJitter.std`` apply to both paths).
Only transforms in ``DEVICE_CAPABLE`` may be listed; anything else raises
at build (fail loud, never silently skip an augmentation).

Eval/test phases never augment, so the split only affects train datasets.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# per-scene gate table size: scene ids come from coords[:, 0]; any
# realistic per-device batch is far below this
_MAX_SCENES = 1024


def _feature_jitter(t, num_scenes=None) -> Callable:
    """Device twin of transforms.RandomFeatureJitter (SH-slice noise,
    reference transforms.py:21-40): feats[:, s:s+fd] += (randn-0.5)*std,
    applied per scene with prob ``application_ratio``."""
    std = jnp.float32(t.std)
    ratio = jnp.float32(t.application_ratio)
    s, fd = int(t.start_ind), int(t.feature_dim)

    def apply(batch: dict, key: jax.Array) -> dict:
        feats = batch["features"]
        # clamp the slice to the feature width (the host transform is
        # always configured with an in-range slice; a 28-wide
        # density+SH layout with the default start_ind=4 would overrun)
        end = min(s + fd, feats.shape[1])
        w = end - s
        if w <= 0:
            return batch
        ku, kn = jax.random.split(key)
        gate = (
            jax.random.uniform(ku, (_MAX_SCENES,)) < ratio
        )  # [S] per-scene application
        bidx = jnp.clip(
            batch["coordinates"][:, 0].astype(jnp.int32), 0,
            _MAX_SCENES - 1,
        )
        noise = (
            jax.random.normal(kn, (feats.shape[0], w), jnp.float32)
            - 0.5
        ) * std
        on = (gate[bidx] & batch["mask"]).astype(feats.dtype)[:, None]
        upd = feats[:, s:end] + (noise.astype(feats.dtype) * on)
        return dict(batch, features=feats.at[:, s:end].set(upd))

    return apply


def _chromatic_translation(t, num_scenes=None) -> Callable:
    """Device twin of transforms.ChromaticTranslation: one global RGB
    shift per scene, clipped to [0, 255]."""
    rr = jnp.float32(t.trans_range_ratio)
    ratio = jnp.float32(t.application_ratio)

    def apply(batch: dict, key: jax.Array) -> dict:
        feats = batch["features"]
        ku, kt = jax.random.split(key)
        gate = jax.random.uniform(ku, (_MAX_SCENES,)) < ratio
        tr = (
            jax.random.uniform(kt, (_MAX_SCENES, 3)) - 0.5
        ) * (255 * 2 * rr)
        bidx = jnp.clip(
            batch["coordinates"][:, 0].astype(jnp.int32), 0,
            _MAX_SCENES - 1,
        )
        on = (gate[bidx] & batch["mask"]).astype(feats.dtype)[:, None]
        rgb = jnp.clip(
            feats[:, :3] + tr[bidx].astype(feats.dtype) * on, 0, 255
        )
        mixed = jnp.where(on > 0, rgb, feats[:, :3])
        return dict(batch, features=feats.at[:, :3].set(mixed))

    return apply


def _masked_box_blur(noise: jax.Array, dims: jax.Array) -> jax.Array:
    """Device twin of transforms._box_smooth3 on per-scene grids: zero the
    cells at/after each scene's own (data-dependent) dims, then apply the
    2x separable zero-padded 3-tap box blur. noise [S,d,d,d,3], dims
    [S,3] -> blurred [S,d,d,d,3] whose [:dims] region matches the host
    blur of the dims-sized grid exactly."""
    d = noise.shape[1]
    ar = jnp.arange(d)
    m = (
        (ar[None, :, None, None] < dims[:, 0, None, None, None])
        & (ar[None, None, :, None] < dims[:, 1, None, None, None])
        & (ar[None, None, None, :] < dims[:, 2, None, None, None])
    )
    mask = m[..., None]
    noise = noise * mask
    for _ in range(2):
        for ax in (1, 2, 3):
            p = jnp.pad(
                noise, [(0, 0)] * ax + [(1, 1)] + [(0, 0)] * (4 - ax)
            )
            lo = jax.lax.slice_in_dim(p, 0, d, axis=ax)
            hi = jax.lax.slice_in_dim(p, 2, d + 2, axis=ax)
            # re-mask after every pass: the host's zero padding sits at
            # each scene's OWN boundary, so values smeared past dims must
            # not re-enter on the next pass
            noise = (lo + noise + hi) * jnp.float32(1.0 / 3.0) * mask
    return noise


def _trilinear_scenes(
    noise: jax.Array, sidx: jax.Array, gpos: jax.Array
) -> jax.Array:
    """Trilinear interpolation of per-scene grids ``noise`` [S,d,d,d,3] at
    grid-space positions ``gpos`` [N,3] belonging to scenes ``sidx`` [N].
    Host twin: transforms._trilinear_uniform (upper-boundary cells land on
    the last cell with weight 1 via corner clamping).

    Gather layout: rows keyed by (scene, x, y) carrying the full
    [d_z * 3] slab — 4 WIDE row-gathers (one per xy corner) instead of 8
    narrow [N, 3] ones (row-gathers are latency-bound per ROW on TPU;
    the 8-corner form traced 8 x 0.40 ms/step at bench scale). The two z
    corners collapse into a per-point z-weight vector applied as an
    in-register reduce over the slab."""
    s, d = noise.shape[0], noise.shape[1]
    i0 = jnp.clip(jnp.floor(gpos).astype(jnp.int32), 0, d - 2)
    f = gpos - i0
    rows = noise.reshape(s * d * d, d * 3)
    base = (sidx * d + i0[:, 0]) * d + i0[:, 1]
    iota = jnp.arange(d, dtype=jnp.int32)[None, :]
    wz = (
        (iota == i0[:, 2:3]).astype(jnp.float32) * (1 - f[:, 2:3])
        + (iota == i0[:, 2:3] + 1).astype(jnp.float32) * f[:, 2:3]
    )  # [N, d] — exactly two non-zeros per row
    disp = jnp.zeros_like(gpos)
    for dx in (0, 1):
        wx = f[:, 0:1] if dx else 1 - f[:, 0:1]
        for dy in (0, 1):
            wy = f[:, 1:2] if dy else 1 - f[:, 1:2]
            slab = rows[base + dx * d + dy]  # [N, d*3]
            zed = jnp.sum(
                slab.reshape(-1, d, 3) * wz[:, :, None], axis=1
            )  # [N, 3]
            disp = disp + (wx * wy) * zed
    return disp


def _elastic_distortion(t, num_scenes=None) -> Callable:
    """Device twin of transforms.ElasticDistortion (blurred noise-grid
    displacement, reference transforms.py:535-594) — the host pipeline's
    single biggest cost (~74% of the flagship transform stack at bench
    scale, scratch/host_cost.py).

    Exact-in-distribution with the host path: per scene, iid normal noise
    on a granularity-spaced lattice anchored at ``coords_min -
    granularity``, 2x separable 3-tap box blur with ZERO beyond the
    scene's own (data-dependent) grid dims, trilinear-interpolated at the
    voxel coords and scaled by ``magnitude``. The device grid is a static
    cube sized by ``ElasticDistortion.max_extent`` (gin; falls back to
    ``CoordinateContext.grid_extent``); cells past a scene's actual dims
    are zeroed BEFORE blurring so boundary smoothing matches the host's
    constant-padding exactly. Scenes wider than the static grid poison
    the coords with NaN (fail loud, like every capacity guard)."""
    from nerf_downstream_tpu import config as cfg

    params = tuple(tuple(p) for p in (t.distortion_params or ()))
    ratio = jnp.float32(t.application_ratio)
    extent = t.max_extent
    if extent is None:
        extent = cfg.query_parameter(
            "CoordinateContext.grid_extent", default=None
        )
    if extent is None:
        raise ValueError(
            "device ElasticDistortion needs a static noise-grid bound: "
            "bind ElasticDistortion.max_extent (or "
            "CoordinateContext.grid_extent)"
        )
    extent = float(extent)
    if num_scenes is None:
        raise ValueError(
            "device ElasticDistortion needs the scene count (the noise "
            "grid is per-scene): tasks pass model.num_batches through "
            "device_transforms.build()"
        )

    def apply(batch: dict, key: jax.Array) -> dict:
        coords = batch["coordinates"]
        mask = batch["mask"]
        n_scenes = int(num_scenes)
        sidx = jnp.clip(coords[:, 0].astype(jnp.int32), 0, n_scenes - 1)
        xyz = coords[:, 1:4].astype(jnp.float32)
        ku, key = jax.random.split(key)
        gate = jax.random.uniform(ku, (n_scenes,)) < ratio  # per scene

        for pi, (granularity, magnitude) in enumerate(params):
            g = float(granularity)
            # host grid: dim = extent // g + 3 cells, origin cmin - g
            d = int(np.floor(extent / g)) + 3
            # per-scene bounds over valid rows (recomputed per param —
            # the host recomputes coords_min inside each _distort)
            big = jnp.where(mask[:, None], xyz, jnp.inf)
            small = jnp.where(mask[:, None], xyz, -jnp.inf)
            cmin = jax.ops.segment_min(
                big, sidx, num_segments=n_scenes
            )  # [S, 3]
            cmax = jax.ops.segment_max(small, sidx, num_segments=n_scenes)
            cmin = jnp.where(jnp.isfinite(cmin), cmin, 0.0)
            cmax = jnp.where(jnp.isfinite(cmax), cmax, 0.0)
            dims = jnp.floor((cmax - cmin) / g).astype(jnp.int32) + 3

            kn = jax.random.fold_in(key, pi)
            noise = jax.random.normal(
                kn, (n_scenes, d, d, d, 3), jnp.float32
            )
            noise = _masked_box_blur(noise, dims)

            # trilinear gather at (xyz - (cmin - g)) / g; every valid
            # point is inside its scene grid by construction of dims
            gpos = (xyz - (cmin[sidx] - g)) / g
            # a scene wider than the static grid cannot be represented:
            # poison (fail loud) instead of silently clamping
            overflow = jnp.any((dims > d) & (gate[:, None]))
            disp = _trilinear_scenes(noise, sidx, gpos)
            on = (gate[sidx] & mask).astype(jnp.float32)[:, None]
            xyz = xyz + disp * jnp.float32(magnitude) * on
            xyz = jnp.where(overflow, jnp.nan, xyz)

        new_coords = jnp.concatenate(
            [coords[:, :1], xyz.astype(coords.dtype)], axis=1
        )
        return dict(batch, coordinates=new_coords)

    return apply


DEVICE_CAPABLE = {
    "RandomFeatureJitter": _feature_jitter,
    "ChromaticTranslation": _chromatic_translation,
    "ElasticDistortion": _elastic_distortion,
}


def configured_names() -> tuple:
    """The ``train.device_transforms`` binding (empty when unbound)."""
    from nerf_downstream_tpu import config as cfg

    names = cfg.query_parameter("train.device_transforms", default=())
    return tuple(names or ())


def build(names: Sequence[str], num_scenes: Optional[int] = None):
    """fn(batch, key) -> batch applying the named transforms in order,
    or None when the list is empty. Parameters come from the host
    transform classes (same gin bindings as the host path).
    ``num_scenes``: the per-device batch's scene count (tasks pass
    model.num_batches) — needed by transforms that allocate per-scene
    state (ElasticDistortion's noise grids)."""
    names = tuple(names or ())
    if not names:
        return None
    from nerf_downstream_tpu.data import transforms as T

    unknown = [n for n in names if n not in DEVICE_CAPABLE]
    if unknown:
        raise ValueError(
            f"transforms not device-capable: {unknown} (supported: "
            f"{sorted(DEVICE_CAPABLE)})"
        )
    fns = [
        DEVICE_CAPABLE[n](T.TRANSFORMS[n](), num_scenes) for n in names
    ]

    def apply(batch: dict, key: jax.Array) -> dict:
        for i, fn in enumerate(fns):
            batch = fn(batch, jax.random.fold_in(key, i))
        return batch

    return apply
