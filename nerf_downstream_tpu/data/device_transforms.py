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

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

# per-scene gate table size: scene ids come from coords[:, 0]; any
# realistic per-device batch is far below this
_MAX_SCENES = 1024


def _feature_jitter(t) -> Callable:
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


def _chromatic_translation(t) -> Callable:
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


DEVICE_CAPABLE = {
    "RandomFeatureJitter": _feature_jitter,
    "ChromaticTranslation": _chromatic_translation,
}


def configured_names() -> tuple:
    """The ``train.device_transforms`` binding (empty when unbound)."""
    from nerf_downstream_tpu import config as cfg

    names = cfg.query_parameter("train.device_transforms", default=())
    return tuple(names or ())


def build(names: Sequence[str]):
    """fn(batch, key) -> batch applying the named transforms in order,
    or None when the list is empty. Parameters come from the host
    transform classes (same gin bindings as the host path)."""
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
    fns = [DEVICE_CAPABLE[n](T.TRANSFORMS[n]()) for n in names]

    def apply(batch: dict, key: jax.Array) -> dict:
        for i, fn in enumerate(fns):
            batch = fn(batch, jax.random.fold_in(key, i))
        return batch

    return apply
