"""Device-side augmentation: host-Compose exclusion + jitted semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_downstream_tpu import config as cfg
from nerf_downstream_tpu.data import device_transforms as DT
from nerf_downstream_tpu.data import transforms as T


@pytest.fixture(autouse=True)
def _clean():
    cfg.clear_config()
    yield
    cfg.clear_config()


def _batch(n=512, valid=400, c=28, scenes=4, rng=None):
    rng = rng or np.random.default_rng(0)
    coords = np.zeros((n, 4), np.float32)
    coords[:valid, 0] = rng.integers(0, scenes, valid)
    coords[:valid, 1:] = rng.integers(0, 64, (valid, 3))
    feats = rng.normal(size=(n, c)).astype(np.float32)
    mask = np.arange(n) < valid
    return {
        "coordinates": jnp.asarray(coords),
        "features": jnp.asarray(feats),
        "mask": jnp.asarray(mask),
    }


def test_build_rejects_non_capable():
    with pytest.raises(ValueError, match="not device-capable"):
        DT.build(["ElasticDistortion"])


def test_host_compose_drops_configured_names():
    cfg.parse_config('train.device_transforms = ["RandomFeatureJitter"]')
    names = ["RandomFeatureJitter", "RandomHorizontalFlip"]
    comp = T.build(names, device_ok=True)
    kept = [type(t).__name__ for t in comp.transforms]
    assert kept == ["RandomHorizontalFlip"]
    # eval pipelines keep everything on host
    comp_eval = T.build(names, device_ok=False)
    kept_eval = [type(t).__name__ for t in comp_eval.transforms]
    assert kept_eval == names


def test_host_compose_rejects_non_capable_binding():
    cfg.parse_config('train.device_transforms = ["ElasticDistortion"]')
    with pytest.raises(ValueError, match="non-device-capable"):
        T.build(["ElasticDistortion"], device_ok=True)


def test_feature_jitter_semantics():
    cfg.parse_config(
        "RandomFeatureJitter.application_ratio = 1.0\n"
        "RandomFeatureJitter.std = 0.02\n"
        "RandomFeatureJitter.start_ind = 1\n"
        "RandomFeatureJitter.feature_dim = 27\n"
    )
    fn = DT.build(["RandomFeatureJitter"])
    batch = _batch()
    out = jax.jit(fn)(batch, jax.random.PRNGKey(0))
    f0 = np.asarray(batch["features"])
    f1 = np.asarray(out["features"])
    mask = np.asarray(batch["mask"])
    delta = f1 - f0
    # untouched: column 0 (before start_ind) and padding rows
    np.testing.assert_array_equal(delta[:, 0], 0)
    np.testing.assert_array_equal(delta[~mask], 0)
    # applied on every valid row (ratio 1.0): (randn - 0.5) * std
    d = delta[mask][:, 1:28]
    assert np.all(np.abs(d) > 0)
    assert abs(d.mean() + 0.5 * 0.02) < 0.002  # mean = -0.5 * std
    assert abs(d.std() - 0.02) < 0.004
    # other batch keys pass through unchanged (jit copies identities)
    np.testing.assert_array_equal(
        np.asarray(out["coordinates"]), np.asarray(batch["coordinates"])
    )


def test_feature_jitter_ratio_zero_is_identity():
    cfg.parse_config("RandomFeatureJitter.application_ratio = 0.0")
    fn = DT.build(["RandomFeatureJitter"])
    batch = _batch()
    out = jax.jit(fn)(batch, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(
        np.asarray(out["features"]), np.asarray(batch["features"])
    )


def test_feature_jitter_per_scene_gating():
    cfg.parse_config("RandomFeatureJitter.application_ratio = 0.5")
    fn = DT.build(["RandomFeatureJitter"])
    batch = _batch(scenes=8)
    out = jax.jit(fn)(batch, jax.random.PRNGKey(2))
    delta = np.asarray(out["features"] - batch["features"])
    bidx = np.asarray(batch["coordinates"][:, 0]).astype(int)
    mask = np.asarray(batch["mask"])
    # each scene is entirely jittered or entirely untouched
    touched = {}
    for s in range(8):
        rows = mask & (bidx == s)
        if not rows.any():
            continue
        per_row = np.abs(delta[rows]).sum(axis=1) > 0
        assert per_row.all() or not per_row.any(), f"scene {s} split"
        touched[s] = bool(per_row.all())
    assert any(touched.values()) and not all(touched.values())


def test_chromatic_translation_device():
    cfg.parse_config("ChromaticTranslation.application_ratio = 1.0")
    fn = DT.build(["ChromaticTranslation"])
    batch = _batch(c=6)
    # colors live in [0, 255]
    feats = jnp.clip(jnp.abs(batch["features"]) * 100, 0, 255)
    batch = dict(batch, features=feats)
    out = jax.jit(fn)(batch, jax.random.PRNGKey(3))
    f1 = np.asarray(out["features"])
    mask = np.asarray(batch["mask"])
    assert np.all(f1[mask][:, :3] >= 0) and np.all(f1[mask][:, :3] <= 255)
    np.testing.assert_array_equal(
        f1[:, 3:], np.asarray(batch["features"])[:, 3:]
    )
    np.testing.assert_array_equal(f1[~mask], np.asarray(feats)[~mask])


def test_train_step_applies_device_jitter():
    """A SegmentationTraining step with device_transforms trains (finite,
    step-to-step distinct loss) and differs from the unaugmented step."""
    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.train.loop import array_batch
    from nerf_downstream_tpu.train.modules import SegmentationTraining

    cfg.parse_config(
        "RandomFeatureJitter.application_ratio = 1.0\n"
        "RandomFeatureJitter.std = 0.3\n"
        "RandomFeatureJitter.start_ind = 0\n"
        "RandomFeatureJitter.feature_dim = 9\n"
    )
    rng = np.random.default_rng(0)
    n, valid = 1024, 900
    coords = np.zeros((n, 4), np.float32)
    coords[:valid, 0] = rng.integers(0, 2, valid)
    coords[:valid, 1:] = rng.integers(0, 24, (valid, 3))
    batch = array_batch(
        {
            "coordinates": coords,
            "features": rng.normal(size=(n, 9)).astype(np.float32),
            "labels": np.where(
                np.arange(n) < valid, rng.integers(0, 5, n), -100
            ).astype(np.int32),
            "mask": np.arange(n) < valid,
        }
    )

    def run(device_transforms):
        model = get_model(
            name="Res16UNet14A", in_channel=9, out_channel=5, num_batches=2
        )
        task = SegmentationTraining(
            model, optimizer_name="SGD", scheduler_name="none", lr=0.0,
            ignore_label=-100, device_transforms=device_transforms,
        )
        state = task.create_state(jax.random.PRNGKey(0), batch)
        step = task.make_train_step(donate=False)
        _, mets = step(state, batch)
        return float(mets["loss"])

    base = run(())
    aug = run(("RandomFeatureJitter",))
    assert np.isfinite(base) and np.isfinite(aug)
    assert base != aug  # the jitter reached the model input
