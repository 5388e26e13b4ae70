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
        DT.build(["PerlinNoise"])


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
    cfg.parse_config('train.device_transforms = ["PerlinNoise"]')
    with pytest.raises(ValueError, match="non-device-capable"):
        T.build(["PerlinNoise"], device_ok=True)


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


def test_masked_box_blur_matches_host():
    """Device blur of a statically-sized grid (cells zeroed past each
    scene's own dims) == host _box_smooth3 of the dims-sized grid."""
    rng = np.random.default_rng(7)
    d = 12
    dims = np.array([[9, 7, 11], [12, 12, 12]], np.int32)
    noise = rng.normal(size=(2, d, d, d, 3)).astype(np.float32)
    out = np.asarray(
        DT._masked_box_blur(jnp.asarray(noise), jnp.asarray(dims))
    )
    for s in range(2):
        dx, dy, dz = dims[s]
        host = T._box_smooth3(noise[s, :dx, :dy, :dz], iterations=2)
        np.testing.assert_allclose(
            out[s, :dx, :dy, :dz], host, rtol=1e-5, atol=1e-6
        )


def test_trilinear_scenes_matches_host():
    rng = np.random.default_rng(8)
    d = 10
    noise = rng.normal(size=(3, d, d, d, 3)).astype(np.float32)
    n = 200
    sidx = rng.integers(0, 3, n).astype(np.int32)
    # positions inside the grid, incl. exact upper boundary
    gpos = rng.uniform(0, d - 1, (n, 3)).astype(np.float32)
    gpos[:5] = d - 1
    out = np.asarray(
        DT._trilinear_scenes(
            jnp.asarray(noise), jnp.asarray(sidx), jnp.asarray(gpos)
        )
    )
    for s in range(3):
        rows = sidx == s
        host = T._trilinear_uniform(noise[s], 0.0, 1.0, gpos[rows])
        np.testing.assert_allclose(out[rows], host, rtol=1e-4, atol=1e-5)


def test_elastic_distortion_device_semantics():
    cfg.parse_config(
        "ElasticDistortion.distortion_params = [(4, 16)]\n"
        "ElasticDistortion.application_ratio = 1.0\n"
        "ElasticDistortion.max_extent = 64\n"
    )
    fn = DT.build(["ElasticDistortion"], num_scenes=4)
    batch = _batch()
    out = jax.jit(fn)(batch, jax.random.PRNGKey(4))
    c0 = np.asarray(batch["coordinates"])
    c1 = np.asarray(out["coordinates"])
    mask = np.asarray(batch["mask"])
    # scene column and padding rows untouched; features untouched
    np.testing.assert_array_equal(c1[:, 0], c0[:, 0])
    np.testing.assert_array_equal(c1[~mask], c0[~mask])
    np.testing.assert_array_equal(
        np.asarray(out["features"]), np.asarray(batch["features"])
    )
    # every valid voxel moved, by a plausible magnitude for the host
    # field: |disp| ~ magnitude * |smoothed noise| (std ~ 0.2 per axis)
    disp = c1[mask, 1:] - c0[mask, 1:]
    assert np.isfinite(disp).all()
    assert (np.abs(disp).sum(axis=1) > 0).all()
    assert 0.5 < np.abs(disp).std() < 16.0
    host_std = []
    ed = T.TRANSFORMS["ElasticDistortion"](
        distortion_params=[(4, 16)], application_ratio=1.0
    )
    for s in range(4):
        rows = mask & (np.asarray(c0[:, 0]) == s)
        hc, _, _ = ed(c0[rows, 1:].copy(), None, None)
        host_std.append((hc - c0[rows, 1:]).std())
    # same distribution family: stds within 2x of the host's
    r = np.abs(disp).std() / np.mean(host_std)
    assert 0.5 < r < 2.0, r


def test_elastic_distortion_overflow_poisons():
    """A scene wider than the static grid bound NaN-poisons the coords
    (fail loud) instead of silently clamping the displacement field."""
    cfg.parse_config(
        "ElasticDistortion.distortion_params = [(4, 16)]\n"
        "ElasticDistortion.application_ratio = 1.0\n"
        "ElasticDistortion.max_extent = 16\n"  # scenes span ~64
    )
    fn = DT.build(["ElasticDistortion"], num_scenes=4)
    out = jax.jit(fn)(_batch(), jax.random.PRNGKey(5))
    assert not np.isfinite(
        np.asarray(out["coordinates"][:, 1:])
    ).all()


def test_elastic_distortion_requires_num_scenes():
    cfg.parse_config("ElasticDistortion.max_extent = 64")
    with pytest.raises(ValueError, match="scene count"):
        DT.build(["ElasticDistortion"])


def test_device_coord_transform_order_guard():
    """A device-moved coordinate transform that is NOT last among the host
    list's coordinate transforms is rejected (it would reorder)."""
    cfg.parse_config(
        'train.device_transforms = ["ElasticDistortion"]\n'
        "ElasticDistortion.max_extent = 64\n"
    )
    with pytest.raises(ValueError, match="last among the coordinate"):
        T.build(
            ["ElasticDistortion", "RandomHorizontalFlip"], device_ok=True
        )
    # feature transforms after it are fine
    comp = T.build(
        ["RandomHorizontalFlip", "ElasticDistortion", "NormalizeColor"],
        device_ok=True,
    )
    kept = [type(t).__name__ for t in comp.transforms]
    assert kept == ["RandomHorizontalFlip", "NormalizeColor"]


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
