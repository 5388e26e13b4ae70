"""Auto-calibration of windowed-conv capacity knobs (utils/calibrate.py)."""

import numpy as np
import pytest

from nerf_downstream_tpu import config as cfg


@pytest.fixture(autouse=True)
def _clean():
    cfg.clear_config()
    yield
    cfg.clear_config()


def _batches(rng, n_batches=2, scenes=3, voxels=600, cap=4096):
    from nerf_downstream_tpu.data.plenoxel import make_synthetic_scene
    from nerf_downstream_tpu.data.utils import collate_mink

    out = []
    for _ in range(n_batches):
        samples = []
        for _ in range(scenes):
            sc = make_synthetic_scene(
                rng, n_voxels=voxels, reso=(64, 64, 64), with_labels=True,
                num_classes=8, surface=True,
            )
            samples.append(
                {
                    "coordinates": sc["coords"].astype(np.float32),
                    "features": np.concatenate(
                        [sc["density"], sc["sh"]], 1
                    ).astype(np.float32),
                    "labels": sc["labels"],
                }
            )
        out.append(collate_mink(samples, capacity=cap))
    return out


def test_adjacency_orders_cover_all_ordered_pairs():
    """Williams-design orders: every ordered scene pair adjacent at least
    once — the boundary-coverage guarantee the permute robustness rests
    on (in-scene spans are permutation-invariant)."""
    from nerf_downstream_tpu.utils.calibrate import _adjacency_orders

    for n in (2, 3, 4, 5, 8):
        orders = _adjacency_orders(n) + [np.arange(n)]
        seen = set()
        for o in orders:
            assert sorted(o.tolist()) == list(range(n))  # real permutation
            for a, b in zip(o[:-1], o[1:]):
                seen.add((int(a), int(b)))
        want = {(a, b) for a in range(n) for b in range(n) if a != b}
        assert seen == want, f"n={n}: missing {want - seen}"


def test_calibrate_derives_consistent_knobs(rng):
    from nerf_downstream_tpu.utils import calibrate as C

    batches = _batches(rng)
    knobs = C.calibrate(
        batches, tile=64, window=64, permutations=2, seed=1
    )
    caps = knobs["level_caps"]
    assert len(caps) == 5
    # caps cover the measured unique rows with slack, tile-rounded
    for i, s in enumerate((1, 2, 4, 8, 16)):
        rows = max(C._level_rows(b, s).shape[0] for b in batches)
        assert caps[i] >= rows
        assert caps[i] % 64 == 0
    assert knobs["window_blocks"] in (2, 3, 4, 6, 8)
    esc = knobs["window_escape_cap"]
    assert len(esc) == 5 and all(
        v == 0 or (v & (v - 1)) == 0 for v in esc
    )  # pow2 caps
    # gin round trip
    text = C.gin_text(knobs)
    cfg.parse_config(text)
    got = cfg.query_parameter("CoordinateContext.level_caps")
    assert tuple(got) == tuple(caps)


def test_calibrated_knobs_train_clean_on_permuted_batches(rng):
    """A model built from calibrated knobs must run a finite (unpoisoned)
    step on every scene permutation of the measured batches — the shuffle
    robustness the manual caps historically missed."""
    import jax

    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.train.loop import array_batch
    from nerf_downstream_tpu.train.modules import SegmentationTraining
    from nerf_downstream_tpu.utils import calibrate as C

    batches = _batches(rng, n_batches=1, scenes=3)
    knobs = C.calibrate(
        batches, tile=64, window=64, permutations=2, seed=2
    )
    cfg.parse_config(
        "CoordinateContext.grid_extent = 64\n"
        'CoordinateContext.method = "hybrid"\n'
    )
    C.bind(knobs)
    model = get_model(
        name="Res16UNet14", out_channel=8, num_batches=3, planes=(8,) * 8
    )
    task = SegmentationTraining(
        model, optimizer_name="SGD", scheduler_name="none", lr=0.1,
        ignore_label=-100,
    )
    batch = array_batch(batches[0])
    state = task.create_state(jax.random.PRNGKey(0), batch)
    step = task.make_train_step(donate=False)
    for p in range(3):
        order = np.random.default_rng(p).permutation(3)
        permuted = array_batch(C._permuted(batches[0], order))
        _, mets = step(state, permuted)
        assert np.isfinite(float(mets["loss"])), f"permutation {p} poisoned"


def test_undersized_cap_still_poisons(rng):
    """Calibration must not weaken the fail-loud floor: a deliberately
    undersized level cap NaN-poisons the step."""
    import jax

    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.train.loop import array_batch
    from nerf_downstream_tpu.train.modules import SegmentationTraining
    from nerf_downstream_tpu.utils import calibrate as C

    batches = _batches(rng, n_batches=1, scenes=3)
    knobs = C.calibrate(
        batches, tile=64, window=64, permutations=0, seed=3
    )
    caps = list(knobs["level_caps"])
    caps[1] = 64  # far below the measured stride-2 occupancy
    knobs["level_caps"] = tuple(caps)
    cfg.parse_config(
        "CoordinateContext.grid_extent = 64\n"
        'CoordinateContext.method = "hybrid"\n'
    )
    C.bind(knobs)
    model = get_model(
        name="Res16UNet14", out_channel=8, num_batches=3, planes=(8,) * 8
    )
    task = SegmentationTraining(
        model, optimizer_name="SGD", scheduler_name="none", lr=0.1,
        ignore_label=-100,
    )
    batch = array_batch(batches[0])
    state = task.create_state(jax.random.PRNGKey(0), batch)
    step = task.make_train_step(donate=False)
    _, mets = step(state, batch)
    assert not np.isfinite(float(mets["loss"]))


def test_maybe_auto_calibrate_gating(rng):
    from nerf_downstream_tpu.utils import calibrate as C

    class FakeDM:
        def __init__(self, batches):
            self._b = batches

        def train_batches(self):
            while True:
                yield from self._b

    batches = _batches(rng, n_batches=1)
    # measured config (escape caps bound): no-op
    cfg.parse_config(
        'CoordinateContext.method = "hybrid"\n'
        "CoordinateContext.window_escape_cap = (64, 0, 0, 0, 0)\n"
    )
    assert not C.maybe_auto_calibrate(FakeDM(batches))
    cfg.clear_config()
    # row path: no-op
    cfg.parse_config('CoordinateContext.method = "row"')
    assert not C.maybe_auto_calibrate(FakeDM(batches))
    cfg.clear_config()
    # bare windowed config: binds the knobs
    cfg.parse_config(
        'CoordinateContext.method = "hybrid"\n'
        "CoordinateContext.window_tile = 64\n"
        "CoordinateContext.window_size = 64\n"
    )
    assert C.maybe_auto_calibrate(
        FakeDM(batches), num_batches=1, permutations=1
    )
    assert cfg.query_parameter("CoordinateContext.level_caps") is not None
