"""Multi-device data parallelism on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

from nerf_downstream_tpu import config as cfg


@pytest.fixture(autouse=True)
def _clean():
    cfg.clear_config()
    yield
    cfg.clear_config()


def test_graft_entry_forward():
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 20
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_parallel_matches_single_device(rng):
    """One shard_map step over 4 devices must produce the SAME post-step
    params (and BN stats, loss, mIoU) as one single-device step on the
    concatenated global batch.

    The two paths have identical sync semantics by construction: the
    parallel task uses the global-denominator loss + psum'd grads/BN stats,
    the single-device task sees the whole batch at once — so the comparison
    can be tight. A broken grad psum or loss denominator fails this test."""
    import jax

    from nerf_downstream_tpu.data.plenoxel import make_synthetic_scene
    from nerf_downstream_tpu.data.utils import (
        collate_mink,
        collate_mink_sharded,
    )
    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.parallel.mesh import (
        make_mesh,
        replicate,
        shard_leading,
    )
    from nerf_downstream_tpu.parallel.train import make_parallel_train_step
    from nerf_downstream_tpu.train.modules import SegmentationTraining

    n = 4
    samples = []
    for _ in range(n):
        sc = make_synthetic_scene(
            rng, n_voxels=128, reso=(32, 32, 32), with_labels=True,
            num_classes=8,
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
    # identical samples, two layouts: one scene per shard vs 4 scenes in one
    # global batch (batch-id column keeps kernel maps per-scene in both)
    batch_p = collate_mink_sharded(samples, n, capacity_per_shard=256)
    batch_p.pop("metadata", None)
    batch_p.pop("shards", None)
    batch_s = collate_mink(samples, capacity=4 * 256)
    batch_s.pop("metadata", None)

    def build(axis_name, num_batches):
        model = get_model(
            name="Res16UNet14", out_channel=8, num_batches=num_batches,
            planes=(8,) * 8, bn_axis_name=axis_name,
        )
        return SegmentationTraining(
            model, optimizer_name="SGD", scheduler_name="none", lr=0.1,
            ignore_label=-100, axis_name=axis_name,
        )

    task_p = build("data", 1)
    task_s = build(None, n)
    local = {
        k: v[: v.shape[0] // n] if np.ndim(v) >= 1 else v
        for k, v in batch_p.items()
    }
    state_p0 = task_p.create_state(jax.random.PRNGKey(0), local)
    state_s0 = task_s.create_state(jax.random.PRNGKey(0), batch_s)
    # same architecture => identical init trees
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b),
        state_p0.params, state_s0.params,
    )

    step_s = task_s.make_train_step(donate=False)
    state_s1, mets_s = step_s(state_s0, batch_s)

    mesh = make_mesh(n)
    step_p = make_parallel_train_step(task_p, mesh)
    state_p1, mets_p = step_p(
        replicate(mesh, state_p0), shard_leading(mesh, batch_p)
    )

    # parallel loss is psum'd across shards of the global-denominator loss;
    # the single-device loss IS the global loss
    np.testing.assert_allclose(
        float(np.asarray(mets_p["loss"])),
        float(np.asarray(mets_s["loss"])),
        rtol=1e-5,
    )
    # in-step metrics must be global on both paths (psum'd hist / counts)
    for key in ("OA", "mIoU", "ignore_ratio"):
        np.testing.assert_allclose(
            float(np.asarray(mets_p[key])),
            float(np.asarray(mets_s[key])),
            rtol=1e-4, atol=1e-4, err_msg=key,
        )
    # post-step params: tight — catches any grad-psum / denominator error
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        state_p1.params, state_s1.params,
    )
    # BN running stats sync the same way (psum'd == global-batch)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        state_p1.batch_stats, state_s1.batch_stats,
    )
