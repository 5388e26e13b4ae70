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
    """The shard_map step must produce the same params as a single-device
    step on the concatenated global batch."""
    import jax

    from __graft_entry__ import _make_field_batch
    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.parallel.mesh import (
        make_mesh,
        replicate,
        shard_leading,
    )
    from nerf_downstream_tpu.parallel.train import make_parallel_train_step
    from nerf_downstream_tpu.train.modules import SegmentationTraining

    n = 4
    batch = _make_field_batch(
        rng, capacity=256, n_valid=128, batches=1, shards=n
    )
    batch.pop("metadata", None)
    batch.pop("shards", None)

    def build(axis_name):
        model = get_model(
            name="Res16UNet14", out_channel=8, num_batches=1,
            planes=(8,) * 8, bn_axis_name=axis_name,
        )
        return SegmentationTraining(
            model, optimizer_name="SGD", scheduler_name="none", lr=0.1,
            ignore_label=-100, axis_name=axis_name,
        )

    # single-device global step: run over the whole batch as one shard,
    # with batch ids made global
    task_p = build("data")
    local = {
        k: v[: v.shape[0] // n] if np.ndim(v) >= 1 else v
        for k, v in batch.items()
    }
    state0 = task_p.create_state(jax.random.PRNGKey(0), local)

    # reference: manual global-batch loss (computed before the parallel step
    # donates the state buffers)
    task_s = build(None)
    state_s = state0

    def shard_slice(i):
        m = batch["coordinates"].shape[0] // n
        out = {}
        for k, v in batch.items():
            if np.ndim(v) >= 1 and v.shape[0] % n == 0:
                out[k] = v[i * (v.shape[0] // n) : (i + 1) * (v.shape[0] // n)]
            else:
                out[k] = v
        return out

    import jax.numpy as jnp

    def global_loss(params):
        total_num = 0.0
        total_den = 0.0
        for i in range(n):
            b = shard_slice(i)
            logits, _ = task_s._apply(params, state_s.batch_stats, b, True)
            labels = jnp.asarray(b["labels"], jnp.int32)
            valid = jnp.asarray(b["mask"], bool) & (labels != -100)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(
                logp, jnp.clip(labels, 0, 7)[:, None], -1
            )[:, 0]
            w = valid.astype(jnp.float32)
            total_num = total_num + jnp.sum(nll * w)
            total_den = total_den + jnp.sum(w)
        return total_num / jnp.maximum(total_den, 1e-8)

    ls = float(global_loss(state_s.params))

    mesh = make_mesh(n)
    step_p = make_parallel_train_step(task_p, mesh)
    state_p, mets_p = step_p(
        replicate(mesh, state0), shard_leading(mesh, batch)
    )
    # NB: BN stats differ (per-shard vs global) between the two paths, so
    # compare through the *loss value*: the parallel loss must match the
    # global loss at init.
    lp = float(np.asarray(mets_p["loss"]))
    # parallel path uses synced BN while manual loop uses per-shard BN; on
    # identical per-shard distributions these agree closely
    np.testing.assert_allclose(lp, ls, rtol=0.05)
    assert np.isfinite(
        np.asarray(jax.tree_util.tree_leaves(state_p.params)[0])
    ).all()
