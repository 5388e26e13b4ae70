"""PowerNorm EMA-corrected backward: golden parity against a torch fixture
implementing the published PowerNorm backward (the algorithm of the
reference's PowerFunction, powernorm.py:52-139), plus the train-step
plumbing that writes the backward-time ema_gz update into batch_stats."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _torch_power_function(x, weight, bias, running_phi, ema_gz, gy,
                          eps, afwd, abkw, warmup_iters, current_iter):
    """Torch fixture of the PowerNorm train-time forward/backward semantics
    (Shen et al., "PowerNorm: Rethinking Batch Normalization in
    Transformers"): z = x / sqrt(denom + eps); backward uses the EMA-
    corrected gradient and the *batch* second moment, and advances ema_gz.
    All rows here are valid (the reference operates on unpadded tensors).
    Returns (y, dx, dweight, dbias, new_ema_gz, new_running_phi).
    """
    x = x.clone().requires_grad_(False)
    var = (x * x).mean(dim=0)  # batch second moment per channel
    if current_iter <= warmup_iters:
        denom = var
    else:
        denom = running_phi
    z = x / torch.sqrt(denom + eps)
    y = weight * z + bias

    # running_phi forward update
    phi = running_phi.clone()
    if current_iter < warmup_iters:
        phi = phi * (current_iter - 1) / current_iter + var / current_iter
    new_phi = afwd * phi + (1 - afwd) * var

    # backward
    g = gy * weight
    approx = g - (1 - abkw) * ema_gz * z
    new_ema = ema_gz + (approx * z).mean(dim=0)
    dx = approx / torch.sqrt(var + eps)
    dweight = (gy * z).sum(dim=0)
    dbias = gy.sum(dim=0)
    return y, dx, dweight, dbias, new_ema, new_phi


@pytest.mark.parametrize("current_iter", [3, 20])
def test_power_core_matches_torch_fixture(rng, current_iter):
    from nerf_downstream_tpu.models.mink.powernorm import _power_core

    n, c = 40, 6
    eps, afwd, abkw, warmup = 1e-5, 0.9, 0.9, 10
    x = rng.normal(size=(n, c)).astype(np.float32)
    w = rng.normal(size=(c,)).astype(np.float32)
    b = rng.normal(size=(c,)).astype(np.float32)
    phi = (rng.uniform(0.5, 2.0, size=(c,))).astype(np.float32)
    ema = rng.normal(size=(c,)).astype(np.float32) * 0.1
    gy = rng.normal(size=(n, c)).astype(np.float32)

    ty, tdx, tdw, tdb, tema, _ = _torch_power_function(
        torch.tensor(x), torch.tensor(w), torch.tensor(b),
        torch.tensor(phi), torch.tensor(ema), torch.tensor(gy),
        eps, afwd, abkw, warmup, current_iter,
    )

    var = (x * x).mean(axis=0)
    denom = var if current_iter <= warmup else phi
    mask_f = jnp.ones((n,), jnp.float32)

    def f(x_, w_, b_, ema_):
        return _power_core(
            x_, w_, b_, jnp.asarray(denom), jnp.asarray(var), ema_, mask_f,
            eps, None,
        )

    y = f(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), jnp.asarray(ema))
    np.testing.assert_allclose(np.asarray(y), ty.numpy(), rtol=1e-5, atol=1e-6)

    def scalar(x_, w_, b_, ema_):
        return jnp.sum(f(x_, w_, b_, ema_) * jnp.asarray(gy))

    dx, dw, db, dema = jax.grad(scalar, argnums=(0, 1, 2, 3))(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), jnp.asarray(ema)
    )
    np.testing.assert_allclose(np.asarray(dx), tdx.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), tdw.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(db), tdb.numpy(), rtol=1e-4, atol=1e-5)
    # the ema_gz "cotangent" is the new buffer value
    np.testing.assert_allclose(
        np.asarray(dema), tema.numpy(), rtol=1e-4, atol=1e-5
    )


def test_masked_rows_are_excluded(rng):
    """Padding rows must not contribute to ema_gz or parameter grads."""
    from nerf_downstream_tpu.models.mink.powernorm import _power_core

    n, c = 32, 4
    x = rng.normal(size=(n, c)).astype(np.float32)
    gy = rng.normal(size=(n, c)).astype(np.float32)
    w = np.ones(c, np.float32)
    b = np.zeros(c, np.float32)
    ema = np.zeros(c, np.float32)
    mask = np.arange(n) < 20
    var = (x[mask] ** 2).mean(axis=0)

    def run(x_, gy_, mask_):
        def scalar(x__, w_, b_, ema_):
            return jnp.sum(
                _power_core(
                    x__, w_, b_, jnp.asarray(var), jnp.asarray(var), ema_,
                    jnp.asarray(mask_.astype(np.float32)), 1e-5, None,
                ) * gy_
            )

        return jax.grad(scalar, argnums=(0, 1, 2, 3))(
            jnp.asarray(x_), jnp.asarray(w), jnp.asarray(b), jnp.asarray(ema)
        )

    d1 = run(x, jnp.asarray(gy), mask)
    x_junk = x.copy()
    x_junk[~mask] = 1e6  # garbage in padding rows
    gy_junk = gy.copy()
    gy_junk[~mask] = -1e6
    d2 = run(x_junk, jnp.asarray(gy_junk), mask)
    for a, b_ in zip(d1[1:], d2[1:]):  # dw, db, dema identical
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(d1[0])[mask], np.asarray(d2[0])[mask], rtol=1e-5
    )
    assert (np.asarray(d2[0])[~mask] == 0).all()


def test_train_step_updates_ema_gz(rng):
    """End-to-end: a PN model's train step advances ema_gz in batch_stats."""
    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.train.modules import SegmentationTraining
    from tests.test_models_mink import make_field
    from flax import traverse_util

    field = make_field(rng, n_valid=100, capacity=128, c=3)
    batch = {
        "coordinates": np.asarray(field.coords),
        "features": np.asarray(field.feats),
        "mask": np.asarray(field.mask),
        "labels": rng.integers(0, 4, 128),
    }
    model = get_model(
        name="Res16UNet14", out_channel=4, num_batches=2, planes=(4,) * 8,
        norm_type="PN",
    )
    task = SegmentationTraining(
        model, optimizer_name="SGD", scheduler_name="none", lr=0.1,
        ignore_label=-100,
    )
    state = task.create_state(jax.random.PRNGKey(0), batch)
    flat0 = traverse_util.flatten_dict(dict(state.batch_stats))
    ema0 = {k: np.asarray(v) for k, v in flat0.items() if k[-1] == "ema_gz"}
    assert ema0, "PN model must carry ema_gz buffers"
    assert all((v == 0).all() for v in ema0.values())
    step = task.make_train_step(donate=False)
    new_state, mets = step(state, batch)
    assert np.isfinite(float(mets["loss"]))
    flat1 = traverse_util.flatten_dict(dict(new_state.batch_stats))
    changed = [
        k for k in ema0
        if not np.allclose(np.asarray(flat1[k]), ema0[k])
    ]
    assert changed, "ema_gz must advance during the backward pass"
