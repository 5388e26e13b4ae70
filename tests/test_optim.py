"""Scheduler shape tests: values match the reference scheduler semantics."""

import numpy as np
import pytest

from nerf_downstream_tpu import config as cfg
from nerf_downstream_tpu.train import optim


@pytest.fixture(autouse=True)
def _clean():
    cfg.clear_config()
    cfg.parse_config(
        "train.max_steps = 1000\ntrain.lr = 0.1\n"
        "train.scheduler_interval = 'step'"
    )
    yield
    cfg.clear_config()


def s(sched, step):
    return float(sched(step))


def test_step_lr():
    sched = optim.step_lr(1.0, step_size=100, gamma=0.1)
    assert s(sched, 0) == 1.0
    assert s(sched, 99) == 1.0
    np.testing.assert_allclose(s(sched, 100), 0.1)
    np.testing.assert_allclose(s(sched, 250), 0.01)


def test_multi_step_lr():
    sched = optim.multi_step_lr(1.0, milestones=(200, 400), gamma=0.5)
    assert s(sched, 199) == 1.0
    assert s(sched, 200) == 0.5
    assert s(sched, 400) == 0.25


def test_cosine_annealing_reads_config():
    sched = optim.cosine_annealing_lr(1.0, eta_min=0.0)
    assert s(sched, 0) == 1.0
    np.testing.assert_allclose(s(sched, 500), 0.5, atol=1e-6)  # T_max=1000
    np.testing.assert_allclose(s(sched, 1000), 0.0, atol=1e-6)


def test_poly_lr():
    sched = optim.poly_lr(1.0, poly_exp=0.9)
    assert s(sched, 0) == 1.0
    np.testing.assert_allclose(
        s(sched, 500), (1 - 500 / 1001) ** 0.9, rtol=1e-5
    )


def test_squared_lr():
    sched = optim.squared_lr(2.0, max_iter=100)
    np.testing.assert_allclose(s(sched, 50), 2.0 * (1 - 50 / 101) ** 2,
                               rtol=1e-5)


def test_warmup_wrap():
    base = optim.poly_lr(1.0, poly_exp=1.0)
    sched = optim.warmup_wrap(base, 1.0, warmup_steps=100)
    assert s(sched, 0) == 0.0
    np.testing.assert_allclose(s(sched, 50), 0.5)
    np.testing.assert_allclose(s(sched, 100), 1.0)
    # past warmup: the wrapped schedule, shifted
    np.testing.assert_allclose(s(sched, 200), float(base(100)), rtol=1e-6)


def test_cyclic_lr_triangular():
    sched = optim.cyclic_lr(None, base_lr=0.0, step_size_up=100,
                            mode="triangular")
    assert s(sched, 0) == 0.0
    np.testing.assert_allclose(s(sched, 100), 0.1)  # peak = train.lr
    np.testing.assert_allclose(s(sched, 200), 0.0, atol=1e-7)


def test_get_optimizer_names():
    import optax

    for name in ["SGD", "Adam", "AdamW", "Adagrad", "Adadelta", "Adamax",
                 "RMSprop", "Rprop", "ASGD"]:
        tx = optim.get_optimizer(name, 0.1, weight_decay=1e-4)
        assert isinstance(tx, optax.GradientTransformation)
    with pytest.raises(ValueError):
        optim.get_optimizer("NoSuchOpt", 0.1)


def test_sgd_momentum_binding():
    cfg.parse_config("SGD.momentum = 0.9")
    import jax.numpy as jnp
    import optax

    tx = optim.get_optimizer("SGD", 1.0, weight_decay=0.0)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    g = {"w": jnp.ones(3)}
    u1, state = tx.update(g, state, params)
    u2, state = tx.update(g, state, params)
    # with momentum 0.9 the second update is 1.9x the first
    np.testing.assert_allclose(
        np.asarray(u2["w"]), np.asarray(u1["w"]) * 1.9, rtol=1e-6
    )
