"""Optimizers and LR schedules (reference co3d_3d/src/modules/optim.py).

The reference gin-wraps 9 torch optimizers and 7 scheduler shapes plus a
GradualWarmupScheduler; schedulers read ``train.max_steps`` / ``train.lr``
back out of gin at construction (optim.py:106-118,164). Here every optimizer
is an optax factory and every scheduler an ``optax.Schedule`` (a pure
step->lr function — the natural JAX form), registered under the same gin
names so all reference configs bind unchanged (e.g. ``SGD.momentum = 0.9``).

Weight-decay semantics match torch: SGD/Adam/etc. couple decay into the
gradient (``add_decayed_weights`` before the transform); AdamW decouples it.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import optax

from nerf_downstream_tpu import config as cfg


def _query(path, default=...):
    return cfg.query_parameter(path, default=default)


# ---------------------------------------------------------------------------
# Optimizers (reference optim.py:12-69)
# ---------------------------------------------------------------------------


@cfg.configurable("SGD")
def sgd(lr, weight_decay=0.0, momentum=0.0, dampening=0.0, nesterov=False):
    tx = optax.sgd(lr, momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


@cfg.configurable("ASGD")
def asgd(lr, weight_decay=0.0, lambd=1e-4, alpha=0.75):
    # Averaged SGD: plain SGD transform (polyak averaging belongs to eval
    # param swapping; the reference never evaluates with the averages either).
    tx = optax.sgd(lr)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


@cfg.configurable("Adam")
def adam(lr, weight_decay=0.0, b1=0.9, b2=0.999, eps=1e-8):
    tx = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


@cfg.configurable("AdamW")
def adamw(lr, weight_decay=1e-2, b1=0.9, b2=0.999, eps=1e-8):
    return optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)


@cfg.configurable("Adagrad")
def adagrad(lr, weight_decay=0.0, eps=1e-10):
    tx = optax.adagrad(lr, eps=eps)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


@cfg.configurable("Adadelta")
def adadelta(lr, weight_decay=0.0, rho=0.9, eps=1e-6):
    tx = optax.adadelta(lr, rho=rho, eps=eps)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


@cfg.configurable("Adamax")
def adamax(lr, weight_decay=0.0, b1=0.9, b2=0.999, eps=1e-8):
    tx = optax.adamax(lr, b1=b1, b2=b2, eps=eps)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


@cfg.configurable("RMSprop")
def rmsprop(lr, weight_decay=0.0, alpha=0.99, eps=1e-8, momentum=0.0):
    tx = optax.rmsprop(lr, decay=alpha, eps=eps, momentum=momentum or None)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


@cfg.configurable("Rprop")
def rprop(lr, weight_decay=0.0):
    tx = optax.rprop(lr)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


OPTIMIZERS = {
    "SGD": sgd,
    "ASGD": asgd,
    "Adam": adam,
    "AdamW": adamw,
    "Adagrad": adagrad,
    "Adadelta": adadelta,
    "Adamax": adamax,
    "RMSprop": rmsprop,
    "Rprop": rprop,
}


def get_optimizer(
    optimizer_name: str, lr, weight_decay: float = 0.0
) -> optax.GradientTransformation:
    """reference optim.py:60-69: name -> optimizer with lr/weight_decay."""
    if optimizer_name not in OPTIMIZERS:
        raise ValueError(
            f"optimizer {optimizer_name} not recognized in {list(OPTIMIZERS)}"
        )
    return OPTIMIZERS[optimizer_name](lr, weight_decay=weight_decay)


# ---------------------------------------------------------------------------
# Schedulers — each returns an optax.Schedule step -> multiplier*base_lr
# ---------------------------------------------------------------------------


@cfg.configurable("StepLR")
def step_lr(base_lr, step_size=20000, gamma=0.1) -> Callable:
    def schedule(step):
        return base_lr * gamma ** (step // step_size)

    return schedule


@cfg.configurable("MultiStepLR")
def multi_step_lr(base_lr, milestones=(20000, 40000), gamma=0.1) -> Callable:
    ms = jnp.asarray(list(milestones))

    def schedule(step):
        k = jnp.sum(step >= ms)
        return base_lr * gamma**k

    return schedule


@cfg.configurable("ExponentialLR")
def exponential_lr(base_lr, gamma=0.99) -> Callable:
    def schedule(step):
        return base_lr * gamma**step

    return schedule


@cfg.configurable("CosineAnnealingLR")
def cosine_annealing_lr(base_lr, eta_min=0.0) -> Callable:
    """T_max read back from config like the reference (optim.py:106-118)."""
    interval = _query("train.scheduler_interval", default="step")
    t_max = (
        _query("train.max_steps")
        if interval == "step"
        else _query("train.max_epochs")
    )

    def schedule(step):
        return eta_min + (base_lr - eta_min) * (
            1 + jnp.cos(jnp.pi * step / t_max)
        ) / 2

    return schedule


@cfg.configurable("CyclicLR")
def cyclic_lr(
    base_lr_ignored,
    base_lr=1e-4,
    step_size_up=2000,
    mode="triangular",
    gamma=1.0,
) -> Callable:
    """Triangular/exp/cosine-scaled cyclic LR; max_lr = train.lr
    (reference optim.py:142-186). ``base_lr`` here is the *cycle floor*
    (gin-bound CyclicLR.base_lr); the positional arg is the run lr."""
    max_lr = _query("train.lr")
    total = 2 * step_size_up

    def schedule(step):
        cycle = jnp.floor(1 + step / total)
        x = jnp.abs(step / step_size_up - 2 * cycle + 1)
        amp = jnp.maximum(0.0, 1 - x)
        if mode == "triangular":
            scale = 1.0
        elif mode == "triangular2":
            scale = 1.0 / (2.0 ** (cycle - 1))
        elif mode == "exp_range":
            scale = gamma**cycle
        elif mode == "cosine":
            t_max = _query("train.max_steps")
            max_cycle = t_max / total
            scale = (1 + jnp.cos(cycle / max_cycle * jnp.pi)) / 2
        else:
            raise ValueError(f"Invalid mode:{mode}")
        return base_lr + (max_lr - base_lr) * amp * scale

    return schedule


@cfg.configurable("PolyLR")
def poly_lr(base_lr, poly_exp=0.9) -> Callable:
    max_steps = _query("train.max_steps")

    def schedule(step):
        return base_lr * (1 - step / (max_steps + 1)) ** poly_exp

    return schedule


@cfg.configurable("SquaredLR")
def squared_lr(base_lr, max_iter=None) -> Callable:
    if max_iter is None:
        max_iter = _query("train.max_steps")

    def schedule(step):
        return base_lr * (1 - step / (max_iter + 1)) ** 2

    return schedule


SCHEDULERS = {
    "StepLR": step_lr,
    "MultiStepLR": multi_step_lr,
    "ExponentialLR": exponential_lr,
    "CosineAnnealingLR": cosine_annealing_lr,
    "CyclicLR": cyclic_lr,
    "PolyLR": poly_lr,
    "SquaredLR": squared_lr,
}


def warmup_wrap(schedule: Callable, base_lr, warmup_steps: int) -> Callable:
    """GradualWarmupScheduler with multiplier=1.0 (reference optim.py:316-330):
    linear 0 -> base_lr over warmup_steps, then the wrapped schedule shifted."""

    def warmed(step):
        warm = base_lr * step / warmup_steps
        after = schedule(jnp.maximum(step - warmup_steps, 0))
        return jnp.where(step <= warmup_steps, warm, after)

    return warmed


def get_scheduler(
    scheduler_name: str, base_lr, warmup_steps: int | None = None
) -> Callable:
    """reference optim.py:316-330."""
    if scheduler_name not in SCHEDULERS:
        raise ValueError(
            f"scheduler {scheduler_name} not recognized in {list(SCHEDULERS)}"
        )
    schedule = SCHEDULERS[scheduler_name](base_lr)
    if warmup_steps is not None and warmup_steps > 0:
        schedule = warmup_wrap(schedule, base_lr, warmup_steps)
    return schedule
