"""RetryingWandbLogger retry semantics, exercised via a stub wandb module
(wandb isn't installed here; the retry loop had never executed)."""

import sys
import types

import numpy as np


def _stub_wandb(fail_times: int, calls: dict):
    mod = types.ModuleType("wandb")

    class _Run:
        def __init__(self):
            self.logged = []
            self.config = types.SimpleNamespace(
                update=lambda d, **k: calls.setdefault("config", []).append(d)
            )

        def log(self, d, step=None):
            calls.setdefault("logged", []).append((step, d))

        def finish(self):
            calls["finished"] = True

    def init(**kwargs):
        calls["attempts"] = calls.get("attempts", 0) + 1
        if calls["attempts"] <= fail_times:
            raise ConnectionError("flaky backend")
        calls["init_kwargs"] = kwargs
        return _Run()

    mod.init = init
    return mod


def test_retry_until_success(monkeypatch):
    calls = {}
    monkeypatch.setitem(sys.modules, "wandb", _stub_wandb(3, calls))
    from nerf_downstream_tpu.train.loggers import RetryingWandbLogger

    lg = RetryingWandbLogger("proj", name="run", retries=10, retry_wait=0.0)
    assert calls["attempts"] == 4  # 3 failures + 1 success
    assert lg.run is not None
    lg.log_metrics({"loss": np.float32(1.5)}, step=7)
    lg.log_hyperparams({"lr": 0.1})
    lg.finalize()
    assert calls["logged"][0][0] == 7
    assert float(calls["logged"][0][1]["loss"]) == 1.5
    assert calls["finished"]


def test_retries_exhausted_degrades(monkeypatch):
    calls = {}
    monkeypatch.setitem(sys.modules, "wandb", _stub_wandb(99, calls))
    from nerf_downstream_tpu.train.loggers import RetryingWandbLogger

    lg = RetryingWandbLogger("proj", retries=3, retry_wait=0.0)
    assert calls["attempts"] == 3
    assert lg.run is None
    # logging into a dead run is a no-op, not a crash
    lg.log_metrics({"loss": 1.0}, step=0)
    lg.finalize()


def test_missing_wandb_disables(monkeypatch):
    monkeypatch.setitem(sys.modules, "wandb", None)  # import -> ImportError
    from nerf_downstream_tpu.train.loggers import RetryingWandbLogger

    lg = RetryingWandbLogger("proj")
    assert lg.run is None
    lg.log_metrics({"x": 1.0}, step=0)
