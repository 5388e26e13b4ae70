"""Logger fan-out: csv / jsonl / tensorboard / wandb / neptune
(reference src/loggers.py:98-130 get_logger + RetryingWandbLogger :34-95).

CSV and JSONL are always available. wandb/neptune/testtube degrade to
warnings when the client library is absent (this image has no network
egress); the retry wrapper semantics of RetryingWandbLogger are preserved
when wandb exists.
"""

from __future__ import annotations

import csv
import json
import logging
import os
import time
from typing import Optional

from nerf_downstream_tpu import config as cfg


class BaseLogger:
    def log_metrics(self, metrics: dict, step: int):
        raise NotImplementedError

    def log_hyperparams(self, params: dict):
        pass

    def finalize(self):
        pass


class CSVLogger(BaseLogger):
    def __init__(self, save_dir: str, name: str = "default"):
        self.dir = os.path.join(save_dir, name)
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, "metrics.csv")
        self._fields: list[str] = ["step"]
        self._rows: list[dict] = []

    def log_metrics(self, metrics: dict, step: int):
        row = {"step": step, **{k: _scalar(v) for k, v in metrics.items()}}
        for k in row:
            if k not in self._fields:
                self._fields.append(k)
        self._rows.append(row)
        with open(self.path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fields)
            w.writeheader()
            w.writerows(self._rows)

    def log_hyperparams(self, params: dict):
        with open(os.path.join(self.dir, "hparams.json"), "w") as f:
            json.dump({k: repr(v) for k, v in params.items()}, f, indent=2)


class JSONLLogger(BaseLogger):
    def __init__(self, save_dir: str, name: str = "default"):
        os.makedirs(os.path.join(save_dir, name), exist_ok=True)
        self.path = os.path.join(save_dir, name, "metrics.jsonl")

    def log_metrics(self, metrics: dict, step: int):
        with open(self.path, "a") as f:
            f.write(
                json.dumps(
                    {"step": step, **{k: _scalar(v) for k, v in metrics.items()}}
                )
                + "\n"
            )


class TensorBoardLogger(BaseLogger):
    def __init__(self, save_dir: str, name: str = "default"):
        self.writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(os.path.join(save_dir, name))
        except Exception as e:  # pragma: no cover
            logging.warning(f"tensorboard unavailable ({e}); logging disabled")

    def log_metrics(self, metrics: dict, step: int):
        if self.writer is None:
            return
        for k, v in metrics.items():
            try:
                self.writer.add_scalar(k, _scalar(v), step)
            except Exception:
                pass


class RetryingWandbLogger(BaseLogger):
    """100x5s retry init loop around wandb (reference loggers.py:34-95)."""

    def __init__(
        self,
        project: str,
        name: Optional[str] = None,
        save_dir: str = ".",
        retries: int = 100,
        retry_wait: float = 5.0,
    ):
        self.run = None
        try:
            import wandb
        except ImportError:
            logging.warning("wandb not installed; WandbLogger disabled")
            return
        for attempt in range(retries):
            try:
                self.run = wandb.init(
                    project=project, name=name, dir=save_dir, reinit=True
                )
                break
            except Exception as e:  # pragma: no cover
                logging.warning(f"wandb init failed ({e}); retry {attempt}")
                time.sleep(retry_wait)

    def log_metrics(self, metrics: dict, step: int):
        if self.run is not None:
            self.run.log({k: _scalar(v) for k, v in metrics.items()}, step=step)

    def log_hyperparams(self, params: dict):
        if self.run is not None:
            self.run.config.update(
                {k: repr(v) for k, v in params.items()}, allow_val_change=True
            )

    def finalize(self):
        if self.run is not None:
            self.run.finish()


class NullLogger(BaseLogger):
    def __init__(self, kind: str):
        logging.warning(f"logger {kind!r} unavailable in this build; skipped")

    def log_metrics(self, metrics: dict, step: int):
        pass


def _scalar(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v


@cfg.configurable("logged")
def logged(hyper_params: list = ()):  # gin hook (reference loggers.py:28-30)
    return {p: cfg.query_parameter(p, default=None) for p in hyper_params}


def get_logger(
    logger_name: str,
    save_dir: str,
    run_name: str = "default",
    project_name: str = "nerf-downstream-tpu",
) -> BaseLogger:
    """reference loggers.py:98-130."""
    if logger_name == "csv":
        return CSVLogger(save_dir, run_name)
    if logger_name == "jsonl":
        return JSONLLogger(save_dir, run_name)
    if logger_name in ("tensorboard", "tb"):
        return TensorBoardLogger(save_dir, run_name)
    if logger_name == "wandb":
        return RetryingWandbLogger(project_name, run_name, save_dir)
    if logger_name in ("neptune", "testtube"):
        return NullLogger(logger_name)
    raise ValueError(f"unknown logger {logger_name!r}")
