"""Trainer: the step loop, validation cadence, checkpointing, logging.

Replaces the reference's PyTorch-Lightning Trainer usage
(co3d_3d/train.py:174-195): max_steps semantics, val_every_n_steps,
ModelCheckpoint(best-on-monitor + last), LR monitor, SumProfiler wiring,
NaN-loss guard (segmentation_training.py:77-79), and the final
``trainer.test(ckpt_path="best")`` pass.

TPU-native: one jitted train_step; the host loop only feeds batches,
logs, and checkpoints. Async dispatch keeps the device busy — metrics are
fetched with a 1-step delay so logging never blocks the pipeline.

``devices > 1`` activates the data-parallel path (the reference's
``Trainer(gpus=N, accelerator="ddp")``, co3d_3d/train.py:174-187): a
1-D ``data`` mesh, the task's shard_map train/eval steps (psum'd grads,
global-denominator loss, synced metrics), replicated state, batches
sharded on their leading dim. The datamodule must emit shard-partitioned
batches (``DataModule(shards=devices)`` / ``collate_mink_sharded``).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional, Sequence

import jax
import numpy as np

from nerf_downstream_tpu.train import checkpoints
from nerf_downstream_tpu.train.loggers import BaseLogger
from nerf_downstream_tpu.train.profilers import SumProfiler


def array_batch(batch: dict) -> dict:
    """Drop non-array fields (metadata lists etc.) before the jit boundary."""
    return {
        k: v
        for k, v in batch.items()
        if isinstance(v, (np.ndarray, np.generic, jax.Array, int, float))
    }


class Trainer:
    def __init__(
        self,
        task,
        datamodule,
        max_steps: int = 10000,
        max_epochs: int = -1,
        val_every_n_steps: Optional[int] = None,
        log_every_n_steps: int = 10,
        loggers: Sequence[BaseLogger] = (),
        default_root_dir: str = "./outputs",
        monitor_metric: str = "val/mIoU",
        monitor_mode: str = "max",
        profiler: Optional[SumProfiler] = None,
        resume_from_checkpoint: Optional[str] = None,
        reset_profiler_every_n_steps: int = 1000,
        seed: int = 0,
        devices: int = 1,
        parallel_mode: str = "ddp",
        model_parallel: int = 1,
    ):
        from nerf_downstream_tpu.utils.compile_cache import (
            enable_compilation_cache,
        )

        # fresh Mosaic compiles of the windowed conv kernels take minutes;
        # the persistent cache makes every repeat run load in seconds
        # (NDT_COMPILE_CACHE=0 opts out)
        enable_compilation_cache()
        self.task = task
        self.datamodule = datamodule
        self.max_steps = max_steps
        self.max_epochs = max_epochs
        self.val_every_n_steps = val_every_n_steps
        self.log_every_n_steps = log_every_n_steps
        self.loggers = list(loggers)
        self.default_root_dir = default_root_dir
        self.monitor_metric = monitor_metric
        self.monitor_mode = monitor_mode
        self.profiler = profiler or SumProfiler()
        self.resume_from_checkpoint = resume_from_checkpoint
        self.reset_profiler_every_n_steps = reset_profiler_every_n_steps
        self.seed = seed
        self.devices = devices
        if parallel_mode not in ("ddp", "gspmd"):
            raise ValueError(
                f"parallel_mode must be 'ddp' or 'gspmd', got {parallel_mode}"
            )
        self.parallel_mode = parallel_mode
        self.model_parallel = max(int(model_parallel), 1)
        self.mesh = None
        if devices > 1:
            import jax as _jax

            avail = len(_jax.devices())
            if devices > avail:
                raise ValueError(
                    f"requested {devices} data-parallel devices but only "
                    f"{avail} are visible"
                )
            if parallel_mode == "gspmd":
                # GSPMD flavor (parallel/gspmd.py): a (data, model) mesh,
                # sharding ANNOTATIONS instead of shard_map/psum — XLA
                # inserts the collectives. Shards model/optimizer memory
                # over ``model``; use when channel widths or optimizer
                # state outgrow one chip (the shard_map DDP path keeps
                # kernel-map builds shard-local and is the throughput
                # default).
                if devices % self.model_parallel:
                    raise ValueError(
                        f"devices {devices} not divisible by "
                        f"model_parallel {self.model_parallel}"
                    )
                from nerf_downstream_tpu.parallel.gspmd import make_mesh2d

                self.mesh = make_mesh2d(
                    devices // self.model_parallel, self.model_parallel
                )
            else:
                from nerf_downstream_tpu.parallel.mesh import make_mesh

                self.mesh = make_mesh(devices)
        self.best_score = -np.inf if monitor_mode == "max" else np.inf
        self.best_ckpt_path = os.path.join(default_root_dir, "best.ckpt")
        self.last_ckpt_path = os.path.join(default_root_dir, "last.ckpt")
        os.makedirs(default_root_dir, exist_ok=True)

    # ------------------------------------------------------------------

    def _log(self, metrics: dict, step: int):
        if not self._rank0():  # rank-zero logging (shared FS / services)
            return
        for lg in self.loggers:
            lg.log_metrics(metrics, step)

    def _is_better(self, score: float) -> bool:
        if self.monitor_mode == "max":
            return score > self.best_score
        return score < self.best_score

    # ------------------------------------------------------------------

    @staticmethod
    def _rank0() -> bool:
        return jax.process_count() == 1 or jax.process_index() == 0

    def _local_shards(self) -> int:
        """Data shards THIS process contributes (== devices when
        single-process; devices/process_count on a pod, where the
        DataModule already yields the per-process share)."""
        return max(self.devices // jax.process_count(), 1)

    def _place_batch(self, batch: dict) -> dict:
        """Shard array leaves over the mesh's data axis (replicate leaves
        whose leading dim doesn't split evenly — scalars, per-batch ints).
        Multi-process: each process holds its local share; the global
        array is assembled with make_array_from_process_local_data (the
        per-host input feeding that replaces DistributedSampler)."""
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = int(self.mesh.shape["data"])
        row = NamedSharding(self.mesh, P("data"))
        rep = NamedSharding(self.mesh, P())
        procs = jax.process_count()
        if procs > 1:
            n_local = max(n_data // procs, 1)

            def put(v):
                v = np.asarray(v)
                sh = (
                    row
                    if v.ndim >= 1 and v.shape[0]
                    and v.shape[0] % n_local == 0
                    else rep
                )
                return jax.make_array_from_process_local_data(sh, v)

            return {k: put(v) for k, v in batch.items()}

        def put(v):
            v = np.asarray(v)
            if v.ndim >= 1 and v.shape[0] % n_data == 0 and v.shape[0]:
                return jax.device_put(v, row)
            return jax.device_put(v, rep)

        return {k: put(v) for k, v in batch.items()}

    @staticmethod
    def _local_rows(arr):
        """This process's rows of a (possibly non-addressable) global
        array, in local-batch order: under multi-process the eval step
        returns GLOBAL logits while host-side metric hooks hold the LOCAL
        batch, so the hooks get the matching local slice. Single-process
        (fully addressable) arrays pass through."""
        if not isinstance(arr, jax.Array) or arr.is_fully_addressable:
            return arr
        seen, parts = set(), []
        for s in arr.addressable_shards:
            start = s.index[0].start or 0 if s.index else 0
            if start in seen:  # replicated copies
                continue
            seen.add(start)
            parts.append((start, np.asarray(s.data)))
        parts.sort(key=lambda p: p[0])
        return np.concatenate([p for _, p in parts], axis=0)

    def _reduce_validation_sums(self, task):
        """Cross-process allreduce of the task's host-side validation
        accumulators (IoU / top-k count sums): each process only saw its
        local rows, so the sums must be added over processes before
        ``validation_epoch_end`` — the reference gets this from
        torchmetrics' distributed-sum state (src/metrics.py:5-58)."""
        if jax.process_count() == 1:
            return
        sums = task.validation_sums()
        if sums is None:
            return
        from jax.experimental import multihost_utils

        task.set_validation_sums(
            jax.tree_util.tree_map(
                lambda x: np.asarray(
                    multihost_utils.process_allgather(np.asarray(x))
                ).sum(axis=0),
                sums,
            )
        )

    def _local_slice(self, batch: dict) -> dict:
        """First shard's rows of a shard-partitioned batch (for state init:
        the model is built with per-device shapes). ``batch`` is this
        process's LOCAL batch, covering _local_shards() shards."""
        shards = self._local_shards()
        out = {}
        for k, v in batch.items():
            v = np.asarray(v)
            if v.ndim >= 1 and v.shape[0] % shards == 0 and v.shape[0]:
                out[k] = v[: v.shape[0] // shards]
            else:
                out[k] = v
        return out

    def fit(self, state=None):
        task = self.task
        dm = self.datamodule
        rng = jax.random.PRNGKey(self.seed)

        train_iter = dm.train_batches()
        with self.profiler.profile("get_train_batch"):
            first_batch = next(train_iter)
        if state is None:
            # DDP builds the model with per-shard shapes (shard_map bodies
            # see one shard); GSPMD traces the GLOBAL shapes — sharding is
            # an annotation, not a decomposition
            init_batch = (
                self._local_slice(array_batch(first_batch))
                if self.mesh is not None and self.parallel_mode == "ddp"
                else first_batch
            )
            state = task.create_state(rng, init_batch)
        if self.resume_from_checkpoint:
            raw = checkpoints.load_checkpoint(self.resume_from_checkpoint)
            state = checkpoints.restore_into(
                state, raw, weights=True, optimizer=True
            )
            state = state.replace(
                step=jax.numpy.asarray(raw["global_step"], jax.numpy.int32)
            )
            logging.info(
                f"Resumed from {self.resume_from_checkpoint} at step "
                f"{raw['global_step']}"
            )

        # multi-process: establish the cross-host collective context NOW,
        # while the ranks are still in lockstep — a tiny psum compiles in
        # seconds on every rank, whereas deferring context creation to the
        # first (big) train step risks per-rank compile skew exceeding the
        # Gloo/ICI rendezvous timeout
        self._barrier("fit_start")

        if self.mesh is not None and self.parallel_mode == "gspmd":
            from nerf_downstream_tpu.parallel.gspmd import (
                make_gspmd_train_step,
                shard_state,
            )

            state = shard_state(self.mesh, state)
            train_step = make_gspmd_train_step(task, self.mesh)
        elif self.mesh is not None:
            from nerf_downstream_tpu.parallel.mesh import replicate

            state = replicate(self.mesh, state)
            train_step = task.make_parallel_train_step(self.mesh)
        else:
            train_step = task.make_train_step()
        start_step = int(state.step)
        pending = None  # (step, device metrics) fetched one step late
        mets = None
        batch = first_batch

        max_steps = self.max_steps
        if self.max_epochs and self.max_epochs > 0:
            # epoch-driven budget (reference Trainer max_epochs); the
            # datamodule reports steps per epoch when it can
            spe = getattr(dm, "steps_per_epoch", None)
            if callable(spe):
                max_steps = min(max_steps, spe() * self.max_epochs)

        for step in range(start_step, max_steps):
            with self.profiler.profile("run_training_batch"):
                state, mets = train_step(
                    state, self._place_batch(array_batch(batch))
                )

            if pending is not None:
                self._emit_train_logs(*pending)
            log_due = step % self.log_every_n_steps == 0 and step > 0
            pending = (step, mets) if log_due else None

            if (
                step % self.reset_profiler_every_n_steps == 0
                and step > 0
            ):
                self.profiler.reset()

            if (
                self.val_every_n_steps
                and step > 0
                and step % self.val_every_n_steps == 0
            ):
                jax.block_until_ready(state.params)
                val_metrics = self.validate(state)
                self._maybe_checkpoint(state, val_metrics)

            if step + 1 < max_steps:
                with self.profiler.profile("get_train_batch"):
                    batch = next(train_iter)

        if pending is not None:
            self._emit_train_logs(*pending)
        jax.block_until_ready(state.params)
        # fail loud even when the run is shorter than the log cadence: a
        # block-cap/window overflow poisons the loss with NaN and must never
        # produce a checkpoint that looks trained
        if mets is not None:
            self._check_finite_loss(
                {k: float(np.asarray(v)) for k, v in mets.items()}
            )
        if self._rank0():
            checkpoints.save_checkpoint(self.last_ckpt_path, state)
            if not os.path.exists(self.best_ckpt_path):
                checkpoints.save_checkpoint(self.best_ckpt_path, state)
        self._barrier("fit_end")  # ckpts visible before any rank reads
        return state

    @staticmethod
    def _barrier(tag: str):
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ndt_{tag}")

    @staticmethod
    def _check_finite_loss(mets, phase: str = "train"):
        loss = float(np.asarray(mets.get("loss", 0.0)))
        if not np.isfinite(loss):
            hint = ""
            ratio = mets.get("ignore_ratio")  # percentage (0-100)
            if ratio is not None and float(np.asarray(ratio)) >= 99.999:
                hint = (
                    " NOTE: ignore_ratio == 100% — every label in the batch "
                    "remapped to ignore, so the CE mean is 0/0; check the "
                    "dataset's label space (ScanNet expects raw nyu40 ids)."
                )
            raise ValueError(
                f"Invalid {phase} loss: {loss}. A non-finite loss under a "
                "block method usually means a block-cap overflow, and under "
                "method='window' a window-escape / escape-list overflow — "
                "all guards NaN-poison rather than silently truncate. "
                "Fixes: raise CoordinateContext.block_caps / lower "
                "block_cap_divisor (or raise window_escape_cap / "
                "window_blocks) to this dataset's statistics, or fall "
                "back to the capless row path with "
                "CoordinateContext.method='row'." + hint
            )

    def _emit_train_logs(self, step: int, mets):
        host = {k: float(np.asarray(v)) for k, v in mets.items()}
        self._check_finite_loss(host)
        out = {f"train/{k}": v for k, v in host.items()}
        out["train/lr"] = self.task.current_lr(step)
        out["train/data_time"] = self.profiler.recorded_time("get_train_batch")
        out["train/iter_time"] = self.profiler.recorded_time(
            "run_training_batch"
        )
        self._log(out, step)

    def _maybe_checkpoint(self, state, val_metrics: dict):
        if self._rank0():
            checkpoints.save_checkpoint(self.last_ckpt_path, state)
        score = val_metrics.get(self.monitor_metric)
        if score is not None and self._is_better(score):
            # metrics are psum'd, so every rank tracks the same best_score;
            # only rank 0 writes the shared-FS artifact
            self.best_score = score
            if self._rank0():
                checkpoints.save_checkpoint(
                    self.best_ckpt_path, state,
                    meta={self.monitor_metric: score},
                )
                logging.info(
                    f"New best {self.monitor_metric}={score:.4f} -> "
                    f"{self.best_ckpt_path}"
                )

    # ------------------------------------------------------------------

    def validate(self, state, phase: str = "val") -> dict:
        task = self.task
        if self.mesh is not None and self.parallel_mode == "gspmd":
            # the plain eval step is GSPMD-ready: batches arrive sharded
            # over ``data`` and XLA derives the collectives from shardings
            eval_step = task.make_eval_step()
        elif self.mesh is not None:
            eval_step = task.make_parallel_eval_step(self.mesh)
        else:
            eval_step = task.make_eval_step()
        task.on_validation_start()
        results = []
        for batch in self.datamodule.val_batches(phase):
            t0 = time.perf_counter()
            logits, mets = eval_step(
                state, self._place_batch(array_batch(batch))
            )
            jax.block_until_ready(logits)
            iter_time = time.perf_counter() - t0
            task.validation_batch_end(self._local_rows(logits), batch)
            host = {k: float(np.asarray(v)) for k, v in mets.items()}
            self._check_finite_loss(host, phase=phase)
            host["iter_time"] = iter_time
            results.append(host)
        self._reduce_validation_sums(task)
        out = task.validation_epoch_end(results, self.default_root_dir)
        step = int(state.step)
        for k in ["OA", "loss", "iter_time"]:
            vals = [r[k] for r in results if k in r]
            if vals and f"val/{k}" not in out:
                out[f"val/{k}"] = float(np.mean(vals))
        self._log(out, step)
        logging.info({k: round(v, 4) for k, v in out.items()})
        return out

    def test(self, state=None, ckpt_path: str = "best", phase: str = "test"):
        if state is None:
            raise ValueError("test() needs a state to bind the checkpoint to")
        if ckpt_path == "best":
            ckpt_path = self.best_ckpt_path
        elif ckpt_path == "last":
            ckpt_path = self.last_ckpt_path
        self._barrier("test_ckpt_read")  # rank 0 writes; all ranks read
        if ckpt_path and os.path.exists(ckpt_path):
            raw = checkpoints.load_checkpoint(ckpt_path)
            state = checkpoints.restore_into(state, raw, weights=True)
        return self.validate(state, phase=phase)
