"""Training loop: epochs, LR schedule, sharded step, checkpoints, metrics.

The reference has no trainer (SURVEY.md §2 #33 [ABSENT]); this is the
TPU-native design: ONE jitted train step (loss + grads + optimizer update,
GSPMD-sharded over the mesh) driven by a host loop that only feeds batches
and logs.  The host never touches device values except at the logging
interval (async dispatch keeps the chip busy while the next batch decodes).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel.mesh import shard_batch, shard_params
from ..parallel.train_step import TrainState, create_train_state, make_train_step
from .checkpoint import save_checkpoint

logger = logging.getLogger(__name__)


def detection_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    total_epochs: int,
    decay_epochs=(8, 11),
    decay_factor: float = 0.1,
    warmup_steps: int = 500,
    warmup_ratio: float = 1.0 / 3.0,
    policy: str = "step",
    min_lr_ratio: float = 0.0,
) -> optax.Schedule:
    """mmdetection-style schedule: linear warmup, then ``policy``:
    "step" (piecewise decay at ``decay_epochs``) or "cosine" (anneal to
    ``min_lr_ratio * base_lr`` over the full run)."""
    assert policy in ("step", "cosine")
    if policy == "cosine":
        total = max(total_epochs * steps_per_epoch, 1)

        def main(step):
            t = jnp.clip(step / total, 0.0, 1.0)
            floor = min_lr_ratio * base_lr
            return floor + (base_lr - floor) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
    else:
        boundaries = {int(e * steps_per_epoch): decay_factor for e in decay_epochs}
        main = optax.piecewise_constant_schedule(base_lr, boundaries)

    def schedule(step):
        warm = base_lr * (warmup_ratio + (1 - warmup_ratio) * jnp.minimum(step, warmup_steps) / warmup_steps)
        return jnp.where(step < warmup_steps, warm, main(step))

    return schedule


class Trainer:
    """Drives (model loss_fn, optimizer, dataloader) for N epochs.

    ``loss_fn(params, batch_stats, batch) -> (loss, metrics)`` — typically a
    closure over a detector and ``retina_loss``.
    """

    def __init__(
        self,
        loss_fn: Callable,
        variables: Dict[str, Any],
        tx: optax.GradientTransformation,
        dataloader,
        mesh=None,
        work_dir: str = "work_dir",
        log_interval: int = 50,
        checkpoint_interval_epochs: int = 1,
        max_keep_checkpoints: int = 3,
        profile_dir: Optional[str] = None,
        val_hook: Optional[Callable[[Dict[str, Any]], Dict[str, float]]] = None,
        val_interval_epochs: int = 1,
        best_metric: str = "mAP",
        ema_decay: Optional[float] = None,
        accum_steps: int = 1,
        fsdp: bool = False,
        checkpoint_interval_steps: Optional[int] = None,
        handle_preemption: bool = False,
        lr_schedule: Optional[Callable] = None,
    ):
        self.loss_fn = loss_fn
        self.tx = tx
        self.dataloader = dataloader
        self.mesh = mesh
        self.work_dir = os.path.abspath(work_dir)
        # on multi-process pods only process 0 touches the (shared) work_dir:
        # checkpoints, validation, and the metrics file — replicated arrays
        # are fully addressable from any process, so no collective is needed
        self.is_main = jax.process_index() == 0
        if self.is_main:
            os.makedirs(self.work_dir, exist_ok=True)
        # persisted training curve (SURVEY §5 "metrics/logging: near-absent"
        # reference gap): one JSON object per logged step / validation, so
        # runs can be compared post-hoc without grepping console logs
        self.metrics_path = os.path.join(self.work_dir, "metrics.jsonl")
        # optional ``step -> lr`` (builder.build_lr_schedule) for the curve
        self.lr_schedule = lr_schedule
        self.skipped_steps = 0
        self.log_interval = log_interval
        self.checkpoint_interval_epochs = checkpoint_interval_epochs
        self.max_keep_checkpoints = max_keep_checkpoints
        self.profile_dir = profile_dir
        # in-training validation: ``val_hook(variables) -> {"mAP": ...}``
        # (engine.validate.make_validation_hook); the best-``best_metric``
        # epoch is additionally saved to ``work_dir/best`` outside the
        # retention window
        self.val_hook = val_hook
        self.val_interval_epochs = max(1, val_interval_epochs)
        self.best_metric = best_metric
        self.best_score = float("-inf")
        self._saved = []
        # EMA of the params (validated/checkpointed alongside the raw ones)
        # and microbatch gradient accumulation — see make_train_step
        self.ema_decay = ema_decay
        self.accum_steps = max(1, int(accum_steps))
        # preemption safety (SURVEY §5 elastic recovery): optional mid-epoch
        # ``step_<global>`` checkpoints every N optimizer steps, and a
        # cooperative preemption flag — ``request_preemption()`` (wired to
        # SIGTERM/SIGINT with ``handle_preemption=True``) finishes the
        # in-flight step, checkpoints the exact batch position, and returns.
        # Resume re-enters the SAME epoch at the SAME batch via
        # ``run(..., skip_batches=meta['batches_done'])`` — the loader skips
        # without decoding, so interrupted+resumed == uninterrupted exactly.
        self.checkpoint_interval_steps = checkpoint_interval_steps
        self._preempt_requested = False
        self.preempted = False
        if handle_preemption:
            self.install_preemption_handler()
        # ZeRO-3 state sharding over the data axis (parallel.mesh docstring)
        self.fsdp = bool(fsdp) and mesh is not None

        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        if mesh is not None:
            params = shard_params(mesh, params, fsdp=self.fsdp)
            if batch_stats is not None:
                batch_stats = shard_params(mesh, batch_stats)
        self.state = create_train_state(
            params, tx, batch_stats=batch_stats, ema=ema_decay is not None
        )
        step_builder = make_train_step(
            loss_fn, tx, mesh=mesh,
            ema_decay=ema_decay, accum_steps=self.accum_steps, fsdp=self.fsdp,
        )
        self.train_step = step_builder(self.state) if mesh is not None else step_builder
        self.history: list = []

    def request_preemption(self) -> None:
        """Cooperatively stop after the in-flight step, checkpointing the
        exact (epoch, batch) position for a deterministic resume."""
        self._preempt_requested = True

    def install_preemption_handler(self, signals=None) -> None:
        import signal as _signal

        signals = signals or (_signal.SIGTERM, _signal.SIGINT)
        for sig in signals:
            try:
                _signal.signal(sig, lambda *_: self.request_preemption())
            except ValueError:  # not the main thread (e.g. under a test rig)
                logger.warning("cannot install preemption handler off-main-thread")
                return

    def run(self, num_epochs: int, start_epoch: int = 0, skip_batches: int = 0) -> TrainState:
        global_step = int(self.state.step)
        for epoch in range(start_epoch, num_epochs):
            self.dataloader.set_epoch(epoch)
            epoch_t0 = time.perf_counter()
            n_images = 0
            if self.profile_dir and epoch == start_epoch:
                jax.profiler.start_trace(self.profile_dir)
            window_t0 = time.perf_counter()
            skip = skip_batches if epoch == start_epoch else 0
            batches_done = skip
            window_skipped = []  # device scalars; summed lazily at log time
            for batch in self.dataloader.iter_batches(skip):
                meta = batch.pop("img_meta", None)
                dev_batch = shard_batch(self.mesh, batch) if self.mesh is not None else batch
                self.state, metrics = self.train_step(self.state, dev_batch)
                if "skipped_nonfinite" in metrics:
                    window_skipped.append(metrics["skipped_nonfinite"])
                n_images += batch["image"].shape[0]
                global_step += 1
                batches_done += 1
                if (
                    self.checkpoint_interval_steps
                    and global_step % self.checkpoint_interval_steps == 0
                ) or self._preempt_requested:
                    self._checkpoint_step(epoch, batches_done, global_step)
                if self._preempt_requested:
                    self.preempted = True
                    logger.info(
                        "preempted at epoch %d batch %d (step %d); state saved",
                        epoch, batches_done, global_step,
                    )
                    if self.profile_dir and epoch == start_epoch:
                        jax.profiler.stop_trace()
                    return self.state
                if global_step % self.log_interval == 0:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    # exact skipped-step count over the window (the values
                    # were computed steps ago; float() here costs nothing)
                    self.skipped_steps += int(sum(float(s) for s in window_skipped))
                    window_skipped = []
                    metrics["skipped_steps"] = self.skipped_steps
                    dt = time.perf_counter() - window_t0
                    window_t0 = time.perf_counter()
                    ips = self.log_interval * batch["image"].shape[0] / max(dt, 1e-9)
                    metrics["images_per_sec"] = ips
                    metrics["epoch"] = epoch
                    metrics["step"] = global_step
                    metrics["lr"] = self._current_lr()
                    self.history.append(metrics)
                    self._write_metrics(metrics)
                    # print every loss_* component verbatim so two-stage
                    # metric names (loss_rpn_cls, loss_rcnn_reg, ...) show
                    parts = " ".join(
                        f"{k[5:]} {v:.4f}" for k, v in sorted(metrics.items())
                        if k.startswith("loss_")
                    )
                    logger.info(
                        "epoch %d step %d loss %.4f (%s) %.1f img/s",
                        epoch, global_step, metrics.get("loss", 0.0), parts, ips,
                    )
            if self.profile_dir and epoch == start_epoch:
                jax.profiler.stop_trace()
            epoch_dt = time.perf_counter() - epoch_t0
            logger.info("epoch %d done: %d images in %.1fs", epoch, n_images, epoch_dt)
            if (epoch + 1) % self.checkpoint_interval_epochs == 0:
                self._checkpoint(epoch)
            if self.val_hook is not None and (epoch + 1) % self.val_interval_epochs == 0:
                self._validate(epoch)
        return self.state

    def _current_lr(self) -> Optional[float]:
        if self.lr_schedule is None:
            return None
        return float(self.lr_schedule(int(self.state.step)))

    def _write_metrics(self, record: Dict[str, Any]) -> None:
        """Append one JSON object per logged window / validation to
        ``work_dir/metrics.jsonl`` (process 0 only)."""
        if not self.is_main:
            return
        import json

        clean = {
            k: (float(v) if isinstance(v, (int, float, np.floating, np.integer)) else v)
            for k, v in record.items()
            if v is not None
        }
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(clean) + "\n")

    def _validate(self, epoch: int) -> None:
        if not self.is_main:
            return
        # validate the EMA weights when tracked — they are what would ship
        eval_params = (
            self.state.ema_params
            if self.state.ema_params is not None
            else self.state.params
        )
        variables = {"params": jax.device_get(eval_params)}
        if self.state.batch_stats is not None:
            variables["batch_stats"] = jax.device_get(self.state.batch_stats)
        t0 = time.perf_counter()
        metrics = self.val_hook(variables)
        dt = time.perf_counter() - t0
        parts = " ".join(f"{k} {v:.4f}" for k, v in sorted(metrics.items()))
        logger.info("epoch %d val (%.1fs): %s", epoch, dt, parts)
        val_record = {"epoch": epoch, **{f"val_{k}": v for k, v in metrics.items()}}
        self.history.append(val_record)
        self._write_metrics(val_record)
        score = metrics.get(self.best_metric)
        if score is not None and score > self.best_score:
            self.best_score = float(score)
            path = os.path.join(self.work_dir, "best")
            save_checkpoint(
                path, variables, opt_state=self.state.opt_state,
                meta={"epoch": epoch + 1, "step": int(self.state.step),
                      self.best_metric: float(score)},
            )
            logger.info(
                "new best %s %.4f at epoch %d -> %s",
                self.best_metric, self.best_score, epoch, path,
            )

    def _state_variables(self) -> Dict[str, Any]:
        variables = {"params": self.state.params}
        if self.state.batch_stats is not None:
            variables["batch_stats"] = self.state.batch_stats
        if self.state.ema_params is not None:
            variables["ema_params"] = self.state.ema_params
        return variables

    def _checkpoint_step(self, epoch: int, batches_done: int, global_step: int) -> None:
        """Mid-epoch checkpoint carrying the exact resume position."""
        if not self.is_main:
            return
        path = os.path.join(self.work_dir, f"step_{global_step}")
        save_checkpoint(
            path, self._state_variables(), opt_state=self.state.opt_state,
            meta={"epoch": epoch, "batches_done": batches_done,
                  "step": global_step},
        )
        self._saved.append(path)
        self._retain()
        logger.info("saved mid-epoch checkpoint %s", path)

    def _checkpoint(self, epoch: int) -> None:
        if not self.is_main:
            return
        path = os.path.join(self.work_dir, f"epoch_{epoch + 1}")
        save_checkpoint(
            path, self._state_variables(), opt_state=self.state.opt_state,
            meta={"epoch": epoch + 1, "step": int(self.state.step)},
        )
        self._saved.append(path)
        self._retain()
        logger.info("saved checkpoint %s", path)

    def _retain(self) -> None:
        # retention: keep the newest k checkpoints (failure-recovery window)
        while len(self._saved) > self.max_keep_checkpoints:
            old = self._saved.pop(0)
            import shutil

            shutil.rmtree(old, ignore_errors=True)
