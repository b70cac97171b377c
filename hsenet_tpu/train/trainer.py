"""Generic training loop: host loader -> device batches -> jitted step.

Replaces the reference's HF Trainer + accelerate stack (train_CLIP_stage1
.py:231-257) with an explicit loop: logging with step timing, periodic eval
hook, orbax checkpointing with keep-limit + milestone saves, grad-norm
monitoring (the reference's GradientMonitorCallback, :219-228), and
on-device augmentation applied to the image stream.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hsenet_tpu.configs import AugmentConfig, TrainConfig
from hsenet_tpu.data.augment import augment_batch
from hsenet_tpu.parallel.mesh import shard_batch
from hsenet_tpu.train.train_state import TrainState


@dataclass
class TrainerHooks:
    on_log: Optional[Callable[[int, Dict[str, float]], None]] = None
    on_eval: Optional[Callable[[int, TrainState], Dict[str, float]]] = None
    milestone_steps: tuple = ()


class TensorBoardLogger:
    """tf.summary writer hook (the reference reports to tensorboard via HF
    Trainer, train_CLIP_stage1.py:113). Use as TrainerHooks(on_log=...)."""

    def __init__(self, logdir: str):
        import tensorflow as tf  # baked in; used only for summaries

        self._tf = tf
        self._writer = tf.summary.create_file_writer(logdir)

    def __call__(self, step: int, metrics: Dict[str, float]) -> None:
        with self._writer.as_default():
            for k, v in metrics.items():
                self._tf.summary.scalar(k, v, step=step)
        self._writer.flush()
        msg = ", ".join(f"{k}={v:.4f}" for k, v in metrics.items())
        print(f"step {step}: {msg}", flush=True)


class Trainer:
    def __init__(
        self,
        train_step: Callable,
        state: TrainState,
        loader_factory: Callable[[], Iterable[dict]],
        cfg: TrainConfig,
        mesh=None,
        checkpoint_manager=None,
        hooks: Optional[TrainerHooks] = None,
        augment: Optional[AugmentConfig] = None,
        image_key: str = "image",
    ):
        self.train_step = train_step
        self.state = state
        self.loader_factory = loader_factory
        self.cfg = cfg
        self.mesh = mesh
        self.ckpt = checkpoint_manager
        self.hooks = hooks or TrainerHooks()
        self.augment = augment
        self.image_key = image_key
        self.history: List[Dict[str, float]] = []

    def _place(self, batch: dict) -> dict:
        """Host batch -> device arrays (sharded over the mesh if any)."""
        batch = {
            k: v for k, v in batch.items() if isinstance(v, np.ndarray)
        }
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh)
        return batch

    def _device_batch(self, batch: dict, rng, placed: bool = False) -> dict:
        if not placed:
            batch = self._place(batch)
        if self.augment is not None and self.image_key in batch:
            batch[self.image_key] = augment_batch(
                batch[self.image_key], rng, self.augment
            )
        return batch

    def fit(self, total_steps: Optional[int] = None) -> TrainState:
        total = total_steps or self.cfg.total_steps
        # Per-step RNG is fold_in(base, step) — a pure function of
        # (seed, step) — and the data position is fast-forwarded below, so
        # a run restored from a checkpoint consumes exactly the batches and
        # randomness an unbroken run would have. (A chained `split` stream
        # restarts from the seed after a process restart and diverges; the
        # reference has no deterministic-resume story at all, its only
        # resume knob reloads weights — train_VLM.py:505-511.)
        base_rng = jax.random.PRNGKey(self.cfg.seed)
        step = int(self.state.step)
        epoch: Optional[int] = None
        pending_skip = 0
        t_last = time.perf_counter()
        while step < total:
            loader = self.loader_factory()
            if epoch is None:
                epoch = 0
                if step:  # resumed: recover (epoch, intra-epoch offset)
                    try:
                        steps_per_epoch = len(loader)
                    except TypeError:
                        steps_per_epoch = 0
                    if steps_per_epoch:
                        epoch = step // steps_per_epoch
                        pending_skip = step % steps_per_epoch
            if hasattr(loader, "epoch"):
                loader.epoch = epoch
            if pending_skip and hasattr(loader, "skip_next_batches"):
                # consumed by DataLoader.__iter__ without decoding samples
                loader.skip_next_batches = pending_skip
                pending_skip = 0
            batches = iter(loader)
            for _ in range(pending_skip):  # generic-iterable fallback
                next(batches, None)
            pending_skip = 0
            # double-buffered H2D: place batch i+1 while step i computes
            # (data/prefetch.py; the reference copies inline on the train
            # thread — HF Trainer's default)
            depth = getattr(self.cfg, "device_prefetch", 0)
            placed = bool(depth)
            if placed:
                from hsenet_tpu.data.prefetch import DevicePrefetcher

                batches = iter(
                    DevicePrefetcher(batches, depth=depth,
                                     place=self._place)
                )
            for batch in batches:
                if step >= total:
                    break
                if self.cfg.profile_dir:
                    # trace a steady-state step window (the reference has no
                    # profiling at all, SURVEY.md §5)
                    if step == self.cfg.profile_start:
                        jax.profiler.start_trace(self.cfg.profile_dir)
                        self._tracing = True
                    elif step == self.cfg.profile_stop and getattr(
                        self, "_tracing", False
                    ):
                        jax.block_until_ready(self.state.params)
                        jax.profiler.stop_trace()
                        self._tracing = False
                aug_rng, step_rng = jax.random.split(
                    jax.random.fold_in(base_rng, step)
                )
                device_batch = self._device_batch(
                    batch, aug_rng, placed=placed
                )
                self.state, metrics = self.train_step(
                    self.state, device_batch, step_rng
                )
                step = int(self.state.step)

                if step % self.cfg.log_every == 0 or step == total:
                    jax.block_until_ready(metrics["loss"])
                    now = time.perf_counter()
                    row = {k: float(v) for k, v in metrics.items()}
                    # NaN guard at log granularity (per-step host syncs would
                    # serialize the pipeline); the reference has no failure
                    # detection at all (SURVEY §5)
                    if not np.isfinite(row["loss"]):
                        raise FloatingPointError(
                            f"non-finite loss {row['loss']} at step {step}; "
                            "halting (restore the last checkpoint to resume)"
                        )
                    row["steps_per_sec"] = self.cfg.log_every / max(
                        now - t_last, 1e-9
                    )
                    t_last = now
                    self.history.append({"step": step, **row})
                    if self.hooks.on_log:
                        self.hooks.on_log(step, row)
                    else:
                        msg = ", ".join(
                            f"{k}={v:.4f}" for k, v in row.items()
                        )
                        print(f"step {step}: {msg}", flush=True)

                if (
                    self.hooks.on_eval
                    and self.cfg.eval_every
                    and step % self.cfg.eval_every == 0
                ):
                    eval_metrics = self.hooks.on_eval(step, self.state)
                    if eval_metrics:
                        print(f"eval @ {step}: {eval_metrics}", flush=True)

                if self.ckpt is not None and (
                    step % self.cfg.checkpoint_every == 0
                    or step in self.hooks.milestone_steps
                ):
                    self.ckpt.save(step, self.state)
            epoch += 1
        if getattr(self, "_tracing", False):  # stop hit past total_steps
            jax.block_until_ready(self.state.params)
            jax.profiler.stop_trace()
            self._tracing = False
        if self.ckpt is not None and hasattr(self.ckpt, "wait"):
            self.ckpt.wait()  # join an in-flight async save before returning
        return self.state
