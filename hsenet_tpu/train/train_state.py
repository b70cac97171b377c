"""Minimal functional train state + optimizer factory."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from hsenet_tpu.configs import TrainConfig


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
        )


def make_schedule(cfg: TrainConfig) -> optax.Schedule:
    """Warmup + cosine, matching the reference's HF TrainingArguments
    (warmup_ratio 0.03, lr_scheduler_type cosine; script/train_clip_stage1.sh)."""
    warmup = max(1, int(cfg.total_steps * cfg.warmup_ratio))
    if cfg.schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=warmup,
            # optax requires decay_steps > warmup_steps; a 1-step run
            # (smoke tests, single-step resumes) degenerates to warmup-only
            decay_steps=max(cfg.total_steps, warmup + 1),
            end_value=0.0,
        )
    if cfg.schedule == "constant":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, cfg.learning_rate, warmup),
                optax.constant_schedule(cfg.learning_rate),
            ],
            [warmup],
        )
    raise ValueError(cfg.schedule)


def make_optimizer(
    cfg: TrainConfig, trainable_mask: Optional[Any] = None
) -> optax.GradientTransformation:
    """AdamW + global-norm clipping; optional per-param trainable mask
    (freezing is a mask here, not requires_grad mutation)."""
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            make_schedule(cfg),
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
        ),
    )
    if trainable_mask is not None:
        tx = optax.chain(
            optax.masked(tx, trainable_mask),
            optax.masked(optax.set_to_zero(), jax.tree.map(lambda m: not m, trainable_mask)),
        )
    return tx
