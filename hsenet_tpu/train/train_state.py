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
    def create(
        cls, params, tx: optax.GradientTransformation, mesh=None
    ) -> "TrainState":
        """Build the initial state; `tx.init` moments inherit each param's
        placement automatically.

        `mesh`: when training over a device mesh, pass it so the SCALAR
        leaves (`step`, optax `count`s) are placed mesh-replicated up
        front. Freshly-created scalars are single-device, but the compiled
        train step returns them mesh-replicated — without this the second
        step's input shardings differ from the first's and jit silently
        recompiles the whole program (one full extra XLA compile per run).
        """
        state = cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            repl = NamedSharding(mesh, PartitionSpec())
            state = jax.tree.map(
                lambda x: (
                    jax.device_put(x, repl)
                    if getattr(x, "ndim", None) == 0
                    else x
                ),
                state,
            )
        return state


def jit_sharding_stable(fn, donate_argnums=(0,)):
    """jit a `fn(state, *args) -> (state, aux)` step, pinning the output
    state's placement to the input state's.

    Without this, XLA picks the output shardings by propagation — e.g.
    under ZeRO-1 (Adam moments dp-sharded, params replicated) it happily
    returns the UPDATED PARAMS dp-sharded because the updates inherit the
    moments' sharding, which (a) silently recompiles the whole step on the
    second call (input shardings no longer match) and (b) turns every
    subsequent forward pass into per-use all-gathers the user never asked
    for. Pinning `out_shardings` to the input placement makes XLA insert
    the one update all-gather exactly where ZeRO-1 wants it and makes
    "placement in == placement out" an invariant of every train step.

    The jit is built lazily per distinct input placement (the shardings
    aren't known until a concrete state arrives) and cached.
    """
    cache = {}
    from jax.sharding import NamedSharding

    def wrapper(state, *args):
        shardings = jax.tree.map(lambda l: l.sharding, state)
        leaves = jax.tree.leaves(shardings)
        # Pin only when the state is actually mesh-placed. A state left on
        # one device (unit tests, eager experimentation) may legitimately
        # be combined with mesh-sharded batches — jit promotes it onto the
        # mesh, and pinning single-device outputs would be a device-set
        # mismatch error.
        if not all(isinstance(s, NamedSharding) for s in leaves):
            key = None
            out_shardings = None
        else:
            key = tuple(leaves)
            out_shardings = (shardings, None)
        jitted = cache.get(key)
        if jitted is None:
            jitted = jax.jit(
                fn,
                donate_argnums=donate_argnums,
                out_shardings=out_shardings,
            )
            cache[key] = jitted
        return jitted(state, *args)

    # the raw (unjitted) step, for AOT rehearsal: production-shape
    # partitioning checks lower-and-compile it with abstract
    # ShapeDtypeStruct inputs, which the lazy-jit wrapper above cannot
    # accept (it calls the jit with concrete arguments)
    wrapper.__wrapped__ = fn
    return wrapper


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
