"""Stage-1 CLIP training step (reference train_CLIP_stage1.py main loop).

One jit-compiled SPMD step over the mesh: vision+text forward, global
symmetric InfoNCE, grads, AdamW update. XLA inserts the gradient all-reduce
and the in-loss feature all-gather over ICI.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hsenet_tpu.models.clip import CLIPModel
from hsenet_tpu.train.losses import clip_contrastive_loss, retrieval_accuracy
from hsenet_tpu.train.train_state import TrainState, jit_sharding_stable


def stage1_loss_fn(
    model: CLIPModel, params, batch: Dict[str, jax.Array], dropout_rng=None
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
    image_features, text_features, scale = model.apply(
        params,
        batch["image"],
        batch["input_ids"],
        batch.get("attention_mask"),
        deterministic=dropout_rng is None,
        rngs=rngs,
    )
    loss, logits_i, _ = clip_contrastive_loss(
        image_features, text_features, scale
    )
    metrics = {
        "loss": loss,
        "retrieval_acc": retrieval_accuracy(logits_i),
        "logit_scale": scale,
    }
    return loss, metrics


def make_stage1_train_step(
    model: CLIPModel,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    loss_fn=None,
):
    """Returns train_step(state, batch, rng) -> (state, metrics), jitted.

    `loss_fn(params, batch, dropout_rng) -> (loss, metrics)` replaces the
    default contrastive loss — the hook the sequence-parallel step
    (parallel/sp.py) uses to swap in the ring-attention vision encode
    while sharing this update tail."""
    if loss_fn is None:
        loss_fn = functools.partial(stage1_loss_fn, model)

    def train_step(state: TrainState, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        if mesh is not None:
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P("dp"))
                ),
                batch,
            )
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch, dropout_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    # sharding-stable: output state placement pinned to the input's (the
    # ZeRO-1 update all-gather happens inside the step, not by accident
    # in the next forward pass)
    return jit_sharding_stable(train_step)
