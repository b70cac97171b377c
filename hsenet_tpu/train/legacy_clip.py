"""Legacy masked-contrastive CLIP (reference `M3DCLIP`, model/CLIP.py).

loss = unmasked_CL + 0.1 * masked_CL, with the mask ratio following a
Gaussian temperature ramp from `initial` to `max_ratio`
(update_mask_ratio, CLIP.py:54-72; production uses max 0.4, temperature
1e-4, CLIP.py:141-146). The masked stream keeps the top-(1-ratio) patches
ranked by slice-guided score.

TPU adaptation: the continuous ratio is quantized to `num_buckets` static
token counts so jit compiles a bounded set of masked-tower shapes.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hsenet_tpu.models.clip import CLIPModel
from hsenet_tpu.train.losses import clip_contrastive_loss, retrieval_accuracy
from hsenet_tpu.train.train_state import TrainState


def update_mask_ratio(
    step: float,
    initial_mask_ratio: float = 0.05,
    max_mask_ratio: float = 0.4,
    temperature_factor: float = 1e-4,
) -> float:
    """Gaussian ramp (CLIP.py:54-72, production args CLIP.py:141-146)."""
    growth = math.exp(-((step * temperature_factor) ** 2))
    ratio = initial_mask_ratio + (max_mask_ratio - initial_mask_ratio) * (
        1 - growth
    )
    return min(ratio, max_mask_ratio)


def bucketed_unmasked_tokens(
    step: int,
    num_patches: int,
    num_buckets: int = 8,
    **ratio_kwargs,
) -> int:
    """Static unmasked-token count for this step, quantized to num_buckets
    values so XLA compiles at most num_buckets masked-tower shapes."""
    ratio = update_mask_ratio(step, **ratio_kwargs)
    unmasked = num_patches * (1.0 - ratio)
    bucket = max(1, num_patches // num_buckets)
    return max(bucket, int(round(unmasked / bucket)) * bucket)


def make_masked_clip_train_step(
    model,  # MaskedCLIPModel-like: apply(...) -> (img_f, img_f_masked, txt_f, scale)
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    masked_loss_weight: float = 0.1,
):
    """train_step(state, batch, rng, unmasked_tokens) — unmasked_tokens is
    static (recompiles once per bucket)."""

    def loss_fn(params, batch, unmasked_tokens, dropout_rng):
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        img_f, img_f_masked, txt_f, scale = model.apply(
            params,
            batch["image"],
            batch["input_ids"],
            batch.get("attention_mask"),
            batch["image_2d"],
            unmasked_tokens,
            deterministic=dropout_rng is None,
            rngs=rngs,
        )
        loss_unmasked, logits_i, _ = clip_contrastive_loss(img_f, txt_f, scale)
        loss_masked, _, _ = clip_contrastive_loss(img_f_masked, txt_f, scale)
        loss = loss_unmasked + masked_loss_weight * loss_masked
        return loss, {
            "loss": loss,
            "loss_unmasked": loss_unmasked,
            "loss_masked": loss_masked,
            "retrieval_acc": retrieval_accuracy(logits_i),
        }

    @functools.partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng, unmasked_tokens: int):
        dropout_rng = jax.random.fold_in(rng, state.step)
        if mesh is not None:
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P("dp"))
                ),
                batch,
            )
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, unmasked_tokens, dropout_rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    return train_step
