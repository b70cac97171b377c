"""Training losses.

  * `clip_contrastive_loss`: symmetric InfoNCE over the *global* batch
    (reference `image_text_contrastive_learning`, CLIP_stage1.py:141-155).
    Under jit on a dp mesh the (B, B) logits over a sharded batch make XLA
    emit the grad-carrying all-gather the reference does manually via
    torch.distributed.nn (dist_utils.py:280-306).
  * `relation_regulation_loss` + `relation_weight`: stage-2
    semantic-consistency MSE between frozen-teacher and student logit
    matrices with the 0.1*(1-step/5000) ramp (CLIP_stage2.py:141-151,
    187-190).
  * `masked_lm_loss`: next-token CE with -100 label masking (HF semantics
    used by the VLM finetune, train_VLM.py / CapDataset label rules).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def clip_contrastive_loss(
    image_features: jax.Array,  # (B, D), L2-normalised
    text_features: jax.Array,  # (B, D), L2-normalised
    logit_scale: jax.Array,
    labels: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (loss, logits_per_image, logits_per_text)."""
    logits_per_image = (
        logit_scale
        * jnp.einsum(
            "id,jd->ij",
            image_features,
            text_features,
            preferred_element_type=jnp.float32,
        )
    )
    logits_per_text = logits_per_image.T
    b = image_features.shape[0]
    if labels is None:
        labels = jnp.arange(b)
    loss_i = optax.softmax_cross_entropy_with_integer_labels(
        logits_per_image, labels
    ).mean()
    loss_t = optax.softmax_cross_entropy_with_integer_labels(
        logits_per_text, labels
    ).mean()
    return (loss_i + loss_t) / 2.0, logits_per_image, logits_per_text


def relation_regulation_loss(
    teacher_logits_per_image: jax.Array,
    teacher_logits_per_text: jax.Array,
    student_logits_per_image: jax.Array,
    student_logits_per_text: jax.Array,
) -> jax.Array:
    t_i = jax.lax.stop_gradient(teacher_logits_per_image)
    t_t = jax.lax.stop_gradient(teacher_logits_per_text)
    loss_i = jnp.mean((t_i - student_logits_per_image) ** 2)
    loss_t = jnp.mean((t_t - student_logits_per_text) ** 2)
    return (loss_i + loss_t) / 2.0


def relation_weight(
    step: jax.Array, max_weighted_step: int = 5000, base_weight: float = 0.1
) -> jax.Array:
    """0.1 * (1 - step/5000) for step < 5000, else 0 (CLIP_stage2.py:141-151)."""
    w = base_weight * (1.0 - step / max_weighted_step)
    return jnp.where(step < max_weighted_step, w, 0.0)


def retrieval_accuracy(logits_per_image: jax.Array) -> jax.Array:
    """In-training eval metric: diagonal argmax accuracy
    (reference compute_metrics, train_CLIP_stage1.py:116-131)."""
    b = logits_per_image.shape[0]
    labels = jnp.arange(b)
    acc_i = (jnp.argmax(logits_per_image, axis=1) == labels).mean()
    acc_t = (jnp.argmax(logits_per_image, axis=0) == labels).mean()
    return (acc_i + acc_t) / 2.0


def masked_lm_loss(
    logits: jax.Array,  # (B, S, V)
    labels: jax.Array,  # (B, S) with -100 = ignore
    shift: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Causal-LM CE; returns (loss, token_accuracy) over valid positions."""
    if shift:
        logits = logits[:, :-1]
        labels = labels[:, 1:]
    valid = labels != -100
    safe_labels = jnp.where(valid, labels, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), safe_labels
    )
    denom = jnp.maximum(valid.sum(), 1)
    loss = jnp.where(valid, ce, 0.0).sum() / denom
    acc = (
        jnp.where(valid, jnp.argmax(logits, axis=-1) == safe_labels, False).sum()
        / denom
    )
    return loss, acc
