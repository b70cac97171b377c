"""VLM finetune train step (reference train_VLM.py).

Freezing discipline mirrors the reference (train_VLM.py:406-441): the LLM
base is frozen, LoRA adapters + both packers (+ token embeddings when new
special tokens are added) train; the pretrained vision towers stay frozen by
default (reference copies stage-1/2 ViT weights in and does not unfreeze
them). Freezing = optimizer mask, not parameter surgery.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from hsenet_tpu.models.mllm import HSENetVLM
from hsenet_tpu.train.losses import masked_lm_loss
from hsenet_tpu.train.train_state import TrainState, jit_sharding_stable


def _grad_zero_dtype(dtype):
    """dtype for a frozen leaf's scalar-zero gradient placeholder.

    float leaves keep their dtype; int leaves (the int8 frozen-base
    kernels of a QLoRA-style finetune — the reference's load_in_4bit
    analog, train_VLM.py:372) and float0 (what value_and_grad(allow_int=
    True) returns for them) become f32 so every downstream consumer
    (lax.scan carries, optax.set_to_zero, optax.apply_updates) sees an
    arithmetic type.
    """
    if dtype == jax.dtypes.float0 or not jnp.issubdtype(dtype, jnp.floating):
        return jnp.float32
    return dtype


def _definitize(grads):
    """Replace float0 grads (int-dtype params under allow_int=True) with
    scalar f32 zeros — float0 supports no arithmetic by design, and the
    frozen-leaf update path only needs shape-free zeros."""
    return jax.tree.map(
        lambda g: (
            jnp.zeros((), jnp.float32)
            if getattr(g, "dtype", None) == jax.dtypes.float0
            else g
        ),
        grads,
    )


def vlm_trainable_mask(
    params,
    *,
    train_projectors: bool = True,
    train_lora: bool = True,
    train_embeddings: bool = True,
    train_towers: bool = False,
    train_seg: bool = True,
):
    """Boolean pytree mask for the optimizer (train_VLM.py:406-441 policy).

    Note: with `VLMConfig.stop_tower_gradients=True` (default) tower grads
    are structurally zero — set it False when passing train_towers=True.
    """

    def decide(path_str: str) -> bool:
        if "lora_a" in path_str or "lora_b" in path_str:
            return train_lora
        if "mm_projector" in path_str:
            return train_projectors
        if "seg_projector" in path_str or "seg_module" in path_str:
            return train_seg
        if "slice_encoder" in path_str:
            return False  # frozen BiomedCLIP trunk
        if "vision_tower" in path_str:
            return train_towers
        if "llm/embed" in path_str or path_str.endswith("embed/embedding"):
            return train_embeddings
        return False  # frozen LLM base

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    mask_leaves = [
        decide("/".join(str(getattr(p, "key", p)) for p in path))
        for path, _ in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, [bool(m) for m in mask_leaves])


def vlm_loss_fn(
    model: HSENetVLM, params, batch: Dict[str, jax.Array], dropout_rng=None
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
    kv_lens = batch["attention_mask"].sum(axis=-1).astype(jnp.int32)
    logits = model.apply(
        params,
        batch["input_ids"],
        batch.get("image"),
        batch.get("image_2d"),
        kv_lens=kv_lens,
        deterministic=dropout_rng is None,
        rngs=rngs,
    )
    loss, acc = masked_lm_loss(logits, batch["labels"])
    return loss, {"loss": loss, "token_acc": acc}


def vlm_seg_loss_fn(
    model: HSENetVLM, params, batch: Dict[str, jax.Array], dropout_rng=None
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """LM loss + dice+BCE seg loss for rows with nonzero masks
    (lamed_phi3.py:87-135 semantics; rows without masks contribute 0)."""
    from hsenet_tpu.models.segvol import binary_dice_loss, masked_bce_loss

    rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
    kv_lens = batch["attention_mask"].sum(axis=-1).astype(jnp.int32)
    logits, seg_logits = model.apply(
        params,
        batch["input_ids"],
        batch["image"],
        batch.get("image_2d"),
        kv_lens=kv_lens,
        deterministic=dropout_rng is None,
        rngs=rngs,
        method=HSENetVLM.forward_with_seg,
    )
    lm_loss, acc = masked_lm_loss(logits, batch["labels"])
    segs = batch["seg"]  # (B, 1, D, H, W), zero-filled when absent
    has_seg = (segs.sum(axis=(1, 2, 3, 4)) > 0).astype(jnp.float32)
    n_seg = jnp.maximum(has_seg.sum(), 1.0)

    def per_row(logit, target):
        return (
            binary_dice_loss(logit[None], target[None])
            + masked_bce_loss(logit[None], target[None])
        )

    per_row_losses = jax.vmap(per_row)(seg_logits, segs)
    seg_loss = jnp.sum(per_row_losses * has_seg) / n_seg
    loss = lm_loss + seg_loss
    return loss, {
        "loss": loss,
        "lm_loss": lm_loss,
        "seg_loss": seg_loss,
        "token_acc": acc,
    }


def make_vlm_eval_fn(model: HSENetVLM, seg: bool = False):
    """Held-out eval for the VLM finetune: mean token accuracy + loss over
    a validation loader (the reference evaluates during training with
    exactly this metric, train_VLM.py:177-191 compute_metrics). Returns
    `evaluate(params, loader) -> {"val_loss": ..., "val_token_acc": ...}`
    (plus val_lm_loss/val_seg_loss with seg=True). Deterministic — no
    dropout rng."""
    loss_fn = vlm_seg_loss_fn if seg else vlm_loss_fn
    keys = (
        "input_ids", "labels", "attention_mask", "image", "image_2d",
    ) + (("seg",) if seg else ())

    @jax.jit
    def one(params, batch):
        _, metrics = loss_fn(model, params, batch)
        return metrics

    def evaluate(params, loader):
        import numpy as np

        rows = []
        for batch in loader:
            dev = {
                k: jnp.asarray(v) for k, v in batch.items() if k in keys
            }
            rows.append(
                {k: float(v) for k, v in one(params, dev).items()}
            )
        if not rows:
            return {}
        return {
            f"val_{k}": float(np.mean([r[k] for r in rows]))
            for k in rows[0]
        }

    return evaluate


def make_masked_train_step(
    loss_fn,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    trainable_mask=None,
    *,
    with_rng: bool = True,
    grad_accum: int = 1,
):
    """Shared train-step tail: dp batch constraint, value_and_grad, optax
    update, trainable-only grad-norm. `loss_fn(params, batch[, dropout_rng])
    -> (loss, metrics)`; used by the plain VLM step below and the
    pipeline-parallel steps (parallel/pipeline.py).

    When `trainable_mask` is given, the grad-norm metric reduces over
    TRAINABLE grads only. This is not cosmetic: `optax.masked` never reads
    the frozen leaves' gradient VALUES (set_to_zero uses only shapes), so
    XLA dead-code-eliminates the whole frozen-weight backward — the memory
    difference between fitting and OOM for the 4B finetune on a 16 GB chip
    (the reference gets the same effect from requires_grad=False,
    train_VLM.py:406-414). A full-tree global_norm would silently force all
    8 GB of frozen grads back into existence.

    `grad_accum > 1` accumulates gradients over that many microbatches
    INSIDE the jitted step (a lax.scan over an equal split of the batch —
    one dispatch, activation memory of one microbatch), the TPU analog of
    the reference's HF `gradient_accumulation_steps` (train_VLM.py:159).
    Frozen leaves are carried as SCALAR zeros through the scan so the
    dead-code elimination above still prunes the frozen backward. Metrics
    (and the loss) are microbatch means — same mean-of-means semantics as
    the reference's Trainer. Only sound for per-sample-decomposable losses
    (the VLM LM/seg losses); NOT for the global contrastive stages."""

    def _accum_grads(params, batch, dropout_rng):
        mb = jax.tree.map(
            lambda x: x.reshape(
                (grad_accum, x.shape[0] // grad_accum) + x.shape[1:]
            ),
            batch,
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mb = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P(None, "dp"))
                ),
                mb,
            )
        mask = trainable_mask

        def prune(g):
            if mask is None:
                return g
            return jax.tree.map(
                lambda gg, m: (
                    gg if m else jnp.zeros((), _grad_zero_dtype(gg.dtype))
                ),
                g, mask,
            )

        def body(g_sum, xs):
            micro, i = xs
            args = (micro,)
            if with_rng:
                rng_i = (
                    None if dropout_rng is None
                    else jax.random.fold_in(dropout_rng, i)
                )
                args = (micro, rng_i)
            (_, metrics), g = jax.value_and_grad(
                loss_fn, has_aux=True, allow_int=True
            )(params, *args)
            return jax.tree.map(jnp.add, g_sum, prune(g)), metrics

        g0 = prune(jax.tree.map(jnp.zeros_like, params))
        g_sum, metrics_stack = jax.lax.scan(
            body, g0, (mb, jnp.arange(grad_accum))
        )
        if mask is None:
            grads = jax.tree.map(lambda g: g / grad_accum, g_sum)
        else:
            grads = jax.tree.map(
                lambda g, p, m: g / grad_accum if m else jnp.zeros_like(p),
                g_sum, params, mask,
            )
        metrics = jax.tree.map(lambda m: m.mean(), metrics_stack)
        return metrics["loss"], metrics, grads

    def train_step(state: TrainState, batch, rng=None):
        if trainable_mask is None and any(
            not jnp.issubdtype(p.dtype, jnp.floating)
            for p in jax.tree.leaves(state.params)
        ):
            # without a mask the optimizer would try to update the int8
            # base itself (and the accum scan carry would mix int8 zeros
            # with float0 placeholders) — fail loudly at trace time
            raise ValueError(
                "params contain int-dtype leaves (quantized base); pass "
                "trainable_mask= so the frozen int8 leaves are excluded "
                "from the update (see vlm_trainable_mask)"
            )
        if mesh is not None:
            from hsenet_tpu.parallel.mesh import constrain_batch

            batch = constrain_batch(batch, mesh)
        dropout_rng = (
            None
            if (rng is None or not with_rng)
            else jax.random.fold_in(rng, state.step)
        )
        if grad_accum > 1:
            loss, metrics, grads = _accum_grads(
                state.params, batch, dropout_rng
            )
        else:
            args = (batch, dropout_rng) if with_rng else (batch,)
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True, allow_int=True
            )(state.params, *args)
            grads = _definitize(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if trainable_mask is not None:
            # structural tree.map (not a leaf zip): a mask built from a
            # different param tree errors loudly instead of silently
            # truncating and reporting a wrong grad_norm
            norm_grads = jax.tree.map(
                lambda g, m: g if m else jnp.zeros((), g.dtype),
                grads, trainable_mask,
            )
        else:
            norm_grads = grads
        metrics["grad_norm"] = optax.global_norm(norm_grads)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    return jit_sharding_stable(train_step)


def make_vlm_train_step(
    model: HSENetVLM,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    seg: bool = False,
    trainable_mask=None,
    grad_accum: int = 1,
):
    """Plain (single-program) VLM finetune step; see make_masked_train_step
    for the trainable-only grad-norm rationale and grad_accum semantics."""
    loss_fn = vlm_seg_loss_fn if seg else vlm_loss_fn
    return make_masked_train_step(
        functools.partial(loss_fn, model), tx, mesh, trainable_mask,
        with_rng=True, grad_accum=grad_accum,
    )
