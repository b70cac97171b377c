"""Stage-2 (2E3) CLIP training step with frozen stage-1 teacher.

Reference `M3DCLIP_stage2.forward` (CLIP_stage2.py:119-169): teacher CLIP
runs under inference mode on the same batch; the student's loss is its own
contrastive loss plus a decaying MSE between teacher and student logit
matrices. Functionally: two parameter trees for the same `CLIPModel` module;
the teacher tree is closed over / stop-gradiented — no module surgery.

Cached-teacher mode (round 3, beyond the reference): the teacher
embeddings depend only on the (static) inputs and the frozen teacher, yet
the reference recomputes the full teacher forward every step
(CLIP_stage2.py:124-128) — nearly a third of the stage-2 step. With
`cached_teacher=True` the train step takes the teacher image/text features
from the batch instead; `TeacherCache` fills them once per distinct batch
(first epoch) and serves host-cached copies afterwards. The teacher's
logit_scale is a single frozen scalar, read from the teacher params at
step-construction time. Equality with the recompute mode is tested
(tests/test_clip.py)."""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hsenet_tpu.configs import CLIPConfig
from hsenet_tpu.models.clip import CLIPModel
from hsenet_tpu.train.losses import (
    clip_contrastive_loss,
    relation_regulation_loss,
    relation_weight,
    retrieval_accuracy,
)
from hsenet_tpu.train.train_state import TrainState, jit_sharding_stable


def stage2_loss_fn(
    student: CLIPModel,
    teacher: CLIPModel,
    cfg: CLIPConfig,
    params,
    teacher_params,
    batch: Dict[str, jax.Array],
    step: jax.Array,
    dropout_rng=None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    # teacher pass (frozen, no slice features: the teacher is stage-1)
    t_img, t_txt, t_scale = teacher.apply(
        jax.lax.stop_gradient(teacher_params),
        batch["image"],
        batch["input_ids"],
        batch.get("attention_mask"),
        deterministic=True,
    )
    _, t_logits_i, t_logits_t = clip_contrastive_loss(t_img, t_txt, t_scale)

    rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
    s_img, s_txt, s_scale = student.apply(
        params,
        batch["image"],
        batch["input_ids"],
        batch.get("attention_mask"),
        batch["image_2d"],
        deterministic=dropout_rng is None,
        rngs=rngs,
    )
    loss_cl, s_logits_i, s_logits_t = clip_contrastive_loss(
        s_img, s_txt, s_scale
    )
    loss_rel = relation_regulation_loss(
        t_logits_i, t_logits_t, s_logits_i, s_logits_t
    )
    w = relation_weight(
        step, cfg.relation_max_weighted_step, cfg.relation_base_weight
    )
    loss = loss_cl + w * loss_rel
    metrics = {
        "loss": loss,
        "loss_cl": loss_cl,
        "loss_relation": loss_rel,
        "relation_weight": w,
        "retrieval_acc": retrieval_accuracy(s_logits_i),
    }
    return loss, metrics


def stage2_loss_fn_cached(
    student: CLIPModel,
    cfg: CLIPConfig,
    teacher_scale,
    params,
    batch: Dict[str, jax.Array],
    step: jax.Array,
    dropout_rng=None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Like `stage2_loss_fn`, but the frozen-teacher features arrive
    precomputed in the batch (`teacher_image_features` /
    `teacher_text_features`) — no teacher forward in the step."""
    _, t_logits_i, t_logits_t = clip_contrastive_loss(
        batch["teacher_image_features"],
        batch["teacher_text_features"],
        teacher_scale,
    )
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
    s_img, s_txt, s_scale = student.apply(
        params,
        batch["image"],
        batch["input_ids"],
        batch.get("attention_mask"),
        batch["image_2d"],
        deterministic=dropout_rng is None,
        rngs=rngs,
    )
    loss_cl, s_logits_i, s_logits_t = clip_contrastive_loss(
        s_img, s_txt, s_scale
    )
    loss_rel = relation_regulation_loss(
        t_logits_i, t_logits_t, s_logits_i, s_logits_t
    )
    w = relation_weight(
        step, cfg.relation_max_weighted_step, cfg.relation_base_weight
    )
    loss = loss_cl + w * loss_rel
    metrics = {
        "loss": loss,
        "loss_cl": loss_cl,
        "loss_relation": loss_rel,
        "relation_weight": w,
        "retrieval_acc": retrieval_accuracy(s_logits_i),
    }
    return loss, metrics


def make_teacher_embed_fn(
    teacher: CLIPModel, teacher_params, mesh: Optional[Mesh] = None
):
    """Jitted `batch -> {teacher_image_features, teacher_text_features}`.

    The teacher enters as a runtime argument (not HLO constants); the
    returned features are what `cached_teacher=True` steps expect in the
    batch."""
    if mesh is not None:
        teacher_params = jax.device_put(
            teacher_params, NamedSharding(mesh, P())
        )

    @jax.jit
    def embed(tparams, image, input_ids, attention_mask):
        t_img, t_txt, _ = teacher.apply(
            tparams, image, input_ids, attention_mask, deterministic=True
        )
        return t_img, t_txt

    def embed_batch(batch):
        t_img, t_txt = embed(
            teacher_params, batch["image"], batch["input_ids"],
            batch.get("attention_mask"),
        )
        return {
            "teacher_image_features": t_img,
            "teacher_text_features": t_txt,
        }

    return embed_batch


class TeacherCache:
    """Host-memory cache of frozen-teacher embeddings, keyed PER SAMPLE.

    First sight of a sample pays the teacher forward (as part of its
    batch); every later epoch serves the stored features (the reference
    pays the forward every step, CLIP_stage2.py:124-128). Per-sample
    keying matters: shuffling loaders recombine the same samples into
    different batches each epoch, so a whole-batch key would never hit.
    The key hashes input_ids + attention_mask + image bytes (everything
    the teacher forward consumes) plus their shapes; hashing costs
    ~memcpy speed, negligible next to a 100M-param forward."""

    def __init__(self, embed_fn):
        self._embed_fn = embed_fn
        self._store: Dict[bytes, object] = {}
        self.hits = 0
        self.misses = 0

    @staticmethod
    def _keys(batch):
        import hashlib

        import numpy as np

        ids = np.asarray(batch["input_ids"])
        img = np.asarray(batch["image"])
        mask = batch.get("attention_mask")
        mask = np.asarray(mask) if mask is not None else None
        keys = []
        for i in range(len(ids)):
            h = hashlib.sha1()
            h.update(repr((ids[i].shape, img[i].shape)).encode())
            h.update(ids[i].tobytes())
            if mask is not None:
                h.update(mask[i].tobytes())
            h.update(img[i].tobytes())
            keys.append(h.digest())
        return keys

    def attach(self, batch):
        """Return `batch` merged with (possibly cached) teacher features."""
        import numpy as np

        keys = self._keys(batch)
        missing = [k for k in keys if k not in self._store]
        if missing:
            # one teacher forward for the whole batch, stored per sample
            self.misses += len(missing)
            self.hits += len(keys) - len(missing)
            feats = jax.device_get(self._embed_fn(batch))
            for i, k in enumerate(keys):
                self._store[k] = {
                    name: np.asarray(v[i]) for name, v in feats.items()
                }
            return {**batch, **feats}
        self.hits += len(keys)
        rows = [self._store[k] for k in keys]
        stacked = {
            name: np.stack([r[name] for r in rows])
            for name in rows[0]
        }
        return {**batch, **stacked}


def make_stage2_train_step(
    student: CLIPModel,
    teacher: CLIPModel,
    cfg: CLIPConfig,
    tx: optax.GradientTransformation,
    teacher_params,
    mesh: Optional[Mesh] = None,
    cached_teacher: bool = False,
    loss_fn=None,
    loss_fn_cached=None,
):
    """`cached_teacher=True` drops the in-step teacher forward; batches must
    carry `teacher_image_features`/`teacher_text_features` (see
    `TeacherCache`). The teacher's frozen logit_scale is read from
    `teacher_params` here.

    `loss_fn(params, tparams, batch, step, rng)` / `loss_fn_cached(
    teacher_scale, params, batch, step, rng)` override the default losses —
    the hook the sequence-parallel step (parallel/sp.py) uses to swap in
    ring-attention tower encodes while sharing this update tail."""
    if cached_teacher:
        import numpy as np

        teacher_scale = jnp.asarray(
            np.asarray(
                jax.device_get(teacher_params["params"]["logit_scale"])
            ),
            jnp.float32,
        )
        # match CLIPModel.scale() (models/clip.py): the reference's quirk
        # multiplies the RAW log-init value; scale_is_log=True applies exp
        if teacher.config.scale_is_log:
            teacher_scale = jnp.exp(teacher_scale)

        def train_step_cached(state: TrainState, batch, rng):
            dropout_rng = jax.random.fold_in(rng, state.step)
            if mesh is not None:
                batch = jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(
                        x, NamedSharding(mesh, P("dp"))
                    ),
                    batch,
                )
            fn = loss_fn_cached or functools.partial(
                stage2_loss_fn_cached, student, cfg
            )
            (loss, metrics), grads = jax.value_and_grad(
                functools.partial(fn, teacher_scale),
                has_aux=True,
            )(state.params, batch, state.step, dropout_rng)
            updates, opt_state = tx.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            metrics["grad_norm"] = optax.global_norm(grads)
            return (
                TrainState(
                    step=state.step + 1, params=params, opt_state=opt_state
                ),
                metrics,
            )

        return jit_sharding_stable(train_step_cached)

    def train_step(state: TrainState, tparams, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        if mesh is not None:
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P("dp"))
                ),
                batch,
            )
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn or functools.partial(stage2_loss_fn, student, teacher, cfg),
            has_aux=True,
        )(state.params, tparams, batch, state.step, dropout_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    jitted = jit_sharding_stable(train_step)

    # The frozen teacher enters as a RUNTIME argument, not a closure:
    # closing over the ~200M-param tree bakes it into the HLO as constants —
    # bloated executable, re-trace on any teacher change, and an
    # oversized remote-compile payload at production shapes.
    if mesh is not None:
        teacher_params = jax.device_put(
            teacher_params, NamedSharding(mesh, P())
        )

    def step_with_teacher(state: TrainState, batch, rng):
        return jitted(state, teacher_params, batch, rng)

    return step_with_teacher
