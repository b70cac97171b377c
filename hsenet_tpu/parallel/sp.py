"""Sequence parallelism ('sp' mesh axis) for the 3D vision towers.

The reference's attention memory caps the encoder at one GPU's worth of
tokens (2049 for a 32x256x256 CT volume, `vit.py:464-466`) and it has no
long-sequence scaling story (SURVEY.md §2.10 — DDP only). Here the token
axis itself shards over an 'sp' mesh axis: every device embeds the volume
(patch embed is <2% of tower FLOPs — replicated), keeps one contiguous
token chunk, and runs the 12-block tower with exact ring attention
(`ops/ring_attention.py` — K/V rotate around the ICI ring with ppermute,
online-softmax accumulation). LayerNorm and the MLP are per-token, so the
whole tower is local except attention; per-device attention memory and
score FLOPs drop by sp×, which is what unlocks finer patchings / larger
volumes (e.g. 512^3 at (4,16,16) patches → 65k tokens) that cannot fit a
single chip's flash-attention working set.

Composition: sp composes with dp (mesh ("dp", "sp"): batch rows sharded
over dp, each dp row's tokens sharded over its sp group). `shard_map` is
differentiable, so the stage-1 contrastive train step below backprops
through the ring (ppermute transposes to the reverse rotation) while the
text encoder, projections and the global InfoNCE run outside the ring
under plain jit — XLA still inserts the dp feature all-gather for the
global (B, B) logit matrix exactly as in `train/stage1.py`.

Dropout inside the ring: `sp_encode_tokens(dropout_rng=...)` applies
tower dropout with PER-CHUNK independent masks (the key folds the sp
axis index) — statistically sound regularization, though not bit-equal
to the dense path's mask layout, so equality tests pin rates to 0
(tests/test_sp.py). This matters for stage-2, whose slice-guided
cross-attention carries the reference's Dropout(0.1)
(`ViT3DConfig.slice_dropout_rate`). The DECODER rings (pp and the sp
LLM) still run block-internal LoRA dropout off — same policy as
pipeline.py's in-ring dropout.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hsenet_tpu.models.clip import CLIPModel
from hsenet_tpu.models.vit import ViT3D
from hsenet_tpu.parallel.pipeline import _shard_map
from hsenet_tpu.train.losses import clip_contrastive_loss, retrieval_accuracy


def _sp_size(mesh: Mesh) -> int:
    assert "sp" in mesh.axis_names, f"mesh {mesh.axis_names} has no 'sp' axis"
    return mesh.shape["sp"]


def vit3d_token_count(cfg, volume_shape) -> int:
    """Tower sequence length for a (..., D, H, W) volume: patches (+ CLS)."""
    d, h, w = volume_shape[-3:]
    p0, p1, p2 = cfg.patch_size
    assert d % p0 == 0 and h % p1 == 0 and w % p2 == 0, (
        volume_shape, cfg.patch_size
    )
    return (d // p0) * (h // p1) * (w // p2) + (1 if cfg.classification else 0)


def sp_encode_tokens(
    vit: ViT3D,
    mesh: Mesh,
    params,
    volume: jax.Array,
    slice_features: Optional[jax.Array] = None,
    dropout_rng: Optional[jax.Array] = None,
):
    """Sequence-parallel ViT3D forward -> (B, S, D) global token array.

    `params` is the ViT3D variable dict ({"params": ...}), replicated over
    the mesh; `volume` rows shard over 'dp', tokens over 'sp'. Call under
    jit (or jit the caller); differentiable.

    `dropout_rng`: enables tower dropout inside the ring with per-chunk
    independent masks (key folded by the sp axis index; see the module
    docstring for the bit-layout caveat vs the dense path).
    """
    sp = _sp_size(mesh)
    s_true = vit3d_token_count(vit.config, volume.shape)

    def _apply(p, vol, sf, rng):
        kwargs = dict(sp_axis="sp", sp_size=sp)
        if rng is None:
            kwargs["deterministic"] = True
        else:
            kwargs["deterministic"] = False
            kwargs["rngs"] = {
                "dropout": jax.random.fold_in(
                    rng, jax.lax.axis_index("sp")
                )
            }
        if sf is None:
            return vit.apply(p, vol, **kwargs)
        return vit.apply(p, vol, sf, **kwargs)

    in_specs = [P(), P("dp")]
    args = [params, volume]
    sf_arg = slice_features is not None
    if sf_arg:
        in_specs.append(P("dp"))
        args.append(slice_features)
    rng_arg = dropout_rng is not None
    if rng_arg:
        in_specs.append(P())
        args.append(dropout_rng)

    def local(p, vol, *rest):
        sf = rest[0] if sf_arg else None
        rng = rest[-1] if rng_arg else None
        return _apply(p, vol, sf, rng)

    tokens = _shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P("dp", "sp"),
        check_vma=False,
    )(*args)
    return tokens[:, :s_true]  # strip ring padding


def make_sp_encode_fn(vit: ViT3D, mesh: Mesh):
    """encode(params, volume, slice_features=None) -> (B, S, D), jitted."""

    @functools.partial(jax.jit, static_argnums=())
    def encode(params, volume, slice_features=None):
        return sp_encode_tokens(vit, mesh, params, volume, slice_features)

    return encode


def make_sp_decoder_hidden_fn(cfg, dtype, mesh: Mesh, *, remat: bool = False,
                              block_q: Optional[int] = None):
    """(decoder_params, inputs_embeds, kv_lens) -> (B, S, D) hidden states
    (post final RMSNorm) with the token axis sharded over 'sp' and the
    causal attention run as a K/V ring — the sequence-parallel core shared
    by the bare causal LM and the VLM finetune step. kv_lens are per-row
    GLOBAL lengths; the tail ring-padding is stripped before returning.
    Block-internal (LoRA) dropout runs off inside the sp region (same
    policy as pipeline.py's in-ring dropout)."""
    from hsenet_tpu.models.phi3 import Phi3Decoder
    from hsenet_tpu.ops.ring_attention import pad_to_multiple

    sp = _sp_size(mesh)
    decoder = Phi3Decoder(cfg, dtype=dtype, remat=remat)

    def hidden_fn(decoder_params, embeds, kv_lens):
        b, s, d = embeds.shape
        padded = pad_to_multiple(embeds, sp, axis=1)

        def local(p, x, lens):
            # sp_global_len = the TRUE sequence length: the LongRoPE
            # short/long factor choice must match the dense path (ring
            # padding would flip it right at original_max_position; the
            # pad tokens' rope values are never used — they're masked as
            # keys by kv_lens and discarded as queries)
            h, _ = decoder.apply(
                {"params": p}, x, kv_lens=lens, deterministic=True,
                sp_axis="sp", sp_size=sp, sp_global_len=s,
                sp_block_q=block_q,
            )
            return h

        hidden = _shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P("dp", "sp"), P("dp")),
            out_specs=P("dp", "sp"),
            check_vma=False,
        )(decoder_params, padded, kv_lens)
        return hidden[:, :s]

    return hidden_fn


def make_sp_causal_lm_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    *,
    remat: bool = False,
    trainable_mask=None,
    sp_block_q: Optional[int] = None,
):
    """Causal-LM train step with the decoder sequence-parallel over 'sp'.

    Same batch contract as train/vlm.py::make_vlm_train_step (input_ids /
    labels / attention_mask). Embedding lookup and the LM head run outside
    the ring (replicated params, dp-sharded rows); the decoder stack runs
    inside shard_map with ring attention; backward rides shard_map AD.
    """
    from hsenet_tpu.models.phi3 import Phi3ForCausalLM
    from hsenet_tpu.train.losses import masked_lm_loss
    from hsenet_tpu.train.vlm import make_masked_train_step

    hidden_fn = make_sp_decoder_hidden_fn(
        model.config, model.dtype, mesh, remat=remat, block_q=sp_block_q
    )

    def loss_fn(params, batch):
        kv_lens = batch["attention_mask"].sum(axis=-1).astype(jnp.int32)
        embeds = model.apply(
            params, batch["input_ids"], method=Phi3ForCausalLM.embed_tokens
        )
        hidden = hidden_fn(params["params"]["decoder"], embeds, kv_lens)
        logits = model.apply(
            params, hidden, method=Phi3ForCausalLM.compute_logits
        )
        loss, acc = masked_lm_loss(logits, batch["labels"])
        return loss, {"loss": loss, "token_acc": acc}

    return make_masked_train_step(
        loss_fn, tx, mesh, trainable_mask, with_rng=False
    )


def make_sp_vlm_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    *,
    remat: bool = False,
    trainable_mask=None,
    sp_block_q: Optional[int] = None,
):
    """VLM finetune step with the LLM decoder sequence-parallel over 'sp'.

    Vision towers + packers + BOS splice run outside the ring (dp-sharded
    rows, replicated params — they are ~90M of a ~4B model); the spliced
    embedding sequence then shards over 'sp' through the causal ring.
    Same batch contract as train/vlm.py::make_vlm_train_step; equality vs
    the plain step is tested at dropout 0 (tests/test_sp.py).
    """
    from hsenet_tpu.models.mllm import HSENetVLM
    from hsenet_tpu.train.losses import masked_lm_loss
    from hsenet_tpu.train.vlm import make_masked_train_step

    hidden_fn = make_sp_decoder_hidden_fn(
        model.config.llm, model.dtype, mesh, remat=remat, block_q=sp_block_q
    )

    def loss_fn(params, batch, dropout_rng):
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        kv_lens = batch["attention_mask"].sum(axis=-1).astype(jnp.int32)
        embeds = model.apply(
            params,
            batch["input_ids"],
            batch.get("image"),
            batch.get("image_2d"),
            deterministic=dropout_rng is None,
            rngs=rngs,
            method=HSENetVLM.multimodal_embeds,
        )
        hidden = hidden_fn(params["params"]["llm"]["decoder"], embeds, kv_lens)
        logits = model.apply(
            params, hidden, method=lambda m, h: m.llm.compute_logits(h)
        )
        loss, acc = masked_lm_loss(logits, batch["labels"])
        return loss, {"loss": loss, "token_acc": acc}

    return make_masked_train_step(
        loss_fn, tx, mesh, trainable_mask, with_rng=True
    )


def make_sp_stage1_train_step(
    model: CLIPModel,
    tx: optax.GradientTransformation,
    mesh: Mesh,
):
    """Stage-1 CLIP train step with the vision tower sequence-parallel.

    Same contract as train/stage1.py::make_stage1_train_step — the vision
    encode runs inside shard_map over ("dp", "sp") with ring attention;
    CLS pooling, the vision projection, the text encoder and the global
    contrastive loss run outside under jit (batch dp-sharded, sp members
    share each dp row's work). Gradients flow through the ring via
    shard_map AD.
    """
    vit = ViT3D(model.config.vision, dtype=model.dtype, remat=model.remat)

    def loss_fn(
        params, batch: Dict[str, jax.Array], dropout_rng
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        tokens = sp_encode_tokens(
            vit,
            mesh,
            {"params": params["params"]["vision_encoder"]},
            batch["image"],
        )
        img = model.apply(
            params, tokens[:, 0], method=lambda m, f: m.mm_vision_proj(f)
        )
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt, _ = model.apply(
            params,
            batch["input_ids"],
            batch.get("attention_mask"),
            deterministic=dropout_rng is None,
            rngs=rngs,
            method=CLIPModel.encode_text,
        )
        scale = model.apply(params, method=CLIPModel.scale)
        loss, logits_i, _ = clip_contrastive_loss(img, txt, scale)
        metrics = {
            "loss": loss,
            "retrieval_acc": retrieval_accuracy(logits_i),
            "logit_scale": scale,
        }
        return loss, metrics

    # the update tail (dp batch constraint, value_and_grad, optax update,
    # grad norm, jit+donate) is shared with the plain stage-1 step
    from hsenet_tpu.train.stage1 import make_stage1_train_step

    return make_stage1_train_step(model, tx, mesh, loss_fn=loss_fn)


def make_sp_stage2_train_step(
    student: CLIPModel,
    teacher: CLIPModel,
    cfg,
    tx: optax.GradientTransformation,
    teacher_params,
    mesh: Mesh,
    cached_teacher: bool = False,
):
    """Stage-2 (2E3) train step with BOTH vision towers sequence-parallel.

    Same contract as train/stage2.py::make_stage2_train_step. The student's
    slice-guided tower AND the frozen stage-1 teacher tower run inside
    shard_map over ("dp", "sp") with ring attention (the teacher is the
    same token count, so it gains the same memory/FLOP sharding); CLS
    pooling, projections, both text encoders and the contrastive +
    relation losses run outside under jit. With `cached_teacher=True` the
    teacher forward is absent and only the student tower rides the ring.
    """
    from hsenet_tpu.train.losses import relation_regulation_loss, relation_weight
    from hsenet_tpu.train.stage2 import make_stage2_train_step

    s_vit = ViT3D(student.config.vision, dtype=student.dtype,
                  remat=student.remat)
    t_vit = ViT3D(teacher.config.vision, dtype=teacher.dtype,
                  remat=teacher.remat)

    def _img_feats(model, vit, params, volume, slices, dropout_rng=None):
        tokens = sp_encode_tokens(
            vit, mesh, {"params": params["params"]["vision_encoder"]},
            volume, slices, dropout_rng=dropout_rng,
        )
        f = model.apply(
            params, tokens[:, 0], method=lambda m, x: m.mm_vision_proj(x)
        )
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def _student_terms(params, batch, dropout_rng):
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        # the student tower rides the ring WITH dropout (per-chunk masks):
        # stage-2's slice-guided attention carries the reference's
        # Dropout(0.1), which must not silently vanish under --sp
        s_img = _img_feats(
            student, s_vit, params, batch["image"], batch["image_2d"],
            dropout_rng=dropout_rng,
        )
        s_txt, _ = student.apply(
            params, batch["input_ids"], batch.get("attention_mask"),
            deterministic=dropout_rng is None, rngs=rngs,
            method=CLIPModel.encode_text,
        )
        s_scale = student.apply(params, method=CLIPModel.scale)
        return clip_contrastive_loss(s_img, s_txt, s_scale)

    def _finish(loss_cl, s_logits_i, s_logits_t, t_logits_i, t_logits_t,
                step):
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

    def loss_fn(params, tparams, batch, step, dropout_rng):
        tparams = jax.lax.stop_gradient(tparams)
        t_img = _img_feats(teacher, t_vit, tparams, batch["image"], None)
        t_txt, _ = teacher.apply(
            tparams, batch["input_ids"], batch.get("attention_mask"),
            deterministic=True, method=CLIPModel.encode_text,
        )
        t_scale = teacher.apply(tparams, method=CLIPModel.scale)
        _, t_logits_i, t_logits_t = clip_contrastive_loss(
            t_img, t_txt, t_scale
        )
        loss_cl, s_logits_i, s_logits_t = _student_terms(
            params, batch, dropout_rng
        )
        return _finish(
            loss_cl, s_logits_i, s_logits_t, t_logits_i, t_logits_t, step
        )

    def loss_fn_cached(teacher_scale, params, batch, step, dropout_rng):
        _, t_logits_i, t_logits_t = clip_contrastive_loss(
            batch["teacher_image_features"],
            batch["teacher_text_features"],
            teacher_scale,
        )
        loss_cl, s_logits_i, s_logits_t = _student_terms(
            params, batch, dropout_rng
        )
        return _finish(
            loss_cl, s_logits_i, s_logits_t, t_logits_i, t_logits_t, step
        )

    return make_stage2_train_step(
        student, teacher, cfg, tx, teacher_params, mesh,
        cached_teacher=cached_teacher,
        loss_fn=loss_fn, loss_fn_cached=loss_fn_cached,
    )


def make_sp_teacher_embed_fn(teacher: CLIPModel, teacher_params, mesh: Mesh):
    """Sequence-parallel analog of `train/stage2.py::make_teacher_embed_fn`
    for the cached-teacher cache FILL: at the token counts that motivate
    --sp, the dense teacher forward would not fit one chip — the fill must
    ride the same ring the train step does."""
    t_vit = ViT3D(teacher.config.vision, dtype=teacher.dtype,
                  remat=teacher.remat)
    teacher_params = jax.device_put(
        teacher_params, NamedSharding(mesh, P())
    )

    @jax.jit
    def embed(tparams, image, input_ids, attention_mask):
        tokens = sp_encode_tokens(
            t_vit, mesh,
            {"params": tparams["params"]["vision_encoder"]}, image,
        )
        img = teacher.apply(
            tparams, tokens[:, 0], method=lambda m, x: m.mm_vision_proj(x)
        )
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt, _ = teacher.apply(
            tparams, input_ids, attention_mask, deterministic=True,
            method=CLIPModel.encode_text,
        )
        return img, txt

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
