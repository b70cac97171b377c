"""CLIP stage-1/2 models, losses, and distributed train steps on the CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hsenet_tpu.configs import BertConfig, CLIPConfig, MeshConfig, TrainConfig, ViT3DConfig
from hsenet_tpu.models.clip import CLIPModel
from hsenet_tpu.parallel.mesh import create_mesh, shard_batch
from hsenet_tpu.train.losses import (
    clip_contrastive_loss,
    masked_lm_loss,
    relation_weight,
)
from hsenet_tpu.train.stage1 import make_stage1_train_step
from hsenet_tpu.train.stage2 import make_stage2_train_step
from hsenet_tpu.train.train_state import TrainState, make_optimizer

TINY_VIT = ViT3DConfig(
    image_size=(8, 16, 16),
    patch_size=(2, 8, 8),
    hidden_size=32,
    mlp_dim=64,
    num_layers=2,
    num_heads=4,
    num_slices=4,
    slice_feature_dim=32,
)
TINY_BERT = BertConfig(
    vocab_size=64,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
    max_position_embeddings=32,
)
TINY_CLIP = CLIPConfig(vision=TINY_VIT, text=TINY_BERT, projection_dim=32)


def _batch(b=8, with_2d=False):
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.random((b, 1, 8, 16, 16), np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 64, (b, 12))),
        "attention_mask": jnp.ones((b, 12), jnp.int32),
    }
    if with_2d:
        batch["image_2d"] = jnp.asarray(rng.random((b, 4, 32), np.float32))
    return batch


def test_contrastive_loss_values():
    """Hand-computable case: identity logits."""
    feats = jnp.eye(4)
    loss, logits_i, logits_t = clip_contrastive_loss(feats, feats, jnp.asarray(1.0))
    # logits = I; CE of softmax over [1, 0, 0, 0] rows
    row = jnp.array([1.0, 0, 0, 0])
    expected = -jax.nn.log_softmax(row)[0]
    np.testing.assert_allclose(loss, expected, rtol=1e-6)
    np.testing.assert_allclose(logits_i, jnp.eye(4), rtol=1e-6)


def test_relation_weight_schedule():
    assert float(relation_weight(jnp.asarray(0))) == pytest.approx(0.1)
    assert float(relation_weight(jnp.asarray(2500))) == pytest.approx(0.05)
    assert float(relation_weight(jnp.asarray(5000))) == 0.0
    assert float(relation_weight(jnp.asarray(99999))) == 0.0


def test_masked_lm_loss_ignores_minus_100():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.array([[-100, 2, 3, -100]])
    loss, acc = masked_lm_loss(logits, labels)
    # uniform logits -> CE = log(8) on the 2 valid (shifted) positions
    np.testing.assert_allclose(loss, np.log(8), rtol=1e-6)


def test_clip_forward_shapes(key):
    model = CLIPModel(TINY_CLIP)
    batch = _batch(4)
    params = model.init(
        key, batch["image"], batch["input_ids"], batch["attention_mask"]
    )
    img, txt, scale = model.apply(
        params, batch["image"], batch["input_ids"], batch["attention_mask"]
    )
    assert img.shape == (4, 32) and txt.shape == (4, 32)
    np.testing.assert_allclose(jnp.linalg.norm(img, axis=-1), 1.0, rtol=1e-5)
    # raw (non-exponentiated) logit scale, reference quirk
    np.testing.assert_allclose(float(scale), np.log(1 / 0.07), rtol=1e-6)


def test_stage1_train_step_on_mesh(key):
    mesh = create_mesh(MeshConfig(dp=8, tp=1))
    model = CLIPModel(TINY_CLIP)
    batch = _batch(8)
    params = model.init(
        key, batch["image"], batch["input_ids"], batch["attention_mask"]
    )
    tx = make_optimizer(TrainConfig(total_steps=100, learning_rate=1e-3))
    state = TrainState.create(params, tx)
    step = make_stage1_train_step(model, tx, mesh)
    batch = shard_batch(batch, mesh)

    losses = []
    for i in range(3):
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 3
    assert losses[2] < losses[0]  # learns on a fixed batch
    assert np.isfinite(losses).all()


def test_stage2_train_step_with_teacher(key):
    mesh = create_mesh(MeshConfig(dp=8, tp=1))
    s_cfg = dataclasses.replace(
        TINY_CLIP, vision=dataclasses.replace(TINY_VIT, slice_guided=True)
    )
    student = CLIPModel(s_cfg)
    teacher = CLIPModel(TINY_CLIP)
    batch = _batch(8, with_2d=True)
    sp = student.init(
        key,
        batch["image"],
        batch["input_ids"],
        batch["attention_mask"],
        batch["image_2d"],
    )
    tp_ = teacher.init(
        key, batch["image"], batch["input_ids"], batch["attention_mask"]
    )
    tx = make_optimizer(TrainConfig(total_steps=100, learning_rate=1e-3))
    state = TrainState.create(sp, tx)
    step = make_stage2_train_step(student, teacher, s_cfg, tx, tp_, mesh)
    batch = shard_batch(batch, mesh)

    state, m0 = step(state, batch, key)
    state, m1 = step(state, batch, key)
    assert np.isfinite(float(m1["loss"]))
    assert float(m0["relation_weight"]) == pytest.approx(0.1)
    assert float(m0["loss_relation"]) >= 0.0
    # teacher params untouched by construction (separate tree)


def test_global_contrastive_equals_single_device(key):
    """The dp-sharded loss must equal the unsharded global-batch loss."""
    model = CLIPModel(TINY_CLIP)
    batch = _batch(8)
    params = model.init(
        key, batch["image"], batch["input_ids"], batch["attention_mask"]
    )

    def loss(p, b):
        img, txt, scale = model.apply(
            p, b["image"], b["input_ids"], b["attention_mask"]
        )
        return clip_contrastive_loss(img, txt, scale)[0]

    local = jax.jit(loss)(params, batch)

    mesh = create_mesh(MeshConfig(dp=8, tp=1))
    sharded = shard_batch(batch, mesh)
    dist = jax.jit(loss)(params, sharded)
    np.testing.assert_allclose(float(local), float(dist), rtol=1e-5)


def test_stage2_cached_teacher_equals_recompute(key):
    """Cached-teacher mode: identical loss/metrics/updated params vs the
    recompute mode on the same batch, and TeacherCache actually caches
    (one miss, then hits)."""
    from hsenet_tpu.train.stage2 import TeacherCache, make_teacher_embed_fn

    mesh = create_mesh(MeshConfig(dp=8, tp=1))
    s_cfg = dataclasses.replace(
        TINY_CLIP, vision=dataclasses.replace(TINY_VIT, slice_guided=True)
    )
    student = CLIPModel(s_cfg)
    teacher = CLIPModel(TINY_CLIP)
    batch = _batch(8, with_2d=True)
    sp = student.init(
        key, batch["image"], batch["input_ids"], batch["attention_mask"],
        batch["image_2d"],
    )
    tp_ = teacher.init(
        key, batch["image"], batch["input_ids"], batch["attention_mask"]
    )
    tx = make_optimizer(TrainConfig(total_steps=100, learning_rate=1e-3))

    # the train step donates its state; give each mode its own copy
    sp2 = jax.tree.map(jnp.array, sp)
    ref_step = make_stage2_train_step(student, teacher, s_cfg, tx, tp_, mesh)
    ref_state, ref_m = ref_step(
        TrainState.create(sp, tx), shard_batch(batch, mesh), key
    )

    cache = TeacherCache(make_teacher_embed_fn(teacher, tp_, mesh))
    cached_step = make_stage2_train_step(
        student, teacher, s_cfg, tx, tp_, mesh, cached_teacher=True
    )
    cbatch = cache.attach(batch)
    assert (cache.misses, cache.hits) == (8, 0)
    cache.attach(batch)  # same samples -> served from cache
    assert (cache.misses, cache.hits) == (8, 8)
    # per-sample keying: the SAME samples recombined into a different
    # batch order (a reshuffled epoch) still hit
    perm = np.asarray([3, 1, 0, 2, 7, 6, 5, 4])
    shuffled = {k: (np.asarray(v)[perm] if hasattr(v, "shape") else v)
                for k, v in batch.items()}
    re_feats = cache.attach(shuffled)
    assert (cache.misses, cache.hits) == (8, 16)
    np.testing.assert_allclose(
        re_feats["teacher_image_features"],
        np.asarray(cbatch["teacher_image_features"])[perm],
        atol=1e-6,
    )
    c_state, c_m = cached_step(
        TrainState.create(sp2, tx), shard_batch(cbatch, mesh), key
    )

    np.testing.assert_allclose(
        float(c_m["loss"]), float(ref_m["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(c_m["loss_relation"]), float(ref_m["loss_relation"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree.leaves(c_state.params), jax.tree.leaves(ref_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        )


def test_stage2_cached_teacher_respects_scale_is_log(key):
    """With scale_is_log=True the cached path must exp() the teacher's
    logit_scale exactly like CLIPModel.scale() in the recompute path."""
    from hsenet_tpu.train.stage2 import TeacherCache, make_teacher_embed_fn

    mesh = create_mesh(MeshConfig(dp=8, tp=1))
    t_cfg = dataclasses.replace(TINY_CLIP, scale_is_log=True)
    s_cfg = dataclasses.replace(
        t_cfg, vision=dataclasses.replace(TINY_VIT, slice_guided=True)
    )
    student = CLIPModel(s_cfg)
    teacher = CLIPModel(t_cfg)
    batch = _batch(8, with_2d=True)
    sp = student.init(
        key, batch["image"], batch["input_ids"], batch["attention_mask"],
        batch["image_2d"],
    )
    tp_ = teacher.init(
        key, batch["image"], batch["input_ids"], batch["attention_mask"]
    )
    tx = make_optimizer(TrainConfig(total_steps=100, learning_rate=1e-3))
    sp2 = jax.tree.map(jnp.array, sp)

    ref_step = make_stage2_train_step(student, teacher, s_cfg, tx, tp_, mesh)
    _, ref_m = ref_step(
        TrainState.create(sp, tx), shard_batch(batch, mesh), key
    )
    cache = TeacherCache(make_teacher_embed_fn(teacher, tp_, mesh))
    cached_step = make_stage2_train_step(
        student, teacher, s_cfg, tx, tp_, mesh, cached_teacher=True
    )
    _, c_m = cached_step(
        TrainState.create(sp2, tx), shard_batch(cache.attach(batch), mesh),
        key,
    )
    np.testing.assert_allclose(
        float(c_m["loss_relation"]), float(ref_m["loss_relation"]), rtol=1e-4
    )
