"""VLM assembly: splice semantics, train step, greedy generation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsenet_tpu.configs import (
    LoRAConfig,
    MeshConfig,
    PackerConfig,
    Phi3Config,
    TrainConfig,
    ViT3DConfig,
    VLMConfig,
)
from hsenet_tpu.eval.generate import make_greedy_generate
from hsenet_tpu.models.mllm import HSENetVLM, splice_image_embeds
from hsenet_tpu.parallel.mesh import create_mesh, shard_batch
from hsenet_tpu.train.train_state import TrainState, make_optimizer
from hsenet_tpu.train.vlm import make_vlm_train_step, vlm_trainable_mask

TINY_VIT = ViT3DConfig(
    image_size=(4, 16, 16),
    patch_size=(2, 8, 8),
    hidden_size=16,
    mlp_dim=32,
    num_layers=1,
    num_heads=2,
    num_slices=2,
    slice_feature_dim=16,
)
TINY_PACKER = PackerConfig(
    grid=(2, 2, 2), kernel=(1, 2, 2), in_dim=16, out_dim=32, dropout_rate=0.0
)
TINY_LLM = Phi3Config(
    vocab_size=64,
    hidden_size=32,
    intermediate_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    tie_word_embeddings=True,
    lora=LoRAConfig(rank=2, alpha=4, dropout_rate=0.0),
)
TINY_VLM = VLMConfig(vision=TINY_VIT, packer=TINY_PACKER, llm=TINY_LLM)
N_IMG = TINY_VLM.num_image_tokens  # 2 towers x 2 tokens... (2,2,2)/(1,2,2)=2*1*1...


def _batch(b=2, seq=24):
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 64, (b, seq))
    ids[:, 0] = 1  # BOS
    labels = ids.copy().astype(np.int64)
    labels[:, : N_IMG + 4] = -100  # question+image masked
    mask = np.ones((b, seq), np.int64)
    if b > 1:
        mask[1, seq - 4 :] = 0
        labels[1, seq - 4 :] = -100
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "attention_mask": jnp.asarray(mask),
        "image": jnp.asarray(rng.random((b, 1, 4, 16, 16), np.float32)),
        "image_2d": jnp.asarray(rng.random((b, 2, 16), np.float32)),
    }


def test_num_image_tokens():
    assert TINY_PACKER.proj_out_num == 2  # out_grid (2,1,1)
    assert N_IMG == 4  # dual towers
    prod = VLMConfig()
    assert prod.num_image_tokens == 256  # 2 x 128 (train_VLM.py:446-453)


def test_splice_places_image_after_bos(key):
    embeds = jnp.arange(2 * 10 * 4, dtype=jnp.float32).reshape(2, 10, 4)
    img = -jnp.ones((2, 3, 4))
    out = splice_image_embeds(embeds, img)
    assert out.shape == embeds.shape
    np.testing.assert_array_equal(out[:, 0], embeds[:, 0])  # BOS kept
    np.testing.assert_array_equal(out[:, 1:4], img)  # image block
    np.testing.assert_array_equal(out[:, 4:], embeds[:, 4:])  # tail kept


def test_vlm_forward_and_masked_loss(key):
    model = HSENetVLM(TINY_VLM, dtype=jnp.float32)
    batch = _batch()
    params = model.init(
        key, batch["input_ids"], batch["image"], batch["image_2d"]
    )
    logits = model.apply(
        params, batch["input_ids"], batch["image"], batch["image_2d"]
    )
    assert logits.shape == (2, 24, 64)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_vlm_image_changes_answer_logits(key):
    model = HSENetVLM(TINY_VLM, dtype=jnp.float32)
    batch = _batch()
    params = model.init(
        key, batch["input_ids"], batch["image"], batch["image_2d"]
    )
    l1 = model.apply(
        params, batch["input_ids"], batch["image"], batch["image_2d"]
    )
    l2 = model.apply(
        params, batch["input_ids"], batch["image"] * 0.5, batch["image_2d"]
    )
    assert not np.allclose(l1, l2)


def test_vlm_trainable_mask_policy(key):
    model = HSENetVLM(TINY_VLM, dtype=jnp.float32)
    batch = _batch()
    params = model.init(
        key, batch["input_ids"], batch["image"], batch["image_2d"]
    )
    mask = vlm_trainable_mask(params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, trainable in flat:
        s = "/".join(str(getattr(p, "key", p)) for p in path)
        if "lora" in s or "mm_projector" in s:
            assert trainable, s
        elif "vision_tower" in s:
            assert not trainable, s
        elif "qkv_proj/kernel" in s or "down_proj/kernel" in s:
            assert not trainable, s


def test_vlm_train_step_only_updates_trainables(key):
    mesh = create_mesh(MeshConfig(dp=2, tp=1))
    model = HSENetVLM(TINY_VLM, dtype=jnp.float32)
    batch = _batch()
    params = model.init(
        key, batch["input_ids"], batch["image"], batch["image_2d"]
    )
    mask = vlm_trainable_mask(params)
    tx = make_optimizer(
        TrainConfig(total_steps=10, learning_rate=1e-2), trainable_mask=mask
    )
    # snapshot to host: the train step donates the state buffers
    params_before = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    state = TrainState.create(params, tx)
    step = make_vlm_train_step(model, tx, mesh, trainable_mask=mask)
    batch = shard_batch(batch, mesh)
    new_state, metrics = step(state, batch, key)
    new_state, metrics = step(new_state, batch, key)  # step 1 has lr=0 (warmup)
    assert np.isfinite(float(metrics["loss"]))

    def changed(a, b):
        return not np.allclose(np.asarray(a), np.asarray(b))

    flat_old = jax.tree_util.tree_flatten_with_path(params_before)[0]
    flat_new = jax.tree_util.tree_flatten_with_path(new_state.params)[0]
    flat_mask = jax.tree_util.tree_flatten_with_path(mask)[0]
    n_changed = 0
    for (p, old), (_, new), (_, m) in zip(flat_old, flat_new, flat_mask):
        s = "/".join(str(getattr(q, "key", q)) for q in p)
        if not m:
            assert not changed(old, new), f"frozen param changed: {s}"
        elif changed(old, new):
            n_changed += 1
    assert n_changed > 0


def test_greedy_generate_shapes_and_determinism(key):
    model = HSENetVLM(TINY_VLM, dtype=jnp.float32)
    batch = _batch(b=2, seq=16)
    params = model.init(
        key, batch["input_ids"], batch["image"], batch["image_2d"]
    )
    gen = make_greedy_generate(
        model, max_new_tokens=6, eos_token_id=2, pad_token_id=0,
        cache_dtype=jnp.float32,
    )
    kv_lens = batch["attention_mask"].sum(-1)
    out1 = gen(params, batch["input_ids"], kv_lens, batch["image"], batch["image_2d"])
    out2 = gen(params, batch["input_ids"], kv_lens, batch["image"], batch["image_2d"])
    assert out1.shape == (2, 6)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_greedy_generate_matches_stepwise_full_forward(key):
    """Cached greedy decode must equal argmax rollout over full forwards."""
    model = HSENetVLM(TINY_VLM, dtype=jnp.float32)
    b, seq = 1, 12
    batch = _batch(b=b, seq=seq)
    params = model.init(
        key, batch["input_ids"], batch["image"], batch["image_2d"]
    )
    gen = make_greedy_generate(
        model, max_new_tokens=4, eos_token_id=999, pad_token_id=0,
        cache_dtype=jnp.float32,
    )
    kv_lens = jnp.full((b,), seq, jnp.int32)
    fast = np.asarray(
        gen(params, batch["input_ids"], kv_lens, batch["image"], batch["image_2d"])
    )

    ids = np.asarray(batch["input_ids"])
    for t in range(4):
        logits = model.apply(
            params, jnp.asarray(ids), batch["image"], batch["image_2d"]
        )
        nxt = int(jnp.argmax(logits[0, -1]))
        assert nxt == fast[0, t], f"step {t}: {nxt} != {fast[0, t]}"
        ids = np.concatenate([ids, [[nxt]]], axis=1)


def test_online_slice_features_mode(key):
    """With online_slice_features, the VLM needs no precomputed image_2d
    (reference ViT4LLM_v3 in-graph BiomedCLIP path)."""
    from hsenet_tpu.configs import ViT2DConfig

    cfg = dataclasses.replace(
        TINY_VLM,
        online_slice_features=True,
        vit2d=ViT2DConfig(
            image_size=16, patch_size=8, hidden_size=TINY_VIT.slice_feature_dim,
            mlp_dim=32, num_layers=1, num_heads=2,
        ),
    )
    model = HSENetVLM(cfg, dtype=jnp.float32)
    batch = _batch(b=1, seq=16)
    params = model.init(key, batch["input_ids"], batch["image"], None)
    logits = model.apply(params, batch["input_ids"], batch["image"], None)
    assert logits.shape == (1, 16, 64)
    assert bool(jnp.all(jnp.isfinite(logits)))
    # the frozen 2D trunk participates: its params exist
    assert "slice_encoder" in params["params"]
    # trainable-mask policy keeps it frozen
    from hsenet_tpu.train.vlm import vlm_trainable_mask

    mask = vlm_trainable_mask(params)
    import jax as _jax

    flat = _jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, trainable in flat:
        s = "/".join(str(getattr(p, "key", p)) for p in path)
        if "slice_encoder" in s:
            assert not trainable, s


@pytest.mark.parametrize("mode", ["qformer", "med2e3"])
def test_ablation_projectors_inside_vlm_forward(key, mode):
    """QFormer and Med2E3 projector heads running inside a full VLM forward
    (not just unit-level): correct token counts, finite logits, and image
    sensitivity."""
    if mode == "qformer":
        packer = dataclasses.replace(TINY_PACKER, projector_type="qformer")
        cfg = dataclasses.replace(TINY_VLM, packer=packer, tower_mode="3d_vit")
    else:
        cfg = dataclasses.replace(TINY_VLM, tower_mode="med2e3")
    model = HSENetVLM(cfg, dtype=jnp.float32)
    n_img = cfg.num_image_tokens
    if mode == "qformer":
        assert n_img == 32  # 32 learned queries
    else:
        assert n_img == TINY_PACKER.proj_out_num + TINY_VIT.num_slices

    rng = np.random.default_rng(0)
    b, seq = 2, n_img + 8
    ids = rng.integers(3, 64, (b, seq))
    ids[:, 0] = 1
    vol = jnp.asarray(rng.random((b, 1, 4, 16, 16), np.float32))
    slices = jnp.asarray(rng.random((b, 2, 16), np.float32))
    params = model.init(key, jnp.asarray(ids), vol, slices)
    logits = model.apply(params, jnp.asarray(ids), vol, slices)
    assert logits.shape == (b, seq, TINY_LLM.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))

    # a different volume must change post-image logits
    logits2 = model.apply(
        params, jnp.asarray(ids), vol + 0.5, slices
    )
    assert float(jnp.abs(logits - logits2)[:, n_img + 1 :].max()) > 1e-6


def test_data_parallel_generate_matches_single_device(key):
    """dp-sharded eval generation (cli.evaluate --dp) must emit identical
    tokens, including the ragged-final-batch padding path (b=3 on dp=2)."""
    from hsenet_tpu.configs import MeshConfig
    from hsenet_tpu.eval.generate import make_data_parallel_generate
    from hsenet_tpu.parallel.mesh import create_mesh
    from hsenet_tpu.parallel.sharding import shard_params

    model = HSENetVLM(TINY_VLM, dtype=jnp.float32)
    batch = _batch(b=4, seq=16)
    params = model.init(
        key, batch["input_ids"], batch["image"], batch["image_2d"]
    )
    gen = make_greedy_generate(
        model, max_new_tokens=5, eos_token_id=2, pad_token_id=0,
        cache_dtype=jnp.float32,
    )
    kv_lens = batch["attention_mask"].sum(-1)
    ref = np.asarray(
        gen(params, batch["input_ids"], kv_lens, batch["image"],
            batch["image_2d"])
    )

    mesh = create_mesh(MeshConfig(dp=2, tp=1))
    sharded = shard_params(params, mesh)
    dp_gen = make_data_parallel_generate(gen, mesh)
    out = np.asarray(
        dp_gen(sharded, batch["input_ids"], kv_lens, batch["image"],
               batch["image_2d"])
    )
    np.testing.assert_array_equal(out, ref)

    # ragged batch: 3 rows on dp=2 -> padded to 4 internally, sliced back
    out3 = np.asarray(
        dp_gen(sharded, batch["input_ids"][:3], kv_lens[:3],
               batch["image"][:3], batch["image_2d"][:3])
    )
    assert out3.shape[0] == 3
    np.testing.assert_array_equal(out3, ref[:3])


def test_vlm_with_llama_backbone(key):
    """The reference's Llama-based VLM (`LamedLlamaForCausalLM`,
    lamed_llama.py): our assembly takes any decoder config through
    `llama_as_phi3_config`, so `VLMConfig(llm=llama_as_phi3_config(...))`
    IS the Llama VLM (full rotary, biasless, untied head). Forward +
    greedy generate must run with the same contracts as the Phi3 base."""
    import dataclasses

    from hsenet_tpu.configs import LlamaConfig
    from hsenet_tpu.eval.generate import make_greedy_generate
    from hsenet_tpu.models.llama import llama_as_phi3_config

    llama = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    cfg = dataclasses.replace(TINY_VLM, llm=llama_as_phi3_config(llama))
    assert cfg.llm.partial_rotary_factor == 1.0  # llama rotates fully
    model = HSENetVLM(cfg, dtype=jnp.float32)
    batch = _batch(b=2, seq=16)
    params = model.init(
        key, batch["input_ids"], batch["image"], batch["image_2d"]
    )
    logits = model.apply(
        params, batch["input_ids"], batch["image"], batch["image_2d"]
    )
    assert logits.shape == (2, 16, 64)
    assert bool(jnp.isfinite(logits).all())

    kv_lens = batch["attention_mask"].sum(-1).astype(jnp.int32)
    gen = make_greedy_generate(
        model, max_new_tokens=6, eos_token_id=2, pad_token_id=0,
        cache_dtype=jnp.float32,
    )
    out = np.asarray(
        gen(params, batch["input_ids"], kv_lens, batch["image"],
            batch["image_2d"])
    )
    assert out.shape == (2, 6)


def test_grad_accum_matches_full_batch(key):
    """grad_accum=2 (in-jit lax.scan microbatching, the reference's HF
    gradient_accumulation_steps analog) must match the full-batch step when
    the loss decomposes (uniform valid-token counts per row). SGD so f32
    accumulation-order noise isn't amplified by Adam normalization."""
    import optax

    from hsenet_tpu.train.vlm import make_masked_train_step
    import functools

    model = HSENetVLM(TINY_VLM, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b, seq = 4, 24
    ids = rng.integers(3, 64, (b, seq))
    ids[:, 0] = 1
    labels = ids.copy().astype(np.int64)
    labels[:, : N_IMG + 4] = -100  # same masked prefix on EVERY row
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "attention_mask": jnp.ones((b, seq), jnp.int64),
        "image": jnp.asarray(rng.random((b, 1, 4, 16, 16), np.float32)),
        "image_2d": jnp.asarray(rng.random((b, 2, 16), np.float32)),
    }
    params = model.init(
        key, batch["input_ids"], batch["image"], batch["image_2d"]
    )
    mask = vlm_trainable_mask(params)
    tx = optax.masked(optax.sgd(1e-2), mask)
    tx = optax.chain(
        tx,
        optax.masked(
            optax.set_to_zero(), jax.tree.map(lambda m: not m, mask)
        ),
    )
    from hsenet_tpu.train.vlm import vlm_loss_fn

    loss_fn = functools.partial(vlm_loss_fn, model)
    # deep-copy: both steps donate their input state; shared buffers would
    # be deleted by the first call
    params2 = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
    state1 = TrainState.create(params, tx)
    state2 = TrainState.create(params2, tx)
    full = make_masked_train_step(loss_fn, tx, trainable_mask=mask)
    accum = make_masked_train_step(
        loss_fn, tx, trainable_mask=mask, grad_accum=2
    )
    # deterministic (no dropout rng) so the two paths see identical math
    s1, m1 = full(state1, batch)
    s2, m2 = accum(state2, batch)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-5
    )
    for a, c in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), atol=2e-6
        )
