"""Sequence parallelism: ring attention + sp-sharded ViT3D / stage-1 step.

Everything is checked for exact-math equality against the dense
single-device path (the ring computes the same softmax, only the
accumulation order differs), including gradients through the ppermute
ring — the property that makes sp a *training* axis, not a demo.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hsenet_tpu.configs import BertConfig, CLIPConfig, MeshConfig, ViT3DConfig
from hsenet_tpu.models.clip import CLIPModel
from hsenet_tpu.models.vit import ViT3D
from hsenet_tpu.ops.attention import sdpa_reference
from hsenet_tpu.ops.ring_attention import pad_to_multiple, ring_attention
from hsenet_tpu.parallel.mesh import create_mesh
from hsenet_tpu.parallel.pipeline import _shard_map
from hsenet_tpu.parallel.sp import (
    make_sp_encode_fn,
    make_sp_stage1_train_step,
    vit3d_token_count,
)
from hsenet_tpu.train.stage1 import make_stage1_train_step
from hsenet_tpu.train.train_state import TrainState

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


def _ring_on_mesh(q, k, v, sp, **kwargs):
    """Run ring_attention over an sp-axis mesh, return the global result."""
    mesh = create_mesh(MeshConfig(dp=1, sp=sp))

    def local(q, k, v):
        return ring_attention(
            q, k, v, axis_name="sp", axis_size=sp, **kwargs
        )

    fn = _shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None, "sp"), P(None, None, "sp"), P(None, None, "sp")),
        out_specs=P(None, None, "sp"),
        check_vma=False,
    )
    return jax.jit(fn)(q, k, v)


def test_ring_attention_matches_sdpa(rng):
    b, h, s, d = 2, 3, 40, 16
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        for _ in range(3)
    )
    out = _ring_on_mesh(q, k, v, sp=8)
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_ring_attention_padding_mask(rng):
    """kv_len masks the global tail padding exactly like truncation."""
    b, h, s_true, d, sp = 1, 2, 37, 8, 8
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s_true, d)), jnp.float32)
        for _ in range(3)
    )
    qp = pad_to_multiple(q, sp, axis=2)
    kp = pad_to_multiple(k, sp, axis=2)
    vp = pad_to_multiple(v, sp, axis=2)
    out = _ring_on_mesh(qp, kp, vp, sp=sp, kv_len=s_true)
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out)[:, :, :s_true], np.asarray(ref), atol=2e-6
    )


def test_ring_attention_causal(rng):
    b, h, s, d, sp = 2, 2, 32, 8, 4
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        for _ in range(3)
    )
    out = _ring_on_mesh(q, k, v, sp=sp, causal=True)
    ref = sdpa_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_ring_attention_grads(rng):
    """Reverse-mode through the ppermute ring == dense attention grads."""
    b, h, s, d, sp = 1, 2, 24, 8, 4
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        for _ in range(3)
    )
    w = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    mesh = create_mesh(MeshConfig(dp=1, sp=sp))

    def ring_loss(q, k, v):
        def local(q, k, v, w):
            out = ring_attention(q, k, v, axis_name="sp", axis_size=sp)
            # psum so every device returns the same scalar (out_specs P())
            return jax.lax.psum(jnp.sum(out * w), "sp")

        spec = P(None, None, "sp")
        return _shard_map(
            local, mesh=mesh, in_specs=(spec,) * 4, out_specs=P(),
            check_vma=False,
        )(q, k, v, w)

    def dense_loss(q, k, v):
        return jnp.sum(sdpa_reference(q, k, v) * w)

    g_ring = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(q, k, v)
    g_dense = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
    for gr, gd in zip(g_ring, g_dense):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gd), atol=5e-6)


def test_sp_encode_matches_plain(rng, key):
    """ViT3D under ("dp", "sp") == plain single-device forward (CLS + pad)."""
    model = ViT3D(TINY_VIT, dtype=jnp.float32)
    vol = jnp.asarray(rng.random((4, 1, 8, 16, 16), np.float32))
    params = model.init(key, vol[:1])
    plain = model.apply(params, vol)

    mesh = create_mesh(MeshConfig(dp=2, sp=4))
    encode = make_sp_encode_fn(model, mesh)
    out = encode(params, vol)
    s = vit3d_token_count(TINY_VIT, vol.shape)
    assert s == 17 and out.shape == plain.shape  # 16 patches + CLS, padded to 20
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain), atol=2e-5)


def test_sp_encode_slice_guided(rng, key):
    """2E3 (slice-guided) scoring happens pre-ring; sp must reproduce it."""
    cfg = dataclasses.replace(TINY_VIT, slice_guided=True)
    model = ViT3D(cfg, dtype=jnp.float32)
    vol = jnp.asarray(rng.random((2, 1, 8, 16, 16), np.float32))
    sf = jnp.asarray(rng.standard_normal((2, 4, 32)), np.float32)
    params = model.init(key, vol[:1], sf[:1])
    plain = model.apply(params, vol, sf)

    mesh = create_mesh(MeshConfig(dp=2, sp=4))
    encode = make_sp_encode_fn(model, mesh)
    out = encode(params, vol, sf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain), atol=2e-5)


def test_sp_stage1_train_step_matches_plain(rng, key):
    """One sp-sharded stage-1 step == the plain step: loss, grads, update."""
    cfg = CLIPConfig(vision=TINY_VIT, text=TINY_BERT, projection_dim=32)
    model = CLIPModel(cfg, dtype=jnp.float32)
    batch = {
        "image": jnp.asarray(rng.random((8, 1, 8, 16, 16), np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 64, (8, 12))),
        "attention_mask": jnp.ones((8, 12), jnp.int32),
    }
    params = model.init(
        key, batch["image"][:1], batch["input_ids"][:1],
        batch["attention_mask"][:1],
    )
    # SGD: the update is linear in the gradient, so the comparison below is
    # a true grad-equality check (adamw's m/sqrt(v) amplifies f32
    # accumulation-order noise on near-zero grads into relative blowups)
    tx = optax.sgd(1e-2)

    def fresh_state():
        p = jax.tree.map(jnp.copy, params)
        return TrainState(step=jnp.asarray(0), params=p,
                          opt_state=tx.init(p))

    step_rng = jax.random.key(7)
    plain_step = make_stage1_train_step(model, tx)
    s_plain, m_plain = plain_step(fresh_state(), batch, step_rng)

    mesh = create_mesh(MeshConfig(dp=2, sp=4))
    sp_step = make_sp_stage1_train_step(model, tx, mesh)
    s_sp, m_sp = sp_step(fresh_state(), batch, step_rng)

    np.testing.assert_allclose(
        float(m_sp["loss"]), float(m_plain["loss"]), atol=1e-5
    )
    np.testing.assert_allclose(
        float(m_sp["grad_norm"]), float(m_plain["grad_norm"]), rtol=1e-4
    )
    flat_sp = jax.tree_util.tree_leaves(s_sp.params)
    flat_plain = jax.tree_util.tree_leaves(s_plain.params)
    for a, b in zip(flat_sp, flat_plain):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5
        )


def test_ring_attention_kv_lens_causal(rng):
    """Per-row global lengths (ragged right-padded batch) + causal mask."""
    b, h, s, d, sp = 3, 2, 24, 8, 4
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        for _ in range(3)
    )
    kv_lens = jnp.asarray([24, 13, 7], jnp.int32)
    mesh = create_mesh(MeshConfig(dp=1, sp=sp))

    def local(q, k, v, lens):
        return ring_attention(
            q, k, v, axis_name="sp", axis_size=sp, kv_lens=lens, causal=True
        )

    spec = P(None, None, "sp")
    out = jax.jit(_shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec, P()),
        out_specs=spec, check_vma=False,
    ))(q, k, v, kv_lens)
    ref = sdpa_reference(q, k, v, kv_lens=kv_lens, causal=True)
    # only rows < kv_lens are defined (padding queries are dropped by loss
    # masking downstream)
    for row in range(b):
        n = int(kv_lens[row])
        np.testing.assert_allclose(
            np.asarray(out)[row, :, :n], np.asarray(ref)[row, :, :n],
            atol=2e-6,
        )


def test_ring_attention_blockwise_hop(rng):
    """block_q streams query blocks through each hop (the long-chunk
    memory path): must equal the dense hop exactly, including a block
    size that does NOT divide the chunk, causal+ragged masks and grads."""
    b, h, s, d, sp = 2, 2, 24, 8, 4
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        for _ in range(3)
    )
    kv_lens = jnp.asarray([20, 11], jnp.int32)
    dense = _ring_on_mesh(q, k, v, sp=sp, kv_lens=kv_lens, causal=True)
    for bq in (4, 5, 16):  # 5 does not divide the 6-token chunk
        blk = _ring_on_mesh(
            q, k, v, sp=sp, kv_lens=kv_lens, causal=True, block_q=bq
        )
        np.testing.assert_allclose(
            np.asarray(blk), np.asarray(dense), atol=2e-6, err_msg=str(bq)
        )

    # grads through the rematerialized block body == dense-hop grads
    w = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    mesh = create_mesh(MeshConfig(dp=1, sp=sp))

    def loss(block_q):
        def local(q, k, v, w):
            out = ring_attention(
                q, k, v, axis_name="sp", axis_size=sp, causal=True,
                block_q=block_q,
            )
            return jax.lax.psum(jnp.sum(out * w), "sp")

        spec = P(None, None, "sp")
        f = _shard_map(
            local, mesh=mesh, in_specs=(spec,) * 4, out_specs=P(),
            check_vma=False,
        )
        return jax.jit(jax.grad(lambda q: f(q, k, v, w)))(q)

    np.testing.assert_allclose(
        np.asarray(loss(4)), np.asarray(loss(None)), atol=5e-6
    )


TINY_PHI3_KW = dict(
    vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=8, tie_word_embeddings=True,
)


def test_sp_causal_lm_forward_matches_plain(rng):
    """Decoder hidden states through the causal ring == plain decoder,
    with GQA (kv-head expansion before the ring), ragged kv_lens and a
    sequence length that does NOT divide sp (ring tail padding)."""
    from hsenet_tpu.configs import Phi3Config
    from hsenet_tpu.models.phi3 import Phi3ForCausalLM
    from hsenet_tpu.parallel.sp import make_sp_decoder_hidden_fn

    model = Phi3ForCausalLM(Phi3Config(**TINY_PHI3_KW), dtype=jnp.float32)
    b, seq = 4, 13
    ids = jnp.asarray(rng.integers(3, 64, (b, seq)))
    kv_lens = jnp.asarray([13, 9, 5, 13], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids[:1])
    ref = model.apply(params, ids, kv_lens=kv_lens)[0]

    mesh = create_mesh(MeshConfig(dp=2, sp=4))
    hidden_fn = make_sp_decoder_hidden_fn(model.config, jnp.float32, mesh)

    @jax.jit
    def sp_logits(params, ids, kv_lens):
        embeds = model.apply(
            params, ids, method=Phi3ForCausalLM.embed_tokens
        )
        hidden = hidden_fn(params["params"]["decoder"], embeds, kv_lens)
        return model.apply(
            params, hidden, method=Phi3ForCausalLM.compute_logits
        )

    got = sp_logits(params, ids, kv_lens)
    for row in range(b):
        n = int(kv_lens[row])
        np.testing.assert_allclose(
            np.asarray(got)[row, :n], np.asarray(ref)[row, :n], atol=2e-5
        )

    # blockwise hops through the decoder: same logits
    hidden_blk = make_sp_decoder_hidden_fn(
        model.config, jnp.float32, mesh, block_q=2
    )

    @jax.jit
    def sp_logits_blk(params, ids, kv_lens):
        embeds = model.apply(
            params, ids, method=Phi3ForCausalLM.embed_tokens
        )
        hidden = hidden_blk(params["params"]["decoder"], embeds, kv_lens)
        return model.apply(
            params, hidden, method=Phi3ForCausalLM.compute_logits
        )

    got_blk = sp_logits_blk(params, ids, kv_lens)
    for row in range(b):
        n = int(kv_lens[row])
        np.testing.assert_allclose(
            np.asarray(got_blk)[row, :n], np.asarray(got)[row, :n],
            atol=2e-6,
        )


def test_sp_causal_lm_train_step_matches_plain(rng):
    """One optimizer step through the sp causal-LM step equals one step of
    a plain jitted value_and_grad + optax update (ragged kv_lens)."""
    import optax as _optax

    from hsenet_tpu.configs import Phi3Config, TrainConfig
    from hsenet_tpu.models.phi3 import Phi3ForCausalLM
    from hsenet_tpu.parallel.sp import make_sp_causal_lm_train_step
    from hsenet_tpu.train.losses import masked_lm_loss
    from hsenet_tpu.train.train_state import TrainState as TS, make_optimizer

    model = Phi3ForCausalLM(Phi3Config(**TINY_PHI3_KW), dtype=jnp.float32)
    b, seq = 4, 12
    ids = jnp.asarray(rng.integers(3, 64, (b, seq)))
    kv_lens = jnp.asarray([12, 9, 6, 12], jnp.int32)
    labels = np.asarray(ids).copy()
    labels[np.arange(seq)[None, :] >= np.asarray(kv_lens)[:, None]] = -100
    labels[:, :2] = -100
    batch = {
        "input_ids": ids,
        "labels": jnp.asarray(labels),
        "attention_mask": (
            jnp.arange(seq)[None, :] < kv_lens[:, None]
        ).astype(jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), ids[:1])
    tx = make_optimizer(TrainConfig(total_steps=10, learning_rate=1e-3))

    def plain_loss(p, bt):
        lens = bt["attention_mask"].sum(axis=-1).astype(jnp.int32)
        logits = model.apply(p, bt["input_ids"], kv_lens=lens)[0]
        return masked_lm_loss(logits, bt["labels"])[0]

    g = jax.jit(jax.grad(plain_loss))(params, batch)
    ref_state = TS.create(jax.tree.map(jnp.copy, params), tx)
    updates, _ = tx.update(g, ref_state.opt_state, params)
    ref_params = _optax.apply_updates(params, updates)

    mesh = create_mesh(MeshConfig(dp=2, sp=4))
    state = TS.create(params, tx)
    step = make_sp_causal_lm_train_step(model, tx, mesh)
    state, metrics = step(state, batch)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    for r, p in zip(
        jax.tree.leaves(ref_params), jax.tree.leaves(state.params)
    ):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r), atol=2e-6)


def test_sp_vlm_train_step_matches_plain(rng):
    """The sp VLM finetune step (towers/splice outside the ring, decoder
    sequence-parallel) takes the same optimizer step as the plain
    make_vlm_train_step (dropout rates 0)."""
    from hsenet_tpu.configs import (
        LoRAConfig, PackerConfig, Phi3Config, TrainConfig, VLMConfig,
    )
    from hsenet_tpu.models.mllm import HSENetVLM
    from hsenet_tpu.parallel.sp import make_sp_vlm_train_step
    from hsenet_tpu.train.train_state import make_optimizer
    from hsenet_tpu.train.vlm import make_vlm_train_step, vlm_trainable_mask

    cfg = VLMConfig(
        vision=ViT3DConfig(
            image_size=(4, 16, 16), patch_size=(2, 8, 8), hidden_size=16,
            mlp_dim=32, num_layers=1, num_heads=2, num_slices=2,
            slice_feature_dim=16,
        ),
        packer=PackerConfig(
            grid=(2, 2, 2), kernel=(1, 2, 2), in_dim=16, out_dim=32,
            dropout_rate=0.0,
        ),
        llm=Phi3Config(
            **{**TINY_PHI3_KW, "num_layers": 2},
            lora=LoRAConfig(rank=2, alpha=4, dropout_rate=0.0),
        ),
    )
    model = HSENetVLM(cfg, dtype=jnp.float32)
    b, seq = 4, 16
    n_img = cfg.num_image_tokens
    ids = rng.integers(3, 64, (b, seq))
    ids[:, 0] = 1
    labels = ids.astype(np.int64).copy()
    labels[:, : n_img + 2] = -100
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "attention_mask": jnp.ones((b, seq), jnp.int32),
        "image": jnp.asarray(rng.random((b, 1, 4, 16, 16), np.float32)),
        "image_2d": jnp.asarray(rng.random((b, 2, 16), np.float32)),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["image"],
        batch["image_2d"],
    )
    mask = vlm_trainable_mask(params)
    tx = make_optimizer(
        TrainConfig(total_steps=10, learning_rate=1e-3), trainable_mask=mask
    )
    key = jax.random.PRNGKey(7)
    from hsenet_tpu.train.train_state import TrainState as TS

    ref_state = TS.create(jax.tree.map(jnp.copy, params), tx)
    ref_step = make_vlm_train_step(model, tx, mesh=None, trainable_mask=mask)
    ref_state, ref_metrics = ref_step(ref_state, batch, key)

    mesh = create_mesh(MeshConfig(dp=2, sp=2))
    state = TS.create(params, tx)
    step = make_sp_vlm_train_step(model, tx, mesh, trainable_mask=mask)
    state, metrics = step(state, batch, key)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), atol=1e-6
    )
    np.testing.assert_allclose(
        float(metrics["grad_norm"]), float(ref_metrics["grad_norm"]),
        rtol=1e-5,
    )
    for r, p in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(state.params)
    ):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r), atol=2e-6)


def test_stage1_cli_sp(tmp_path):
    """--sp 4 end-to-end through the stage-1 CLI (dp=2 x sp=4 mesh)."""
    from hsenet_tpu.cli.train_clip_stage1 import main as stage1

    state = stage1([
        "--synthetic",
        "--image-size", "8", "32", "32",
        "--patch-size", "2", "8", "8",
        "--hidden-size", "32",
        "--mlp-dim", "64",
        "--num-layers", "2",
        "--num-heads", "4",
        "--num-slices", "4",
        "--slice-dim", "32",
        "--text-hidden", "32",
        "--max-text-len", "16",
        "--dtype", "float32",
        "--dp", "2",
        "--sp", "4",
        "--batch-size", "4",
        "--log-every", "1",
        "--checkpoint-every", "1000",
        "--total-steps", "2",
        "--output-dir", str(tmp_path / "sp_stage1"),
    ])
    assert int(state.step) == 2


def test_vlm_cli_sp(tmp_path):
    """--sp 2 end-to-end through the VLM finetune CLI (dp=4 x sp=2 mesh),
    WITH --remat: covers nn.remat(Phi3Block) receiving the sp kwargs."""
    from hsenet_tpu.cli.train_vlm import main as vlm

    state = vlm([
        "--synthetic",
        "--task", "mrg",
        "--total-steps", "2",
        "--batch-size", "4",
        "--log-every", "1",
        "--checkpoint-every", "1000",
        "--dtype", "float32",
        "--dp", "4", "--sp", "2",
        "--remat",
        "--output-dir", str(tmp_path / "sp_vlm"),
    ])
    assert int(state.step) == 2


def test_mesh_config_sp_axis():
    mesh = create_mesh(MeshConfig(dp=2, sp=4))
    assert mesh.axis_names == ("dp", "sp")
    assert mesh.shape["sp"] == 4 and mesh.shape["dp"] == 2
    with pytest.raises(AssertionError):
        create_mesh(MeshConfig(dp=1, sp=2, tp=2))


def test_sp_stage2_train_step_matches_plain(rng, key):
    """One sp-sharded stage-2 step == the plain step (teacher-forward AND
    cached-teacher modes): loss, relation term, updated params."""
    import dataclasses

    from hsenet_tpu.configs import CLIPConfig
    from hsenet_tpu.models.clip import CLIPModel
    from hsenet_tpu.parallel.sp import make_sp_stage2_train_step
    from hsenet_tpu.train.stage2 import (
        TeacherCache,
        make_stage2_train_step,
        make_teacher_embed_fn,
    )

    t_cfg = CLIPConfig(vision=TINY_VIT, text=TINY_BERT, projection_dim=32)
    # slice_dropout_rate=0: the plain step applies the 2E3 slice-guided
    # attention's dropout (reference-hardcoded 0.1) while the sp ring runs
    # the tower deterministic (documented policy) — pin it off so this is
    # a true equality check
    s_cfg = dataclasses.replace(
        t_cfg,
        vision=dataclasses.replace(
            TINY_VIT, slice_guided=True, slice_dropout_rate=0.0
        ),
    )
    student = CLIPModel(s_cfg, dtype=jnp.float32)
    teacher = CLIPModel(t_cfg, dtype=jnp.float32)
    batch = {
        "image": jnp.asarray(rng.random((8, 1, 8, 16, 16), np.float32)),
        "image_2d": jnp.asarray(rng.random((8, 4, 32), np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 64, (8, 12))),
        "attention_mask": jnp.ones((8, 12), jnp.int32),
    }
    sparams = student.init(
        key, batch["image"][:1], batch["input_ids"][:1],
        batch["attention_mask"][:1], batch["image_2d"][:1],
    )
    tparams = teacher.init(
        key, batch["image"][:1], batch["input_ids"][:1],
        batch["attention_mask"][:1],
    )
    # SGD: linear in the gradient -> true grad-equality check (see the
    # stage-1 sp test above for the adamw rationale)
    tx = optax.sgd(1e-2)

    def fresh_state():
        p = jax.tree.map(jnp.copy, sparams)
        return TrainState(step=jnp.asarray(0), params=p,
                          opt_state=tx.init(p))

    step_rng = jax.random.key(11)
    mesh = create_mesh(MeshConfig(dp=2, sp=4))

    plain = make_stage2_train_step(student, teacher, s_cfg, tx, tparams, mesh)
    s_plain, m_plain = plain(fresh_state(), batch, step_rng)

    sp_step = make_sp_stage2_train_step(
        student, teacher, s_cfg, tx, tparams, mesh
    )
    s_sp, m_sp = sp_step(fresh_state(), batch, step_rng)

    np.testing.assert_allclose(
        float(m_sp["loss"]), float(m_plain["loss"]), atol=1e-5
    )
    np.testing.assert_allclose(
        float(m_sp["loss_relation"]), float(m_plain["loss_relation"]),
        atol=1e-5,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_sp.params),
        jax.tree_util.tree_leaves(s_plain.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    # the sp cache-FILL path produces the same teacher features as the
    # dense fill (the fill must ride the ring at --sp-scale token counts)
    from hsenet_tpu.parallel.sp import make_sp_teacher_embed_fn

    dense_fill = make_teacher_embed_fn(teacher, tparams, mesh)(batch)
    sp_fill = make_sp_teacher_embed_fn(teacher, tparams, mesh)(batch)
    for k2 in ("teacher_image_features", "teacher_text_features"):
        np.testing.assert_allclose(
            np.asarray(sp_fill[k2]), np.asarray(dense_fill[k2]), atol=1e-5
        )

    # cached-teacher sp mode: same result again, no teacher forward in-step
    cache = TeacherCache(make_teacher_embed_fn(teacher, tparams, mesh))
    cbatch = cache.attach(batch)
    sp_cached = make_sp_stage2_train_step(
        student, teacher, s_cfg, tx, tparams, mesh, cached_teacher=True
    )
    s_c, m_c = sp_cached(fresh_state(), cbatch, step_rng)
    np.testing.assert_allclose(
        float(m_c["loss"]), float(m_plain["loss"]), atol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_c.params),
        jax.tree_util.tree_leaves(s_plain.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_stage2_cli_sp(tmp_path):
    """--sp 4 end-to-end through the stage-2 CLI (dp=2 x sp=4 mesh),
    cached-teacher composed on top."""
    from hsenet_tpu.cli.train_clip_stage2 import main as stage2

    state = stage2([
        "--synthetic",
        "--image-size", "8", "32", "32",
        "--patch-size", "2", "8", "8",
        "--hidden-size", "32",
        "--mlp-dim", "64",
        "--num-layers", "2",
        "--num-heads", "4",
        "--num-slices", "4",
        "--slice-dim", "32",
        "--text-hidden", "32",
        "--max-text-len", "16",
        "--dtype", "float32",
        "--dp", "2",
        "--sp", "4",
        "--cached-teacher",
        "--batch-size", "4",
        "--log-every", "1",
        "--checkpoint-every", "1000",
        "--total-steps", "2",
        "--output-dir", str(tmp_path / "sp_stage2"),
    ])
    assert int(state.step) == 2
