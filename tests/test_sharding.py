"""Tensor-parallel correctness: sharded execution must be numerically
equivalent to single-device execution, and the partition rules must map
params as intended."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hsenet_tpu.configs import MeshConfig, Phi3Config
from hsenet_tpu.models.phi3 import Phi3ForCausalLM
from hsenet_tpu.parallel.mesh import create_mesh
from hsenet_tpu.parallel.sharding import (
    make_param_specs,
    partition_spec_for,
    shard_params,
    validate_divisibility,
)

TINY = Phi3Config(
    vocab_size=64,
    hidden_size=32,
    intermediate_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    tie_word_embeddings=True,
)


def test_partition_rules():
    assert partition_spec_for("llm/decoder/layers/q_proj/kernel") == P(
        None, None, "tp"
    )
    assert partition_spec_for("llm/decoder/layers/o_proj/kernel") == P(
        None, "tp", None
    )
    assert partition_spec_for("llm/embed/embedding") == P("tp", None)
    assert partition_spec_for("vision_tower/x/kernel") == P()
    assert partition_spec_for("llm/decoder/layers/q_proj/lora_a") == P()


def test_tp_sharded_logits_match_single_device(key, rng):
    model = Phi3ForCausalLM(TINY, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (2, 12)))
    params = model.init(key, ids)

    ref_logits, _ = jax.jit(lambda p, i: model.apply(p, i))(params, ids)

    mesh = create_mesh(MeshConfig(dp=2, tp=4))
    validate_divisibility(params["params"], mesh)
    sharded = shard_params(params, mesh)
    ids_sharded = jax.device_put(ids, NamedSharding(mesh, P("dp")))
    tp_logits, _ = jax.jit(lambda p, i: model.apply(p, i))(
        sharded, ids_sharded
    )
    np.testing.assert_allclose(
        np.asarray(tp_logits), np.asarray(ref_logits), atol=2e-5, rtol=2e-5
    )
    # the projections really are tp-sharded
    specs = make_param_specs(params["params"])
    q_spec = specs["decoder"]["layers"]["q_proj"]["kernel"]
    assert q_spec == P(None, None, "tp")


def test_tp_sharded_decode_matches_single_device(key, rng):
    """Greedy generation under a (dp=2, tp=4) mesh must emit the SAME token
    ids as single-device decode — the multi-chip inference path (KV cache,
    per-row lengths, vocab-sharded tied head) end to end."""
    from hsenet_tpu.eval.generate import make_greedy_generate_llm_only

    model = Phi3ForCausalLM(TINY, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(3, 64, (2, 6)))
    params = model.init(key, ids)
    kv = jnp.full((2,), 6, jnp.int32)
    gen = make_greedy_generate_llm_only(
        model, max_new_tokens=8, eos_token_id=-1, cache_dtype=jnp.float32
    )
    ref_tokens = np.asarray(gen(params, ids, kv))

    mesh = create_mesh(MeshConfig(dp=2, tp=4))
    sharded = shard_params(params, mesh)
    ids_sharded = jax.device_put(ids, NamedSharding(mesh, P("dp")))
    tp_tokens = np.asarray(gen(sharded, ids_sharded, kv))
    np.testing.assert_array_equal(tp_tokens, ref_tokens)


def test_tp_rules_cover_int8_quantized_params(key, rng):
    """int8 weight-only params (kernel_q/kernel_scale, embedding_q/scale)
    shard consistently with their float counterparts, and the quantized
    model decodes under tp to the same tokens as unsharded."""
    import dataclasses

    import flax

    from hsenet_tpu.eval.generate import make_greedy_generate_llm_only
    from hsenet_tpu.models.lora import (
        quantize_embed_int8,
        quantize_kernels_int8,
    )

    assert partition_spec_for("llm/decoder/layers/up_proj/kernel_q") == P(
        None, None, "tp"
    )
    assert partition_spec_for("llm/decoder/layers/up_proj/kernel_scale") == P(
        None, "tp"
    )
    assert partition_spec_for("llm/decoder/layers/down_proj/kernel_q") == P(
        None, "tp", None
    )
    assert partition_spec_for("llm/decoder/layers/down_proj/kernel_scale") == P()
    assert partition_spec_for("llm/embed/embedding_q") == P("tp", None)
    assert partition_spec_for("llm/embed/scale") == P("tp")
    # RMSNorm scales must NOT be vocab-sharded
    assert partition_spec_for("llm/decoder/norm/scale") == P()

    qcfg = dataclasses.replace(TINY, quant_int8=True, quant_int8_embed=True)
    model = Phi3ForCausalLM(qcfg, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(3, 64, (2, 6)))
    base = Phi3ForCausalLM(TINY, dtype=jnp.float32).init(key, ids)
    qparams = {"params": quantize_embed_int8(
        quantize_kernels_int8(flax.core.unfreeze(base)["params"])
    )}
    kv = jnp.full((2,), 6, jnp.int32)
    gen = make_greedy_generate_llm_only(
        model, max_new_tokens=6, eos_token_id=-1, cache_dtype=jnp.float32
    )
    ref_tokens = np.asarray(gen(qparams, ids, kv))

    mesh = create_mesh(MeshConfig(dp=2, tp=4))
    validate_divisibility(qparams["params"], mesh)
    sharded = shard_params(qparams, mesh)
    tp_tokens = np.asarray(gen(sharded, ids, kv))
    np.testing.assert_array_equal(tp_tokens, ref_tokens)


def test_tp_train_gradients_match_single_device(key, rng):
    """Grad of a masked-LM loss under tp sharding == single-device grads."""
    import optax

    model = Phi3ForCausalLM(TINY, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (2, 8)))
    labels = jnp.asarray(rng.integers(0, 64, (2, 8)))
    params = model.init(key, ids)

    def loss_fn(p):
        logits, _ = model.apply(p, ids)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1].astype(jnp.float32), labels[:, 1:]
        ).mean()

    g_ref = jax.jit(jax.grad(loss_fn))(params)

    mesh = create_mesh(MeshConfig(dp=2, tp=4))
    sharded = shard_params(params, mesh)
    g_tp = jax.jit(jax.grad(loss_fn))(sharded)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_tp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5
        )


def test_fsdp_specs_shard_large_leaves_only(key, rng):
    """FSDP placement: large leaves gain a 'dp' dim (the scan layer axis
    stays intact, tp dims are kept), small leaves stay replicated."""
    from hsenet_tpu.parallel.sharding import make_fsdp_specs

    model = Phi3ForCausalLM(TINY, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (2, 8)))
    params = model.init(key, ids)["params"]
    mesh = create_mesh(MeshConfig(dp=2, tp=4))

    specs = make_fsdp_specs(params, mesh, min_size=0)
    # stacked q kernel (L, hidden, q_dim): tp on dim 2 (rule), dp added on
    # dim 1 (largest free dim), layer axis untouched
    assert specs["decoder"]["layers"]["q_proj"]["kernel"] == P(
        None, "dp", "tp"
    )
    # embeddings (vocab, hidden): vocab tp-sharded, hidden dp-sharded
    assert specs["embed"]["embedding"] == P("tp", "dp")
    # norm scales (L, hidden): hidden=32 divides dp -> sharded at min_size=0
    assert specs["decoder"]["layers"]["input_norm"]["scale"] == P(None, "dp")

    # with the real threshold, tiny leaves stay replicated
    specs_default = make_fsdp_specs(params, mesh)
    assert specs_default["decoder"]["layers"]["input_norm"]["scale"] == P()


def test_fsdp_train_step_matches_plain(key, rng):
    """One VLM finetune step with FSDP-placed params == the plain step,
    and the updated params keep their dp sharding (the memory win)."""
    from hsenet_tpu.configs import (
        LoRAConfig, PackerConfig, TrainConfig, ViT3DConfig, VLMConfig,
    )
    from hsenet_tpu.models.mllm import HSENetVLM
    from hsenet_tpu.parallel.sharding import shard_params_fsdp
    from hsenet_tpu.train.train_state import TrainState, make_optimizer
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
        llm=TINY.__class__(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
            tie_word_embeddings=True,
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
    params = model.init(key, batch["input_ids"], batch["image"],
                        batch["image_2d"])
    mask = vlm_trainable_mask(params)
    tx = make_optimizer(
        TrainConfig(total_steps=10, learning_rate=1e-3), trainable_mask=mask
    )
    step_rng = jax.random.PRNGKey(7)

    ref_state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    ref_step = make_vlm_train_step(model, tx, mesh=None, trainable_mask=mask)
    ref_state, ref_metrics = ref_step(ref_state, batch, step_rng)

    mesh = create_mesh(MeshConfig(dp=4, tp=2))
    fsdp_params = shard_params_fsdp(params, mesh, min_size=0)
    # the q kernel really lives sharded over BOTH dp and tp
    q = fsdp_params["params"]["llm"]["decoder"]["layers"]["q_proj"]["kernel"]
    assert "dp" in str(q.sharding.spec) and "tp" in str(q.sharding.spec)
    state = TrainState.create(fsdp_params, tx)
    step = make_vlm_train_step(model, tx, mesh, trainable_mask=mask)
    state, metrics = step(state, batch, step_rng)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), atol=1e-6
    )
    for r, p in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(state.params)
    ):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r), atol=2e-6)
    # placement survives the update: Adam moments + updated params sharded
    q2 = state.params["params"]["llm"]["decoder"]["layers"]["q_proj"][
        "kernel"
    ]
    assert "dp" in str(q2.sharding.spec)
    m_leaf = [
        l for l in jax.tree.leaves(state.opt_state)
        if getattr(l, "ndim", 0) == 3
    ]
    assert any("dp" in str(l.sharding.spec) for l in m_leaf)


def test_cli_train_vlm_fsdp(tmp_path):
    """End-to-end VLM finetune CLI with --fsdp on a dp=4 x tp=2 mesh."""
    from hsenet_tpu.cli.train_vlm import main as vlm

    state = vlm([
        "--synthetic",
        "--task", "mrg",
        "--total-steps", "2",
        "--batch-size", "4",
        "--log-every", "1",
        "--checkpoint-every", "1000",
        "--dtype", "float32",
        "--dp", "4", "--tp", "2", "--fsdp",
        "--output-dir", str(tmp_path / "vlm_fsdp"),
    ])
    assert int(state.step) == 2
