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
