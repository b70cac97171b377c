"""Pipeline parallelism (parallel/pipeline.py): GPipe over a 'pp' mesh axis.

Equality discipline: the pipelined decoder must produce the SAME logits and
the SAME gradients as the plain single-program `model.apply` — pipelining
is a scheduling choice, not a numerics one. Runs on the 8-virtual-CPU mesh
(conftest.py), f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsenet_tpu.configs import MeshConfig, Phi3Config, TrainConfig
from hsenet_tpu.models.phi3 import Phi3ForCausalLM
from hsenet_tpu.parallel.mesh import create_mesh
from hsenet_tpu.parallel.pipeline import (
    make_pp_causal_lm_forward,
    make_pp_causal_lm_train_step,
    shard_params_pp,
)
from hsenet_tpu.train.losses import masked_lm_loss
from hsenet_tpu.train.train_state import TrainState, make_optimizer


TINY = Phi3Config(
    vocab_size=64,
    hidden_size=32,
    intermediate_size=64,
    num_layers=4,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    tie_word_embeddings=True,
)


def _setup(dp, pp, n_micro, batch, seq=12):
    mesh = create_mesh(MeshConfig(dp=dp, pp=pp, tp=1))
    assert mesh.axis_names == ("dp", "pp")
    model = Phi3ForCausalLM(TINY, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, TINY.vocab_size, (batch, seq)))
    kv_lens = jnp.asarray(
        rng.integers(seq // 2, seq + 1, (batch,)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), ids[:1])
    return mesh, model, params, ids, kv_lens


def test_pp_forward_matches_plain():
    mesh, model, params, ids, kv_lens = _setup(dp=2, pp=4, n_micro=2, batch=8)
    ref = model.apply(params, ids, kv_lens=kv_lens)[0]
    pp_params = shard_params_pp(params, mesh)
    fwd = jax.jit(make_pp_causal_lm_forward(model, mesh, n_micro=2))
    got = fwd(pp_params, ids, kv_lens)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=1e-5
    )


def test_pp_grads_match_plain():
    """Backprop THROUGH the pipeline (reverse ppermute ring) must equal the
    plain decoder's gradients — microbatch accumulation included."""
    mesh, model, params, ids, kv_lens = _setup(dp=2, pp=2, n_micro=2, batch=4)
    rng = np.random.default_rng(1)
    labels = np.asarray(ids).copy()
    labels[:, :3] = -100
    labels = jnp.asarray(labels)

    def plain_loss(p):
        logits = model.apply(p, ids, kv_lens=kv_lens)[0]
        return masked_lm_loss(logits, labels)[0]

    fwd = make_pp_causal_lm_forward(model, mesh, n_micro=2)

    def pp_loss(p):
        return masked_lm_loss(fwd(p, ids, kv_lens), labels)[0]

    ref_loss, ref_grads = jax.value_and_grad(plain_loss)(params)
    pp_params = shard_params_pp(params, mesh)
    got_loss, got_grads = jax.jit(jax.value_and_grad(pp_loss))(pp_params)
    np.testing.assert_allclose(float(got_loss), float(ref_loss), atol=1e-6)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_got = jax.tree.leaves(got_grads)
    assert len(flat_ref) == len(flat_got)
    for (path, r), g in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-5,
            err_msg="/".join(str(getattr(k, "key", k)) for k in path),
        )


def test_pp_train_step_matches_plain_step():
    """One optimizer step through the pipelined train step equals one step
    of a plain jitted value_and_grad+optax update."""
    mesh, model, params, ids, kv_lens = _setup(dp=2, pp=2, n_micro=2, batch=4)
    labels = np.asarray(ids).copy()
    labels[:, :2] = -100
    batch = {
        "input_ids": ids,
        "labels": jnp.asarray(labels),
        "attention_mask": (
            jnp.arange(ids.shape[1])[None, :] < kv_lens[:, None]
        ).astype(jnp.int32),
    }
    tx = make_optimizer(TrainConfig(total_steps=10, learning_rate=1e-3))

    # plain reference step
    def plain_loss(p, b):
        lens = b["attention_mask"].sum(axis=-1).astype(jnp.int32)
        logits = model.apply(p, b["input_ids"], kv_lens=lens)[0]
        return masked_lm_loss(logits, b["labels"])[0]

    g = jax.jit(jax.grad(plain_loss))(params, batch)
    import optax

    ref_state = TrainState.create(params, tx)
    updates, _ = tx.update(g, ref_state.opt_state, params)
    ref_params = optax.apply_updates(params, updates)

    pp_params = shard_params_pp(params, mesh)
    state = TrainState.create(pp_params, tx)
    step = make_pp_causal_lm_train_step(model, tx, mesh, n_micro=2)
    state, metrics = step(state, batch)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    for r, p in zip(jax.tree.leaves(ref_params), jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r), atol=2e-6)


def test_pp_layer_params_actually_sharded():
    """The layer stack must live sharded over 'pp' (the memory win that
    motivates pipelining), not replicated."""
    mesh, model, params, *_ = _setup(dp=2, pp=4, n_micro=2, batch=8)
    pp_params = shard_params_pp(params, mesh)
    kernel = pp_params["params"]["decoder"]["layers"]["q_proj"]["kernel"]
    assert "pp" in str(kernel.sharding.spec)
    # a replicated leaf stays replicated
    embed = pp_params["params"]["embed"]["embedding"]
    assert "pp" not in str(embed.sharding.spec)


def test_pp_requires_divisible_layers():
    mesh = create_mesh(MeshConfig(dp=1, pp=8, tp=1))
    model = Phi3ForCausalLM(TINY, dtype=jnp.float32)  # 4 layers, 8 stages
    with pytest.raises(AssertionError):
        make_pp_causal_lm_forward(model, mesh, n_micro=2)
