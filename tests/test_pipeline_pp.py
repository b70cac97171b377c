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


def _tiny_vlm():
    from hsenet_tpu.configs import (
        LoRAConfig,
        PackerConfig,
        ViT3DConfig,
        VLMConfig,
    )
    from hsenet_tpu.models.mllm import HSENetVLM

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
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
            tie_word_embeddings=True,
            lora=LoRAConfig(rank=2, alpha=4, dropout_rate=0.0),
        ),
    )
    return HSENetVLM(cfg, dtype=jnp.float32), cfg


def test_pp_vlm_train_step_matches_plain():
    """The pipelined VLM finetune step (towers/packers/splice outside the
    ring, LLM decoder GPipe'd) must take the same optimizer step as the
    plain single-program make_vlm_train_step (dropout rates 0)."""
    from hsenet_tpu.parallel.pipeline import make_pp_vlm_train_step
    from hsenet_tpu.train.vlm import (
        make_vlm_train_step,
        vlm_trainable_mask,
    )

    model, cfg = _tiny_vlm()
    mesh = create_mesh(MeshConfig(dp=2, pp=2, tp=1))
    rng = np.random.default_rng(0)
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

    pp_params = shard_params_pp(params, mesh)

    # deep-copy for the plain step: it donates its input state, and
    # device_put above ALIASES replicated leaves (REUSE_INPUT on CPU), so
    # donating the originals would delete pp_params' buffers too
    ref_state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    ref_step = make_vlm_train_step(model, tx, mesh=None, trainable_mask=mask)
    ref_state, ref_metrics = ref_step(ref_state, batch, key)
    # the VLM's vision tower has its own scanned `layers` — it must stay
    # replicated (only the LLM decoder stack is staged)
    tower_leaf = jax.tree.leaves(
        pp_params["params"]["vision_tower"]
    )[0]
    assert "pp" not in str(tower_leaf.sharding.spec)
    state = TrainState.create(pp_params, tx)
    step = make_pp_vlm_train_step(
        model, tx, mesh, n_micro=2, trainable_mask=mask
    )
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


def test_cli_train_vlm_pp(tmp_path):
    """End-to-end VLM finetune CLI over a dp=2 x pp=2 mesh."""
    from hsenet_tpu.cli.train_vlm import main as vlm

    out = str(tmp_path / "vlm_pp")
    state = vlm(
        [
            "--synthetic",
            "--task", "mrg",
            "--total-steps", "2",
            "--batch-size", "4",
            "--log-every", "1",
            "--checkpoint-every", "1",
            "--dtype", "float32",
            "--dp", "2", "--pp", "2", "--n-micro", "2",
            "--output-dir", out,
        ]
    )
    assert int(state.step) == 2
    layer_leaf = state.params["params"]["llm"]["decoder"]["layers"][
        "q_proj"
    ]["kernel"]
    assert "pp" in str(layer_leaf.sharding.spec)
    import os

    assert os.path.exists(f"{out}/vlm_deltas")

    # resume round-trip under pp: the saved projector+LoRA deltas restore
    # into a fresh pp-sharded run (sharding happens after the graft)
    out2 = str(tmp_path / "vlm_pp_resumed")
    state2 = vlm(
        [
            "--synthetic",
            "--task", "mrg",
            "--total-steps", "1",
            "--batch-size", "4",
            "--log-every", "1",
            "--checkpoint-every", "1000",
            "--dtype", "float32",
            "--dp", "2", "--pp", "2", "--n-micro", "2",
            "--output-dir", out2,
            "--resume-mllm", f"{out}/vlm_deltas",
        ]
    )
    assert int(state2.step) == 1

    # full-state --resume (step + optimizer moments) under pp: picks up at
    # step 2 from the first run's orbax checkpoints and trains to 3
    out3 = str(tmp_path / "vlm_pp_full_resume")
    state3 = vlm(
        [
            "--synthetic",
            "--task", "mrg",
            "--total-steps", "3",
            "--batch-size", "4",
            "--log-every", "1",
            "--checkpoint-every", "1000",
            "--dtype", "float32",
            "--dp", "2", "--pp", "2", "--n-micro", "2",
            "--output-dir", out3,
            "--resume", out,
        ]
    )
    assert int(state3.step) == 3
    layer_leaf3 = state3.params["params"]["llm"]["decoder"]["layers"][
        "q_proj"
    ]["kernel"]
    assert "pp" in str(layer_leaf3.sharding.spec)


def test_pp_requires_divisible_layers():
    mesh = create_mesh(MeshConfig(dp=1, pp=8, tp=1))
    model = Phi3ForCausalLM(TINY, dtype=jnp.float32)  # 4 layers, 8 stages
    with pytest.raises(AssertionError):
        make_pp_causal_lm_forward(model, mesh, n_micro=2)
