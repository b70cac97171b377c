"""int8 frozen-base LoRA finetune (the reference's QLoRA analog).

The reference finetunes its VLM with the LLM base quantized via
bitsandbytes ``load_in_4bit`` (train_VLM.py:372) — a memory-fit play.
Here the frozen base projections store int8 (per-output-channel scales,
``quantize_kernels_int8``) and LoRA adapters train on top: halved
frozen-weight HBM and weight streaming; int8 rather than int4 because
int4 storage measured strictly slower on v5e/XLA (BENCH.md round-3
probe). These tests pin (a) grad parity of the trainable leaves against
a dequantized-float run, (b) that training actually learns with the
int8 base, with the int8 leaves bit-frozen, and (c) the grad-accum
lax.scan path with int leaves in the param tree (float0 handling).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsenet_tpu.configs import (
    LoRAConfig,
    PackerConfig,
    Phi3Config,
    TrainConfig,
    ViT3DConfig,
    VLMConfig,
)
from hsenet_tpu.models.lora import quantize_kernels_int8
from hsenet_tpu.models.mllm import HSENetVLM
from hsenet_tpu.train.train_state import TrainState, make_optimizer
from hsenet_tpu.train.vlm import make_vlm_train_step, vlm_trainable_mask


def _tiny_cfg(quant: bool) -> VLMConfig:
    return VLMConfig(
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
            tie_word_embeddings=True, quant_int8=quant,
            lora=LoRAConfig(rank=4, alpha=8, dropout_rate=0.0),
        ),
    )


def _batch(rng, b=2, seq=16, n_img=8):
    ids = rng.integers(3, 64, (b, seq))
    ids[:, 0] = 1
    labels = ids.astype(np.int64).copy()
    labels[:, : n_img + 2] = -100
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "attention_mask": jnp.ones((b, seq), jnp.int32),
        "image": jnp.asarray(rng.random((b, 1, 4, 16, 16), np.float32)),
        "image_2d": jnp.asarray(rng.random((b, 2, 16), np.float32)),
    }


def _init_quantized(batch):
    """Init the float model, quantize its llm subtree, return
    (quant_params, dequant_float_params) sharing identical numerics up to
    matmul-order: quant computes dot(x, q)·scale, float dot(x, q·scale)."""
    import flax

    float_model = HSENetVLM(_tiny_cfg(quant=False), dtype=jnp.float32)
    params = flax.core.unfreeze(
        float_model.init(
            jax.random.PRNGKey(0), batch["input_ids"], batch["image"],
            batch["image_2d"],
        )
    )
    qtree = quantize_kernels_int8(
        jax.tree.map(np.asarray, params["params"]["llm"])
    )

    def dequant(node):
        if isinstance(node, dict):
            if "kernel_q" in node:
                out = {
                    k: v for k, v in node.items()
                    if k not in ("kernel_q", "kernel_scale")
                }
                # scale is per-output-channel: (..., out) against a
                # (..., in, out) kernel — broadcast over the input dim
                out["kernel"] = (
                    node["kernel_q"].astype(np.float32)
                    * node["kernel_scale"][..., None, :]
                )
                return out
            return {k: dequant(v) for k, v in node.items()}
        return node

    # return HOST (numpy) trees: the train step donates its state, so
    # each test arm must materialize fresh device buffers via
    # jax.tree.map(jnp.asarray, ...) — reusing donated jnp leaves raises
    # "Array has been deleted"
    qparams = {"params": dict(params["params"], llm=qtree)}
    fparams = {"params": dict(params["params"], llm=dequant(qtree))}
    return (
        jax.tree.map(np.asarray, qparams),
        jax.tree.map(np.asarray, fparams),
    )


def test_int8_base_matches_dequant_float_training():
    """10 train steps with the int8 base track the dequantized-float run:
    same loss curve, same trained lora_b (tolerance = matmul-order only)."""
    rng = np.random.default_rng(1)
    batch = _batch(rng)
    qparams, fparams = _init_quantized(batch)
    tcfg = TrainConfig(
        total_steps=10, learning_rate=1e-3, schedule="constant"
    )
    results = {}
    for name, quant, host_params in (
        ("quant", True, qparams), ("float", False, fparams)
    ):
        params = jax.tree.map(jnp.asarray, host_params)
        model = HSENetVLM(_tiny_cfg(quant=quant), dtype=jnp.float32)
        mask = vlm_trainable_mask(params)
        tx = make_optimizer(tcfg, trainable_mask=mask)
        state = TrainState.create(params, tx)
        step = make_vlm_train_step(model, tx, trainable_mask=mask)
        losses = []
        for _ in range(10):
            state, metrics = step(state, batch, jax.random.PRNGKey(7))
            losses.append(float(metrics["loss"]))
        results[name] = (
            losses,
            np.asarray(
                state.params["params"]["llm"]["decoder"]["layers"][
                    "q_proj"
                ]["lora_b"]
            ),
        )
    np.testing.assert_allclose(
        results["quant"][0], results["float"][0], rtol=2e-4
    )
    np.testing.assert_allclose(
        results["quant"][1], results["float"][1], rtol=5e-3, atol=1e-6
    )


def test_int8_base_overfit_learns_and_base_bitfrozen():
    """The QLoRA-style finetune actually learns (answer tokens argmax-
    correct, loss halves) while kernel_q / kernel_scale stay bit-frozen."""
    rng = np.random.default_rng(2)
    batch = _batch(rng)
    qparams, _ = _init_quantized(batch)
    layers = qparams["params"]["llm"]["decoder"]["layers"]
    kq0 = np.asarray(layers["q_proj"]["kernel_q"]).copy()
    ks0 = np.asarray(layers["q_proj"]["kernel_scale"]).copy()
    b0 = np.asarray(layers["q_proj"]["lora_b"]).copy()
    assert kq0.dtype == np.int8

    model = HSENetVLM(_tiny_cfg(quant=True), dtype=jnp.float32)
    params = jax.tree.map(jnp.asarray, qparams)
    mask = vlm_trainable_mask(params)
    tx = make_optimizer(
        TrainConfig(total_steps=200, learning_rate=5e-3,
                    schedule="constant"),
        trainable_mask=mask,
    )
    state = TrainState.create(params, tx)
    step = make_vlm_train_step(model, tx, trainable_mask=mask)
    first_loss, acc = None, 0.0
    for _ in range(200):
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        if first_loss is None:
            first_loss = float(metrics["loss"])
        acc = float(metrics["token_acc"])
        if acc == 1.0 and float(metrics["loss"]) < 0.5 * first_loss:
            break
    assert acc == 1.0, (first_loss, float(metrics["loss"]), acc)
    assert float(metrics["loss"]) < 0.5 * first_loss
    layers1 = state.params["params"]["llm"]["decoder"]["layers"]
    np.testing.assert_array_equal(kq0, np.asarray(layers1["q_proj"]["kernel_q"]))
    np.testing.assert_array_equal(ks0, np.asarray(layers1["q_proj"]["kernel_scale"]))
    assert not np.array_equal(b0, np.asarray(layers1["q_proj"]["lora_b"]))


def test_int8_base_grad_accum_matches_full_batch():
    """grad_accum=2 over a 4-row batch equals one accum=1 step on the same
    batch (the lax.scan carry must survive int8 leaves via f32-scalar
    placeholders — the float0 path)."""
    rng = np.random.default_rng(3)
    batch = _batch(rng, b=4)
    qparams, _ = _init_quantized(batch)
    tcfg = TrainConfig(
        total_steps=4, learning_rate=1e-3, schedule="constant"
    )
    model = HSENetVLM(_tiny_cfg(quant=True), dtype=jnp.float32)
    outs = {}
    for accum in (1, 2):
        params = jax.tree.map(jnp.asarray, qparams)
        mask = vlm_trainable_mask(params)
        tx = make_optimizer(tcfg, trainable_mask=mask)
        state = TrainState.create(params, tx)
        step = make_vlm_train_step(
            model, tx, trainable_mask=mask, grad_accum=accum
        )
        state, metrics = step(state, batch, jax.random.PRNGKey(9))
        outs[accum] = (
            float(metrics["loss"]),
            np.asarray(
                state.params["params"]["llm"]["decoder"]["layers"][
                    "q_proj"
                ]["lora_b"]
            ),
        )
    # microbatch CE means != full-batch CE when per-row token counts
    # differ; with the synthetic batch they match up to fp reduction
    # order (measured ~2e-5 rel)
    np.testing.assert_allclose(outs[1][0], outs[2][0], rtol=2e-4)
    np.testing.assert_allclose(outs[1][1], outs[2][1], rtol=1e-4, atol=1e-7)


def test_cli_train_vlm_int8_base_pp(tmp_path):
    """--int8-base composes with pipeline parallelism: the GPipe step
    carries the frozen int8 stack through the ppermute ring (dp2 x pp2
    on the CPU mesh; fsdp/tp covered by the production AOT rehearsals)."""
    from hsenet_tpu.cli.train_vlm import main as vlm

    out = str(tmp_path / "i8b_pp")
    state = vlm(
        [
            "--synthetic", "--task", "mrg", "--total-steps", "2",
            "--batch-size", "4", "--log-every", "1",
            "--checkpoint-every", "1000", "--dtype", "float32",
            "--dp", "2", "--pp", "2", "--int8-base", "--output-dir", out,
        ]
    )
    assert int(state.step) == 2
    layers = jax.device_get(state.params)["params"]["llm"]["decoder"][
        "layers"
    ]
    assert layers["q_proj"]["kernel_q"].dtype == np.int8


def test_checkpoint_roundtrip_int8_leaves(tmp_path):
    """Orbax save/restore must round-trip the int8 base bit-exactly
    (resume of an --int8-base run restores kernel_q/kernel_scale)."""
    from hsenet_tpu.train.train_state import TrainState
    from hsenet_tpu.utils.checkpoint import CheckpointManager

    rng = np.random.default_rng(7)
    batch = _batch(rng)
    qparams, _ = _init_quantized(batch)
    params = jax.tree.map(jnp.asarray, qparams)
    mask = vlm_trainable_mask(params)
    tx = make_optimizer(
        TrainConfig(total_steps=5, learning_rate=1e-3,
                    schedule="constant"),
        trainable_mask=mask,
    )
    state = TrainState.create(params, tx)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state)
    mgr.wait()
    template = TrainState.create(jax.tree.map(jnp.asarray, qparams), tx)
    restored = mgr.restore(template)
    kq = restored.params["params"]["llm"]["decoder"]["layers"]["q_proj"][
        "kernel_q"
    ]
    assert np.asarray(kq).dtype == np.int8
    np.testing.assert_array_equal(
        np.asarray(kq),
        np.asarray(
            qparams["params"]["llm"]["decoder"]["layers"]["q_proj"][
                "kernel_q"
            ]
        ),
    )


def test_cli_train_vlm_int8_base(tmp_path):
    """--int8-base end to end: CLI builds, quantizes, trains, exports."""
    import os

    from hsenet_tpu.cli.train_vlm import main as vlm

    out = str(tmp_path / "int8b")
    state = vlm(
        [
            "--synthetic", "--task", "mrg", "--total-steps", "2",
            "--batch-size", "2", "--log-every", "1",
            "--checkpoint-every", "1000", "--dtype", "float32",
            "--dp", "1", "--int8-base", "--output-dir", out,
        ]
    )
    assert int(state.step) == 2
    layers = jax.device_get(state.params)["params"]["llm"]["decoder"][
        "layers"
    ]
    assert layers["q_proj"]["kernel_q"].dtype == np.int8
    assert "kernel" not in layers["q_proj"]
    assert os.path.exists(f"{out}/vlm_deltas")
