"""Reverse converters: flax params -> torch-layout state dicts and back.

Round-trip through the FORWARD converters (the golden-tested import path)
pins the export layouts: export(params) must reconvert to the identical
tree, and merged-LoRA / dequantized-int8 exports must preserve the
model's function (logit equality).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsenet_tpu.configs import LoRAConfig, Phi3Config
from hsenet_tpu.models.phi3 import Phi3ForCausalLM, convert_hf_phi3
from hsenet_tpu.utils.export_hf import (
    export_hf_llama,
    export_hf_phi3,
    export_reference_packer,
    export_reference_vit,
    to_torch_state_dict,
)

TINY = Phi3Config(
    vocab_size=64,
    hidden_size=32,
    intermediate_size=48,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    tie_word_embeddings=False,
)


def _randomize(params, rng):
    return jax.tree.map(
        lambda x: np.asarray(
            rng.standard_normal(x.shape) * 0.05, np.float32
        ),
        jax.device_get(params),
    )


def _assert_tree_equal(a, b, atol=1e-6):
    flat_a = jax.tree_util.tree_flatten_with_path(a)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(b)[0])
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), atol=atol,
            err_msg=str(path),
        )


def test_phi3_export_roundtrip(key):
    model = Phi3ForCausalLM(TINY, dtype=jnp.float32)
    params = model.init(key, jnp.zeros((1, 8), jnp.int32))
    params = jax.tree.map(np.asarray, jax.device_get(params))
    rng = np.random.default_rng(0)
    params = {"params": _randomize(params["params"], rng)}

    sd = export_hf_phi3(params, TINY)
    back = convert_hf_phi3(sd, TINY)
    _assert_tree_equal(params, back)

    # torch wrapper produces tensors with the same values
    tsd = to_torch_state_dict(sd)
    np.testing.assert_allclose(
        tsd["model.embed_tokens.weight"].numpy(),
        sd["model.embed_tokens.weight"],
    )


def test_llama_export_roundtrip(key):
    from hsenet_tpu.configs import LlamaConfig
    from hsenet_tpu.models.llama import (
        LlamaForCausalLM,
        convert_hf_llama,
        llama_as_phi3_config,
    )

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg, dtype=jnp.float32)
    params = model.init(key, jnp.zeros((1, 8), jnp.int32))
    rng = np.random.default_rng(1)
    params = {"params": _randomize(params["params"], rng)}

    sd = export_hf_llama(params, cfg)
    back = convert_hf_llama(sd, cfg)
    _assert_tree_equal(params, back)
    # the phi3-view config maps onto the same tree
    assert llama_as_phi3_config(cfg).num_layers == cfg.num_layers


def test_phi3_export_merges_lora(key):
    """Exporting a LoRA-finetuned model folds the adapters: the exported
    merged model's logits equal the adapter model's logits."""
    cfg_lora = Phi3Config(
        **{**TINY.__dict__, "lora": LoRAConfig(rank=2, alpha=4,
                                               dropout_rate=0.0)}
    )
    model = Phi3ForCausalLM(cfg_lora, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 64, (2, 8)))
    params = jax.device_get(model.init(key, ids))
    # nonzero adapters (init makes lora_b zeros -> merge would be a no-op)
    rng = np.random.default_rng(3)

    def fill_lora(path, x):
        name = str(path[-2].key) if len(path) >= 2 else ""
        if name in ("lora_a", "lora_b"):
            return np.asarray(rng.standard_normal(x.shape) * 0.1, np.float32)
        return np.asarray(x)

    params = {
        "params": jax.tree_util.tree_map_with_path(
            fill_lora, params["params"]
        )
    }
    logits_adapter, _ = model.apply(params, ids)

    sd = export_hf_phi3(params, cfg_lora)
    assert not any("lora" in k for k in sd)
    back = convert_hf_phi3(sd, TINY)
    merged_model = Phi3ForCausalLM(TINY, dtype=jnp.float32)
    logits_merged, _ = merged_model.apply(back, ids)
    np.testing.assert_allclose(
        np.asarray(logits_adapter), np.asarray(logits_merged), atol=1e-4
    )


def test_phi3_export_dequantizes_int8(key):
    """An int8-serving tree exports as the exact dequantized kernels (the
    same product the quantized matmul computes)."""
    from hsenet_tpu.models.lora import (
        quantize_embed_int8,
        quantize_kernels_int8,
    )

    model = Phi3ForCausalLM(TINY, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(4).integers(0, 64, (1, 8)))
    params = jax.device_get(model.init(key, ids))
    rng = np.random.default_rng(5)
    params = {"params": _randomize(params["params"], rng)}

    qcfg = Phi3Config(
        **{**TINY.__dict__, "quant_int8": True, "quant_int8_embed": True}
    )
    qparams = {
        "params": quantize_embed_int8(
            quantize_kernels_int8(params["params"])
        )
    }
    qmodel = Phi3ForCausalLM(qcfg, dtype=jnp.float32)
    logits_q, _ = qmodel.apply(qparams, ids)

    sd = export_hf_phi3(qparams, qcfg)
    assert not any("kernel_q" in k or "_q." in k for k in sd)
    back = convert_hf_phi3(sd, TINY)
    logits_deq, _ = model.apply(back, ids)
    np.testing.assert_allclose(
        np.asarray(logits_q), np.asarray(logits_deq), atol=1e-4
    )


def test_vit_export_roundtrip(key):
    from hsenet_tpu.configs import ViT3DConfig
    from hsenet_tpu.models.vit import ViT3D
    from hsenet_tpu.utils.convert import convert_reference_vit

    cfg = ViT3DConfig(
        image_size=(4, 16, 16), patch_size=(2, 8, 8), hidden_size=16,
        mlp_dim=32, num_layers=2, num_heads=2, num_slices=2,
        slice_feature_dim=16, slice_guided=True,
    )
    model = ViT3D(cfg, dtype=jnp.float32)
    vol = jnp.zeros((1, 1, 4, 16, 16), jnp.float32)
    sl = jnp.zeros((1, 2, 16), jnp.float32)
    params = jax.device_get(model.init(key, vol, sl))
    rng = np.random.default_rng(6)
    params = {"params": _randomize(params["params"], rng)}

    sd = export_reference_vit(
        params, prefix="vision_encoder.", slice_guided=True
    )
    back = convert_reference_vit(
        sd, num_layers=2, prefix="vision_encoder.", slice_guided=True
    )
    _assert_tree_equal(params["params"], back)


def test_packer_export_roundtrip(key):
    from hsenet_tpu.configs import PackerConfig
    from hsenet_tpu.models.projector import VisualPacker
    from hsenet_tpu.utils.convert import convert_reference_packer

    cfg = PackerConfig(
        grid=(4, 4, 4), kernel=(1, 2, 2), in_dim=16, out_dim=32,
        dropout_rate=0.0,
    )
    model = VisualPacker(cfg, dtype=jnp.float32)
    feats = jnp.zeros((1, 64, 16), jnp.float32)
    params = jax.device_get(model.init(key, feats))
    rng = np.random.default_rng(7)
    params = {"params": _randomize(params["params"], rng)}

    sd = export_reference_packer(params)
    back = convert_reference_packer(sd)
    _assert_tree_equal(params["params"], back)


def test_vlm_deltas_export_peft_fusion(key):
    """The block-diagonal qkv/gate_up adapter fusion is EXACT: peft-style
    fused compute (scale alpha/rank', rank'=3r with the baked ratio)
    reproduces our per-projection LoRA deltas; projector keys carry the
    reference's mm_projector naming (LaMedTrainer._save filter)."""
    import dataclasses

    from hsenet_tpu.configs import PackerConfig, ViT3DConfig, VLMConfig
    from hsenet_tpu.models.mllm import HSENetVLM
    from hsenet_tpu.utils.export_hf import export_reference_vlm_deltas

    llm = dataclasses.replace(
        TINY, lora=LoRAConfig(rank=2, alpha=4, dropout_rate=0.0)
    )
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
        llm=llm,
    )
    model = HSENetVLM(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(8)
    ids = jnp.asarray(rng.integers(3, 64, (1, 1 + cfg.num_image_tokens + 4)))
    vol = jnp.asarray(rng.random((1, 1, 4, 16, 16), np.float32))
    sl = jnp.asarray(rng.random((1, 2, 16), np.float32))
    params = jax.device_get(model.init(key, ids, vol, sl))

    def fill_lora(path, x):
        name = str(path[-2].key) if len(path) >= 2 else ""
        if name in ("lora_a", "lora_b"):
            return np.asarray(rng.standard_normal(x.shape) * 0.1, np.float32)
        return np.asarray(x)

    params = {
        "params": jax.tree_util.tree_map_with_path(
            fill_lora, params["params"]
        )
    }
    sd = export_reference_vlm_deltas(params)

    # _save filter parity: every key contains mm_projector or lora
    assert sd and all(("mm_projector" in k) or ("lora" in k) for k in sd)
    assert any(k.startswith("base_model.model.model.mm_projector.") for k in sd)
    assert any(k.startswith("base_model.model.model.mm_projector2.") for k in sd)

    # exactness: fused peft compute == our per-proj deltas (layer 0, qkv)
    layer0 = jax.tree.map(
        lambda x: np.asarray(x)[0], params["params"]["llm"]["decoder"]["layers"]
    )
    x = rng.standard_normal((3, TINY.hidden_size)).astype(np.float32)
    scale = llm.lora.scale  # alpha / r
    ours = np.concatenate(
        [
            x @ layer0[n]["lora_a"] @ layer0[n]["lora_b"] * scale
            for n in ("q_proj", "k_proj", "v_proj")
        ],
        axis=-1,
    )
    A = sd["base_model.model.model.layers.0.self_attn.qkv_proj.lora_A.default.weight"]
    B = sd["base_model.model.model.layers.0.self_attn.qkv_proj.lora_B.default.weight"]
    peft_scale = llm.lora.alpha / (3 * llm.lora.rank)  # rank_pattern 3r
    fused = (x @ A.T @ B.T) * peft_scale
    np.testing.assert_allclose(ours, fused, atol=1e-5)

    # gate_up fusion too
    ours_gu = np.concatenate(
        [
            x @ layer0[n]["lora_a"] @ layer0[n]["lora_b"] * scale
            for n in ("gate_proj", "up_proj")
        ],
        axis=-1,
    )
    Ag = sd["base_model.model.model.layers.0.mlp.gate_up_proj.lora_A.default.weight"]
    Bg = sd["base_model.model.model.layers.0.mlp.gate_up_proj.lora_B.default.weight"]
    fused_gu = (x @ Ag.T @ Bg.T) * (llm.lora.alpha / (2 * llm.lora.rank))
    np.testing.assert_allclose(ours_gu, fused_gu, atol=1e-5)
