"""Reverse checkpoint conversion: hsenet-tpu params -> PyTorch state dicts.

The inverse of `utils/convert.py` + the per-model `convert_hf_*`
functions: export TPU-trained weights back into the key layouts the
reference stack consumes, so a reference user can round-trip — convert
their checkpoints in, finetune here, and take the result back to their
torch harnesses (HF `from_pretrained`-style loading, the reference's
eval scripts, or downstream peft-free serving).

Exports are plain `{name: np.ndarray}` dicts (row-major torch layout,
kernels transposed back); wrap with `to_torch_state_dict` to get torch
tensors for `torch.save` / `load_state_dict`.

LoRA: adapters are FOLDED into the base kernels before export
(`models/lora.py::merge_lora`) — the exported model is the merged full
model, loadable without peft. int8-quantized trees are dequantized
exactly (kernel = kernel_q * kernel_scale; same product the quantized
matmul computes).

Reference layouts reproduced:
  * HF Phi3: fused qkv_proj / gate_up_proj per layer
    (inverse of `models/phi3.py::convert_hf_phi3`);
  * HF Llama: separate q/k/v/gate/up (inverse of
    `models/llama.py::convert_hf_llama`);
  * MONAI-style ViT tower + VisualPacker: the stage-1/2 CLIP checkpoint
    keys (inverse of `convert_reference_vit` / `convert_reference_packer`;
    key facts documented in utils/convert.py's module docstring).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(x):
    return np.asarray(x, dtype=np.float32)


def _unstack(tree):
    """Split a scanned-stack subtree (leading layer axis) into per-layer
    trees (one f32 conversion of each stack, then views)."""
    import jax

    tree = jax.tree.map(_np, tree)
    n = jax.tree.leaves(tree)[0].shape[0]
    return [jax.tree.map(lambda x: x[i], tree) for i in range(n)]


def _dequant(node: Dict) -> Dict:
    """{kernel_q int8, kernel_scale (F,)} -> {kernel f32} (exact: the same
    product the quantized matmul computes). Leaves float kernels alone."""
    if "kernel_q" in node:
        out = {
            k: v for k, v in node.items()
            if k not in ("kernel_q", "kernel_scale")
        }
        # scale is (F,) per layer or (L, F) for a scanned stack
        out["kernel"] = (
            _np(node["kernel_q"]) * _np(node["kernel_scale"])[..., None, :]
        )
        return out
    return node


def _merge_and_dequant(params: Dict, lora_scale) -> Dict:
    """Dequantize int8 kernels bottom-up, then fold LoRA adapters via the
    canonical `models/lora.py::merge_lora` (single source of the merge
    semantics)."""
    from hsenet_tpu.models.lora import merge_lora

    def walk(node):
        if not isinstance(node, dict):
            return node
        return _dequant({k: walk(v) for k, v in node.items()})

    return merge_lora(walk(params), scale_map=lora_scale)


def _embed_table(params: Dict) -> np.ndarray:
    """Embedding table, dequantizing a `QuantEmbed` tree if present."""
    emb = params["embed"]
    if "embedding_q" in emb:
        return _np(emb["embedding_q"]) * _np(emb["scale"])[:, None]
    return _np(emb["embedding"])


def _lin(sd: Dict, name: str, node: Dict) -> None:
    sd[f"{name}.weight"] = _np(node["kernel"]).T
    if "bias" in node:
        sd[f"{name}.bias"] = _np(node["bias"])


def _ln(sd: Dict, name: str, node: Dict) -> None:
    sd[f"{name}.weight"] = _np(node["scale"])
    if "bias" in node:
        sd[f"{name}.bias"] = _np(node["bias"])


def export_hf_phi3(params: Dict, config) -> Dict[str, np.ndarray]:
    """flax `Phi3ForCausalLM` params -> HF Phi3 state-dict arrays
    (fused qkv_proj / gate_up_proj, per-layer keys). LoRA folded,
    int8 dequantized."""
    params = params.get("params", params)
    scale = config.lora.scale if config.lora is not None else 2.0
    params = _merge_and_dequant(params, scale)
    sd: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": _embed_table(params),
        "model.norm.weight": _np(params["decoder"]["norm"]["scale"]),
    }
    for i, layer in enumerate(_unstack(params["decoder"]["layers"])):
        p = f"model.layers.{i}"
        qkv = np.concatenate(
            [
                layer["q_proj"]["kernel"],
                layer["k_proj"]["kernel"],
                layer["v_proj"]["kernel"],
            ],
            axis=1,
        )
        sd[f"{p}.self_attn.qkv_proj.weight"] = qkv.T
        _lin(sd, f"{p}.self_attn.o_proj", layer["o_proj"])
        gate_up = np.concatenate(
            [layer["gate_proj"]["kernel"], layer["up_proj"]["kernel"]],
            axis=1,
        )
        sd[f"{p}.mlp.gate_up_proj.weight"] = gate_up.T
        _lin(sd, f"{p}.mlp.down_proj", layer["down_proj"])
        sd[f"{p}.input_layernorm.weight"] = _np(layer["input_norm"]["scale"])
        sd[f"{p}.post_attention_layernorm.weight"] = _np(
            layer["post_attn_norm"]["scale"]
        )
    if "lm_head" in params:  # present only for untied checkpoints
        _lin(sd, "lm_head", params["lm_head"])
    return sd


def export_hf_llama(params: Dict, config) -> Dict[str, np.ndarray]:
    """flax Llama-as-Phi3 params -> HF Llama state-dict arrays
    (separate q/k/v/gate/up). LoRA folded, int8 dequantized."""
    params = params.get("params", params)
    scale = config.lora.scale if config.lora is not None else 2.0
    params = _merge_and_dequant(params, scale)
    sd: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": _embed_table(params),
        "model.norm.weight": _np(params["decoder"]["norm"]["scale"]),
    }
    names = {
        "q_proj": "self_attn.q_proj",
        "k_proj": "self_attn.k_proj",
        "v_proj": "self_attn.v_proj",
        "o_proj": "self_attn.o_proj",
        "gate_proj": "mlp.gate_proj",
        "up_proj": "mlp.up_proj",
        "down_proj": "mlp.down_proj",
    }
    for i, layer in enumerate(_unstack(params["decoder"]["layers"])):
        p = f"model.layers.{i}"
        for ours, theirs in names.items():
            _lin(sd, f"{p}.{theirs}", layer[ours])
        sd[f"{p}.input_layernorm.weight"] = _np(layer["input_norm"]["scale"])
        sd[f"{p}.post_attention_layernorm.weight"] = _np(
            layer["post_attn_norm"]["scale"]
        )
    if "lm_head" in params:  # present only for untied checkpoints
        _lin(sd, "lm_head", params["lm_head"])
    return sd


def export_reference_vit(
    params: Dict, prefix: str = "", slice_guided: bool = False
) -> Dict[str, np.ndarray]:
    """`ViT3D` params -> MONAI-style tower state-dict arrays (the stage-1/2
    CLIP checkpoint vision keys; inverse of `convert_reference_vit`)."""
    params = params.get("params", params)

    def k(name):
        return f"{prefix}{name}"

    sd: Dict[str, np.ndarray] = {}
    _lin(sd, k("patch_embedding.patch_embeddings.1"),
         params["patch_embed"]["proj"])
    sd[k("patch_embedding.position_embeddings")] = _np(
        params["patch_embed"]["pos_embed"]
    )
    sd[k("cls_token")] = _np(params["cls_token"])
    for i, block in enumerate(_unstack(params["tower"]["blocks"])):
        b = k(f"blocks.{i}")
        _ln(sd, f"{b}.norm1", block["norm1"])
        _lin(sd, f"{b}.attn.qkv", block["attn"]["qkv"])
        _lin(sd, f"{b}.attn.out_proj", block["attn"]["out_proj"])
        _ln(sd, f"{b}.norm2", block["norm2"])
        _lin(sd, f"{b}.mlp.linear1", block["mlp"]["fc1"])
        _lin(sd, f"{b}.mlp.linear2", block["mlp"]["fc2"])
    _ln(sd, k("norm"), params["tower"]["norm"])
    if slice_guided:
        sga = params["slice_guided_attention"]
        base = k("slice_guided_attention")
        _lin(sd, f"{base}.Wq", sga["wq"])
        _lin(sd, f"{base}.Wk", sga["wk"])
        _lin(sd, f"{base}.Wv", sga["wv"])
        _lin(sd, f"{base}.output_linear", sga["out_proj"])
        _ln(sd, f"{base}.norm", sga["norm"])
        _lin(sd, k("patch_score_proj"), params["patch_score_proj"])
    return sd


def export_reference_packer(
    params: Dict, prefix: str = "mm_projector."
) -> Dict[str, np.ndarray]:
    """`VisualPacker` params -> `VisualPacker_3d_phi_v3` state-dict arrays
    (inverse of `convert_reference_packer`)."""
    params = params.get("params", params)

    def k(name):
        return f"{prefix}{name}"

    ra = params["resolution_attention"]
    sd: Dict[str, np.ndarray] = {}
    _lin(sd, k("resolution_attention.Wq"), ra["wq"])
    _lin(sd, k("resolution_attention.Wk"), ra["wk"])
    _lin(sd, k("resolution_attention.Wv"), ra["wv"])
    _lin(sd, k("resolution_attention.output_linear"), ra["out_proj"])
    _ln(sd, k("resolution_attention.norm"), ra["norm"])
    _lin(sd, k("proj_mpls.0"), params["proj_fc1"])
    _lin(sd, k("proj_mpls.2"), params["proj_fc2"])
    return sd


def to_torch_state_dict(sd: Dict[str, np.ndarray]):
    """numpy export -> {name: torch.Tensor} for torch.save /
    load_state_dict."""
    import torch

    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}


def export_reference_vlm_deltas(
    vlm_params: Dict,
    prefix: str = "base_model.model.model.",
) -> Dict[str, np.ndarray]:
    """HSENetVLM params -> the reference's VLM-delta file contents
    (`LaMedTrainer._save`, lamed_trainer.py:20-24: every named parameter
    containing 'mm_projector' or 'lora', peft naming).

    The reference applies peft to the FUSED HF modules (qkv_proj,
    gate_up_proj — find_all_linear_names, eval_HSENet_CT_Rate_MRG.py:198),
    while this repo adapts q/k/v separately. The export fuses them
    EXACTLY via block-diagonal composition: for qkv,
        lora_A' = [A_q; A_k; A_v]            (3r, hidden)
        lora_B' = blockdiag(B_q, B_k, B_v)   (q+2kv, 3r)
    so B'A'x == concat(B_q A_q x, B_k A_k x, B_v A_v x) — the same delta,
    at rank 3r (2r for gate_up). peft's per-module scaling alpha/rank
    would then shrink by the rank ratio, so that ratio is pre-baked into
    lora_B'; load with
        LoraConfig(r=R, lora_alpha=ALPHA,
                   rank_pattern={"qkv_proj": 3*R, "gate_up_proj": 2*R})
    and `model.load_state_dict(deltas, strict=False)` reproduces this
    model's LoRA deltas exactly.
    """
    params = vlm_params.get("params", vlm_params)
    sd: Dict[str, np.ndarray] = {}

    # --- projectors (packer torch names under the peft prefix) ---------
    sd.update(
        export_reference_packer(
            params["mm_projector"], prefix=f"{prefix}mm_projector."
        )
    )
    if "mm_projector2" in params:
        sd.update(
            export_reference_packer(
                params["mm_projector2"], prefix=f"{prefix}mm_projector2."
            )
        )

    # --- LoRA adapters, re-fused onto the HF module layout -------------
    layers = _unstack(params["llm"]["decoder"]["layers"])

    def a_t(layer, name):  # peft lora_A.weight layout: (r, in)
        return _np(layer[name]["lora_a"]).T

    def b_t(layer, name):  # peft lora_B.weight layout: (out, r)
        return _np(layer[name]["lora_b"]).T

    def blockdiag(mats):
        rows = sum(m.shape[0] for m in mats)
        cols = sum(m.shape[1] for m in mats)
        out = np.zeros((rows, cols), np.float32)
        r0 = c0 = 0
        for m in mats:
            out[r0 : r0 + m.shape[0], c0 : c0 + m.shape[1]] = m
            r0 += m.shape[0]
            c0 += m.shape[1]
        return out

    for i, layer in enumerate(layers):
        if "lora_a" not in layer.get("q_proj", {}):
            continue  # base LLM trained without adapters
        p = f"{prefix}layers.{i}"
        # qkv: rank 3r, scale compensation r'/r = 3 baked into B'
        sd[f"{p}.self_attn.qkv_proj.lora_A.default.weight"] = (
            np.concatenate(
                [a_t(layer, "q_proj"), a_t(layer, "k_proj"),
                 a_t(layer, "v_proj")], axis=0,
            )
        )
        sd[f"{p}.self_attn.qkv_proj.lora_B.default.weight"] = 3.0 * blockdiag(
            [b_t(layer, "q_proj"), b_t(layer, "k_proj"),
             b_t(layer, "v_proj")]
        )
        # gate_up: rank 2r, compensation 2
        sd[f"{p}.mlp.gate_up_proj.lora_A.default.weight"] = np.concatenate(
            [a_t(layer, "gate_proj"), a_t(layer, "up_proj")], axis=0
        )
        sd[f"{p}.mlp.gate_up_proj.lora_B.default.weight"] = 2.0 * blockdiag(
            [b_t(layer, "gate_proj"), b_t(layer, "up_proj")]
        )
        # 1:1 modules
        sd[f"{p}.self_attn.o_proj.lora_A.default.weight"] = a_t(
            layer, "o_proj"
        )
        sd[f"{p}.self_attn.o_proj.lora_B.default.weight"] = b_t(
            layer, "o_proj"
        )
        sd[f"{p}.mlp.down_proj.lora_A.default.weight"] = a_t(
            layer, "down_proj"
        )
        sd[f"{p}.mlp.down_proj.lora_B.default.weight"] = b_t(
            layer, "down_proj"
        )
    return sd
