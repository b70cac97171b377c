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
    trees."""
    import jax

    leaves = jax.tree.leaves(tree)
    n = leaves[0].shape[0]
    return [jax.tree.map(lambda x: _np(x)[i], tree) for i in range(n)]


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
    """Fold LoRA adapters and dequantize int8 kernels, bottom-up."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        node = {k: walk(v) for k, v in node.items()}
        node = _dequant(node)
        if "kernel" in node and "lora_a" in node and "lora_b" in node:
            merged = dict(node)
            merged["kernel"] = _np(node["kernel"]) + _np(
                node["lora_a"]
            ) @ _np(node["lora_b"]) * lora_scale
            del merged["lora_a"], merged["lora_b"]
            return merged
        return node

    return walk(params)


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
