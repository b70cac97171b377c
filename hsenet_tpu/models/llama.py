"""Llama-3-style decoder (the reference's alternative LLM backbone,
`model/language_model/lamed_llama.py:15-239`, loaded 4-bit there;
bf16 here).

Llama differs from Phi3 only in layer-module layout (separate q/k/v and
gate/up in HF too, biasless, full rotary, untied head by default) — which is
exactly the TP-friendly layout `Phi3Decoder` already uses. So `LlamaForCausalLM`
is a thin configuration of the same decoder stack, plus its own HF weight
converter.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from hsenet_tpu.configs import LlamaConfig, Phi3Config
from hsenet_tpu.models.phi3 import Phi3ForCausalLM


def llama_as_phi3_config(cfg: LlamaConfig) -> Phi3Config:
    return Phi3Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_layers=cfg.num_layers,
        num_heads=cfg.num_heads,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta,
        partial_rotary_factor=1.0,  # Llama rotates the full head dim
        rms_norm_eps=cfg.rms_norm_eps,
        tie_word_embeddings=cfg.tie_word_embeddings,
        attention_bias=False,
        lora=cfg.lora,
        quant_int8=cfg.quant_int8,
        quant_int8_embed=cfg.quant_int8_embed,
    )


def LlamaForCausalLM(config: LlamaConfig, dtype: Any = jnp.bfloat16,
                     remat: bool = False, name=None) -> Phi3ForCausalLM:
    """Factory returning the shared decoder configured for Llama."""
    return Phi3ForCausalLM(
        llama_as_phi3_config(config), dtype=dtype, remat=remat, name=name
    )


def convert_hf_llama(state_dict, config: LlamaConfig):
    """HF torch `LlamaForCausalLM.state_dict()` -> flax params
    (q/k/v/gate/up already separate in HF Llama)."""
    import numpy as np

    def t(name):
        w = state_dict[name]
        try:
            w = w.detach().to("cpu").float().numpy()
        except AttributeError:
            w = np.asarray(w)
        return w

    def lin(prefix):
        return {"kernel": t(f"{prefix}.weight").T}

    def stack(trees):
        return jax.tree.map(lambda *xs: np.stack(xs), *trees)

    layers = []
    for i in range(config.num_layers):
        p = f"model.layers.{i}"
        layers.append(
            {
                "input_norm": {"scale": t(f"{p}.input_layernorm.weight")},
                "q_proj": lin(f"{p}.self_attn.q_proj"),
                "k_proj": lin(f"{p}.self_attn.k_proj"),
                "v_proj": lin(f"{p}.self_attn.v_proj"),
                "o_proj": lin(f"{p}.self_attn.o_proj"),
                "post_attn_norm": {
                    "scale": t(f"{p}.post_attention_layernorm.weight")
                },
                "gate_proj": lin(f"{p}.mlp.gate_proj"),
                "up_proj": lin(f"{p}.mlp.up_proj"),
                "down_proj": lin(f"{p}.mlp.down_proj"),
            }
        )

    params = {
        "embed": {"embedding": t("model.embed_tokens.weight")},
        "decoder": {
            "layers": stack(layers),
            "norm": {"scale": t("model.norm.weight")},
        },
    }
    if not config.tie_word_embeddings and "lm_head.weight" in state_dict:
        params["lm_head"] = lin("lm_head")
    return {"params": params}
