"""LoRA for flax Dense layers.

The reference applies peft LoRA (r=16, alpha=32) to every LLM linear layer
while freezing the base model (train_VLM.py:254-264,424-441). Here LoRA is a
drop-in Dense wrapper: the base kernel keeps the name "kernel" (so HF weight
conversion is unchanged) and the adapters live under "lora_a"/"lora_b".
Freezing is an optimizer mask (see `hsenet_tpu.train.train_state`), not
mutable requires_grad state.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hsenet_tpu.configs import LoRAConfig


class LoRADense(nn.Module):
    """Dense with optional LoRA adapters and optional int8 weight-only
    quantization (per-output-channel symmetric; the reference serves its
    base LLM 8-bit via bitsandbytes, train_VLM.py:376-380 — here the int8
    weights halve decode HBM traffic and dequantise on the fly)."""

    features: int
    use_bias: bool = False
    lora: Optional[LoRAConfig] = None
    dtype: Any = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        in_dim = x.shape[-1]
        if self.quantized:
            kernel_q = self.param(
                "kernel_q",
                nn.initializers.zeros,
                (in_dim, self.features),
                jnp.int8,
            )
            kernel_scale = self.param(
                "kernel_scale",
                nn.initializers.ones,
                (self.features,),
                jnp.float32,
            )
            y = jnp.dot(x, kernel_q.astype(self.dtype)) * kernel_scale.astype(
                self.dtype
            )
        else:
            kernel = self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (in_dim, self.features),
                jnp.float32,
            )
            y = jnp.dot(x, kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        if self.lora is not None:
            r = self.lora.rank
            a = self.param(
                "lora_a",
                nn.initializers.normal(stddev=1.0 / r),
                (in_dim, r),
                jnp.float32,
            )
            b = self.param(
                "lora_b", nn.initializers.zeros, (r, self.features), jnp.float32
            )
            h = x
            if self.lora.dropout_rate > 0:
                h = nn.Dropout(self.lora.dropout_rate)(
                    h, deterministic=deterministic
                )
            y = y + jnp.dot(jnp.dot(h, a.astype(self.dtype)), b.astype(self.dtype)) * self.lora.scale
        return y


def lora_trainable_mask(params, extra_trainable=()):
    """Boolean mask pytree: True for lora_a/lora_b leaves and any path
    containing one of `extra_trainable` substrings (e.g. 'projector')."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decide(path):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        s = "/".join(str(n) for n in names)
        if "lora_a" in s or "lora_b" in s:
            return True
        return any(t in s for t in extra_trainable)

    leaves, treedef = jax.tree_util.tree_flatten(params)
    paths = [p for p, _ in flat]
    mask_leaves = [decide(p) for p in paths]
    return jax.tree_util.tree_unflatten(treedef, mask_leaves)


def merge_lora(params, scale_map=None):
    """Fold LoRA adapters into base kernels for inference-time zero-cost LoRA.

    Walks the tree; wherever {kernel, lora_a, lora_b} coexist, returns
    kernel + lora_a @ lora_b * scale and drops the adapters.
    """

    def walk(node, scale):
        if isinstance(node, dict):
            if "kernel" in node and "lora_a" in node and "lora_b" in node:
                merged = dict(node)
                merged["kernel"] = (
                    node["kernel"] + node["lora_a"] @ node["lora_b"] * scale
                )
                del merged["lora_a"], merged["lora_b"]
                return merged
            return {k: walk(v, scale) for k, v in node.items()}
        return node

    scale = scale_map if scale_map is not None else 2.0  # alpha/r default 32/16
    return walk(params, scale)


def quantize_kernels_int8(params, target_names=(
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj",
)):
    """f32/bf16 kernels -> {kernel_q int8, kernel_scale} for the named
    projection modules (scanned stacks keep their leading layer axis).
    Produces the param tree a `quantized=True` model expects."""
    import numpy as np

    def walk(node, name=""):
        if isinstance(node, dict):
            if name in target_names and "kernel" in node:
                w = np.asarray(node["kernel"], np.float32)
                scale = np.abs(w).max(axis=-2, keepdims=True) / 127.0
                scale = np.maximum(scale, 1e-8)
                q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
                out = {
                    "kernel_q": q,
                    "kernel_scale": np.squeeze(scale, axis=-2),
                }
                for k, v in node.items():
                    if k != "kernel":
                        out[k] = v
                return out
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params)
