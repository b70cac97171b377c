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
            # Plain XLA dequant-matmul. Measured (BENCH.md): inside the
            # scanned decode stack XLA streams the scan-sliced int8 weights
            # at ~698 GB/s (85% of HBM peak) — swapping in the Pallas matvec
            # (ops/quant_matvec.py) here REGRESSED decode 161 -> 116 tok/s
            # because the opaque pallas_call forces the per-layer weight
            # slice to materialize and breaks XLA's cross-iteration
            # prefetch pipelining.
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


class DenseW8A8(nn.Module):
    """int8 x int8 -> int32 MXU dense for compute-bound inference serving.

    The v5e MXU runs int8 matmuls at ~2x bf16 throughput (measured 366 vs
    187 T/s, BENCH.md). Weights carry static per-output-channel scales
    (same `kernel_q`/`kernel_scale` layout as `LoRADense(quantized=True)`,
    so `quantize_kernels_int8` converts both); activations are quantized
    dynamically per token (absmax row scale), which keeps the rescale exact:
    y = (xq @ wq) * row_scale * col_scale. Used by the ViT encode towers
    under `ViT3DConfig(quant_w8a8=True)` — a serving mode; training and
    parity evals stay bf16.

    `static_act_scale=True` replaces the per-token absmax reduction with a
    calibrated per-layer scalar (`act_scale`, stores the calibrated absmax):
    the VPU reduction over every activation row is the most expensive part
    of the quantize glue (isolated MLP block: dynamic 1.38 ms vs static
    1.24 ms, BENCH.md). Out-of-range activations clip at +-127. Calibrate
    with `calibrate_w8a8_act_scales` (runs representative batches, sows the
    running absmax per layer, writes it into the params)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    static_act_scale: bool = False

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        wq = self.param(
            "kernel_q", nn.initializers.zeros, (in_dim, self.features),
            jnp.int8,
        )
        wscale = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,),
            jnp.float32,
        )
        xf = x.astype(jnp.float32)
        if self.static_act_scale and not self.is_mutable_collection(
            "calibration"
        ):
            amax_param = self.param(
                "act_scale", nn.initializers.ones, (), jnp.float32
            )
            ascale = jnp.maximum(amax_param, 1e-8) / 127.0
            xq = jnp.clip(
                jnp.round(xf / ascale), -127.0, 127.0
            ).astype(jnp.int8)
        elif self.static_act_scale:
            # CALIBRATION pass: record the true absmax but quantize
            # dynamically, so deeper layers calibrate on undistorted
            # activations (an uncalibrated act_scale=1.0 would clip
            # everything beyond +-1 and poison downstream ranges)
            self.param("act_scale", nn.initializers.ones, (), jnp.float32)
            self.sow(
                "calibration", "amax", jnp.max(jnp.abs(xf)),
                init_fn=lambda: jnp.zeros((), jnp.float32),
                reduce_fn=jnp.maximum,
            )
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            ascale = jnp.maximum(amax, 1e-8) / 127.0
            xq = jnp.round(xf / ascale).astype(jnp.int8)
        else:
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            ascale = jnp.maximum(amax, 1e-8) / 127.0
            xq = jnp.round(xf / ascale).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq,
            (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * ascale * wscale
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias
        return y.astype(self.dtype)


def calibrate_w8a8_act_scales(apply_fn, variables, batches):
    """Calibrate static activation scales for every `DenseW8A8` in a model.

    Runs `apply_fn(variables, *batch, mutable=["calibration"])` over the
    given batches, keeps the running per-layer absmax the modules sow, and
    returns a params tree with each module's `act_scale` set to it. The
    model must be built with `static_act_scale=True`
    (`ViT3DConfig(quant_w8a8_static=True)`); one representative batch is
    usually enough — scales only need to bound the activation range.
    """
    import flax

    amax = None
    for batch in batches:
        # "params" mutable too: float->int8-converted trees carry no
        # act_scale yet; flax creates the missing params (init 1.0) during
        # this pass instead of erroring
        _, state = apply_fn(
            variables, *batch, mutable=["calibration", "params"],
            rngs={"params": jax.random.PRNGKey(0)},
        )
        variables = dict(variables)
        variables["params"] = state["params"]
        sown = flax.traverse_util.flatten_dict(state["calibration"])
        # sow stores a tuple per leaf; reduce_fn keeps it length-1
        cur = {k[:-1]: v[0] if isinstance(v, tuple) else v
               for k, v in sown.items()}
        if amax is None:
            amax = cur
        else:
            amax = {k: jnp.maximum(amax[k], v) for k, v in cur.items()}

    params = flax.traverse_util.flatten_dict(variables["params"])
    for path, value in amax.items():
        # `path` is the module path (the sown "amax" leaf key was stripped
        # above); its act_scale param lives right under it. Created if
        # absent so float->int8-converted trees (quantize_kernels_int8
        # emits no act_scale) calibrate in one pass.
        params[path + ("act_scale",)] = jnp.asarray(value, jnp.float32)
    return flax.traverse_util.unflatten_dict(params)


class QuantEmbed(nn.Module):
    """int8 weight-only embedding with a tied LM head (`attend`).

    Per-vocab-row symmetric scales: lookup gathers int8 rows and rescales
    (exact per-row relative error <= 1/254); `attend` runs the (D, V) matmul
    on the int8 table (XLA fuses the convert into the MXU feed, so HBM reads
    stay int8) and scales the logits. Halves the dominant decode HBM stream
    (the tied Phi-4-mini table is 1.23 GB in bf16, read once per token)."""

    vocab_size: int
    features: int
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.embedding_q = self.param(
            "embedding_q",
            nn.initializers.zeros,
            (self.vocab_size, self.features),
            jnp.int8,
        )
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.vocab_size,), jnp.float32
        )

    def __call__(self, ids):
        rows = jnp.take(self.embedding_q, ids, axis=0).astype(self.dtype)
        s = jnp.take(self.scale, ids, axis=0).astype(self.dtype)
        return rows * s[..., None]

    def attend(self, hidden):
        logits = jnp.dot(hidden, self.embedding_q.T.astype(self.dtype))
        return logits * self.scale.astype(self.dtype)


def quantize_embed_int8(params, embed_name="embed"):
    """{embedding: (V, D) float} -> {embedding_q: int8, scale: (V,)} under
    the named module, producing the tree a `quant_int8_embed=True` model
    expects. Rows are quantized symmetrically to their own max."""
    import numpy as np

    def walk(node, name=""):
        if isinstance(node, dict):
            if name == embed_name and "embedding" in node:
                w = np.asarray(node["embedding"], np.float32)
                scale = np.abs(w).max(axis=-1, keepdims=True) / 127.0
                scale = np.maximum(scale, 1e-8)
                q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
                out = {k: v for k, v in node.items() if k != "embedding"}
                out["embedding_q"] = q
                out["scale"] = np.squeeze(scale, axis=-1)
                return out
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params)


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


# ViT tower dense modules for the W8A8 encode serving mode
VIT_QUANT_TARGETS = ("qkv", "out_proj", "fc1", "fc2")


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
