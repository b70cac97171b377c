"""BERT text encoder (bert-base-uncased-compatible), in flax.

The reference uses HF `BertModel` as the trainable CLIP text encoder
(`model/CLIP_stage1.py:78`, vocab 30522) and takes `last_hidden_state`
(`CLIP_stage1.py:104-109`). This is a from-scratch JAX implementation of the
same architecture (post-LN encoder), plus a converter from HF torch weights
so pretrained bert-base-uncased checkpoints load directly.

TPU notes: the right-padded attention mask is reduced to per-row valid
lengths and fed to the flash kernel's kv_lens path — no (S,S) mask tensor is
ever materialised.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from hsenet_tpu.configs import BertConfig
from hsenet_tpu.ops.attention import multi_head_attention

Dtype = Any


class BertEmbeddings(nn.Module):
    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, *, deterministic=True):
        cfg = self.config
        word = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="word"
        )(input_ids)
        pos_ids = jnp.arange(input_ids.shape[1])[None, :]
        pos = nn.Embed(
            cfg.max_position_embeddings,
            cfg.hidden_size,
            dtype=self.dtype,
            name="position",
        )(pos_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        typ = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_type"
        )(token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="norm"
        )(x)
        return x


class BertLayer(nn.Module):
    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv_lens, *, deterministic=True):
        cfg = self.config
        h = cfg.hidden_size
        q = nn.Dense(h, dtype=self.dtype, name="q")(x)
        k = nn.Dense(h, dtype=self.dtype, name="k")(x)
        v = nn.Dense(h, dtype=self.dtype, name="v")(x)

        def heads(t):
            return rearrange(t, "b s (n d) -> b n s d", n=cfg.num_heads)

        attn = multi_head_attention(heads(q), heads(k), heads(v), kv_lens=kv_lens)
        attn = rearrange(attn, "b n s d -> b s (n d)")
        attn = nn.Dense(h, dtype=self.dtype, name="attn_out")(attn)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="attn_norm"
        )(x + attn)

        y = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="ffn_in")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(h, dtype=self.dtype, name="ffn_out")(y)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ffn_norm"
        )(x + y)
        return x


class BertEncoder(nn.Module):
    """Returns last_hidden_state (B, S, H); matches HF BertModel outputs."""

    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        token_type_ids: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.config
        if attention_mask is None:
            kv_lens = jnp.full((input_ids.shape[0],), input_ids.shape[1], jnp.int32)
        else:
            # right-padded masks only (the framework's tokenizers pad right)
            kv_lens = attention_mask.sum(axis=-1).astype(jnp.int32)
        x = BertEmbeddings(cfg, dtype=self.dtype, name="embeddings")(
            input_ids, token_type_ids, deterministic=deterministic
        )

        def body(layer, carry):
            return layer(carry, kv_lens, deterministic=deterministic), None

        stack = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=cfg.num_layers,
        )
        x, _ = stack(BertLayer(cfg, dtype=self.dtype, name="layers"), x)
        return x


def convert_hf_bert(state_dict, config: BertConfig):
    """HF torch `BertModel.state_dict()` -> flax params for `BertEncoder`.

    Stacks the 12 per-layer weight sets along a leading axis to match the
    scanned layer stack.
    """
    import numpy as np

    def t(name):
        w = state_dict[name]
        try:  # torch tensor
            w = w.detach().cpu().numpy()
        except AttributeError:
            w = np.asarray(w)
        return w

    def lin(prefix):
        return {"kernel": t(f"{prefix}.weight").T, "bias": t(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": t(f"{prefix}.weight"), "bias": t(f"{prefix}.bias")}

    def stack(trees):
        return jax.tree.map(lambda *xs: np.stack(xs), *trees)

    layers = []
    for i in range(config.num_layers):
        p = f"encoder.layer.{i}"
        layers.append(
            {
                "q": lin(f"{p}.attention.self.query"),
                "k": lin(f"{p}.attention.self.key"),
                "v": lin(f"{p}.attention.self.value"),
                "attn_out": lin(f"{p}.attention.output.dense"),
                "attn_norm": ln(f"{p}.attention.output.LayerNorm"),
                "ffn_in": lin(f"{p}.intermediate.dense"),
                "ffn_out": lin(f"{p}.output.dense"),
                "ffn_norm": ln(f"{p}.output.LayerNorm"),
            }
        )

    params = {
        "embeddings": {
            "word": {"embedding": t("embeddings.word_embeddings.weight")},
            "position": {"embedding": t("embeddings.position_embeddings.weight")},
            "token_type": {
                "embedding": t("embeddings.token_type_embeddings.weight")
            },
            "norm": ln("embeddings.LayerNorm"),
        },
        "layers": stack(layers),
    }
    return {"params": params}
