"""Shared transformer building blocks (flax.linen).

Behavioral contracts come from the reference's MONAI blocks and local
attention helpers — reimplemented TPU-first:
  * `TransformerBlock`: pre-LN block matching MONAI
    `monai.networks.blocks.TransformerBlock` (used at vit.py:464-466):
    x = x + SA(LN(x)); x = x + MLP(LN(x)); SA has packed qkv (bias
    configurable, reference uses False), output projection with bias; MLP is
    Linear-GELU(exact)-Dropout-Linear-Dropout.
  * `PatchEmbed3D`: MONAI `PatchEmbeddingBlock` perceptron mode
    (vit.py:290-305 comment): non-overlapping patch rearrange + Linear +
    learned position embeddings. On TPU this is a single reshape/transpose
    feeding one large matmul — no conv needed.
  * `SingleHeadCrossAttention`: the reference's `regular_attention`
    (vit.py:38-64): full-width single-head Wq/Wk/Wv, residual on the
    *projected* query, post-LN.

All matmuls run in the module's compute `dtype` (bf16 by default on TPU);
LayerNorm/softmax accumulate in f32.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from hsenet_tpu.ops.attention import multi_head_attention

Dtype = Any


def _dense(features, *, quant: bool, dtype, name, use_bias: bool = True,
           quant_static: bool = False):
    """nn.Dense, or the int8 W8A8 serving dense when `quant` (same param
    names as LoRADense(quantized=True) so one converter handles both).
    `quant_static`: calibrated static activation scales (see DenseW8A8)."""
    if quant:
        from hsenet_tpu.models.lora import DenseW8A8

        return DenseW8A8(features, use_bias=use_bias, dtype=dtype,
                         static_act_scale=quant_static, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


class MlpBlock(nn.Module):
    mlp_dim: int
    out_dim: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    quant: bool = False
    quant_static: bool = False
    gelu_approx: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = _dense(self.mlp_dim, quant=self.quant,
                   quant_static=self.quant_static, dtype=self.dtype,
                   name="fc1")(x)
        x = jax.nn.gelu(x, approximate=self.gelu_approx)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = _dense(self.out_dim, quant=self.quant,
                   quant_static=self.quant_static, dtype=self.dtype,
                   name="fc2")(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x


class SelfAttention(nn.Module):
    num_heads: int
    qkv_bias: bool = False
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    quant: bool = False
    quant_static: bool = False
    attn_block_q: Optional[int] = None

    @nn.compact
    def __call__(
        self, x, *, kv_lens=None, deterministic: bool = True,
        sp_axis: Optional[str] = None, sp_size: int = 1,
        sp_kv_len: Optional[int] = None,
    ):
        b, s, h = x.shape
        head_dim = h // self.num_heads
        qkv = _dense(
            3 * h, quant=self.quant, quant_static=self.quant_static,
            use_bias=self.qkv_bias, dtype=self.dtype, name="qkv",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return rearrange(t, "b s (n d) -> b n s d", n=self.num_heads)

        if sp_axis is not None:
            # sequence-parallel: x is this device's chunk of the sequence
            # (sharded over the 'sp' mesh axis inside shard_map); exact
            # attention via the K/V ring. Per-row kv_lens masking is a
            # decoder concern — the encoder towers never use it.
            assert kv_lens is None, "kv_lens unsupported under sp"
            from hsenet_tpu.ops.ring_attention import ring_attention

            out = ring_attention(
                heads(q), heads(k), heads(v),
                axis_name=sp_axis, axis_size=sp_size, kv_len=sp_kv_len,
                block_q=self.attn_block_q,
            )
        else:
            out = multi_head_attention(
                heads(q), heads(k), heads(v), kv_lens=kv_lens,
                block_q=self.attn_block_q,
            )
        out = rearrange(out, "b n s d -> b s (n d)")
        out = _dense(h, quant=self.quant, quant_static=self.quant_static,
                     dtype=self.dtype, name="out_proj")(out)
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        return out


class TransformerBlock(nn.Module):
    num_heads: int
    mlp_dim: int
    qkv_bias: bool = False
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    quant: bool = False
    quant_static: bool = False
    gelu_approx: bool = False
    attn_block_q: Optional[int] = None

    @nn.compact
    def __call__(
        self, x, *, kv_lens=None, deterministic: bool = True,
        sp_axis: Optional[str] = None, sp_size: int = 1,
        sp_kv_len: Optional[int] = None,
    ):
        h = x.shape[-1]
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        y = SelfAttention(
            self.num_heads,
            qkv_bias=self.qkv_bias,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            quant=self.quant,
            quant_static=self.quant_static,
            attn_block_q=self.attn_block_q,
            name="attn",
        )(
            y, kv_lens=kv_lens, deterministic=deterministic,
            sp_axis=sp_axis, sp_size=sp_size, sp_kv_len=sp_kv_len,
        )
        x = x + y
        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        y = MlpBlock(
            self.mlp_dim,
            h,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            quant=self.quant,
            quant_static=self.quant_static,
            gelu_approx=self.gelu_approx,
            name="mlp",
        )(y, deterministic=deterministic)
        return x + y


class PatchEmbed3D(nn.Module):
    """(B, C, D, H, W) -> (B, n_patches, hidden) + learned pos embeddings."""

    patch_size: Tuple[int, int, int]
    hidden_size: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        p0, p1, p2 = self.patch_size
        # 'b c (d p0) (h p1) (w p2) -> b (d h w) (p0 p1 p2 c)' — channel
        # last inside the patch, matching MONAI perceptron rearrange order.
        tokens = rearrange(
            x,
            "b c (d p0) (h p1) (w p2) -> b (d h w) (p0 p1 p2 c)",
            p0=p0,
            p1=p1,
            p2=p2,
        ).astype(self.dtype)
        tokens = nn.Dense(self.hidden_size, dtype=self.dtype, name="proj")(tokens)
        n = tokens.shape[1]
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(stddev=0.02),
            (1, n, self.hidden_size),
            jnp.float32,
        )
        tokens = tokens + pos.astype(self.dtype)
        tokens = nn.Dropout(self.dropout_rate)(
            tokens, deterministic=deterministic
        )
        return tokens


class PatchEmbed2D(nn.Module):
    """(B, H, W, C) -> (B, n_patches, hidden); for the 2D slice trunk."""

    patch_size: int
    hidden_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        tokens = rearrange(
            x, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)", p1=p, p2=p
        ).astype(self.dtype)
        tokens = nn.Dense(self.hidden_size, dtype=self.dtype, name="proj")(tokens)
        return tokens


class SingleHeadCrossAttention(nn.Module):
    """Reference `regular_attention` (vit.py:38-64).

    Full-width single-head cross attention: out, attn = SDPA(Wq q, Wk k, Wv v)
    with scale 1/sqrt(emb_dim); result = LN(Wq(q) + Drop(Wo(out))).
    Returns (result, attention_weights).
    """

    emb_dim: int = 768
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, *, kv_lens=None, deterministic=True):
        q = nn.Dense(self.emb_dim, dtype=self.dtype, name="wq")(query)
        k = nn.Dense(self.emb_dim, dtype=self.dtype, name="wk")(key)
        v = nn.Dense(self.emb_dim, dtype=self.dtype, name="wv")(value)
        s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
        s = s / jnp.sqrt(jnp.float32(self.emb_dim))
        if kv_lens is not None:
            col = jnp.arange(s.shape[-1])[None, None, :]
            s = jnp.where(col < kv_lens[:, None, None], s, -1e30)
        attn = jax.nn.softmax(s, axis=-1)
        attn_d = nn.Dropout(self.dropout_rate)(
            attn, deterministic=deterministic
        ).astype(v.dtype)
        out = jnp.einsum("bqk,bkd->bqd", attn_d, v)
        out = nn.Dense(self.emb_dim, dtype=self.dtype, name="out_proj")(out)
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        out = nn.LayerNorm(dtype=jnp.float32, name="norm")(q + out)
        return out, attn
