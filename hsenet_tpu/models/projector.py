"""Spatial packer projectors: 2048 vision tokens -> 128 LLM tokens.

Reference `multimodal_projector/spatial_pooling_projector.py`:
  * `VisualPacker_3d_phi_v3` (:121-153) — production packer: view the 2048
    HR tokens as an (8,16,16) grid, average-pool with kernel (1,4,4) to get
    128 low-resolution queries, cross-attend each query over its own
    16-token window (`resolution_attention_v3`, :48-83; residual on the
    *projected* query, post-LN), then Linear(768->3072)-GELU-Linear into the
    LLM embedding space.
  * `SpatialPoolingProjector2` ('baseline', :262-315) — avg-pool + MLP.
  * pure-MLP ablation head (:317-372 ablation_mlps).

TPU notes: the windowed single-query attention is one batched einsum over
(B, 128 windows, 16 keys) — no loops, no gather; everything maps to two
MXU matmuls plus a tiny softmax.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from einops import rearrange, reduce
from flax import linen as nn

from hsenet_tpu.configs import PackerConfig

Dtype = Any


class ResolutionAttention(nn.Module):
    """`resolution_attention_v3`: per-window single-query cross-attention."""

    emb_dim: int
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, lr_queries, hr_windows, *, deterministic=True):
        """lr_queries: (B, W, D); hr_windows: (B, W, K, D) -> (B, W, D)."""
        q = nn.Dense(self.emb_dim, dtype=self.dtype, name="wq")(lr_queries)
        k = nn.Dense(self.emb_dim, dtype=self.dtype, name="wk")(hr_windows)
        v = nn.Dense(self.emb_dim, dtype=self.dtype, name="wv")(hr_windows)
        s = jnp.einsum("bwd,bwkd->bwk", q, k, preferred_element_type=jnp.float32)
        s = s / jnp.sqrt(jnp.float32(self.emb_dim))
        p = jax.nn.softmax(s, axis=-1)
        p = nn.Dropout(self.dropout_rate)(p, deterministic=deterministic)
        out = jnp.einsum("bwk,bwkd->bwd", p.astype(v.dtype), v)
        out = nn.Dense(self.emb_dim, dtype=self.dtype, name="out_proj")(out)
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        return nn.LayerNorm(dtype=jnp.float32, name="norm")(q + out)


class VisualPacker(nn.Module):
    """Production packer (`VisualPacker_3d_phi_v3`)."""

    config: PackerConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, *, deterministic: bool = True):
        cfg = self.config
        gd, gh, gw = cfg.grid
        kd, kh, kw = cfg.kernel
        hr = rearrange(
            tokens,
            "b (d wd h wh w ww) c -> b (d h w) (wd wh ww) c",
            d=gd // kd, wd=kd, h=gh // kh, wh=kh, w=gw // kw, ww=kw,
        )
        lr = reduce(hr, "b w k c -> b w c", "mean")
        packed = ResolutionAttention(
            cfg.in_dim,
            dropout_rate=cfg.dropout_rate,
            dtype=self.dtype,
            name="resolution_attention",
        )(lr, hr, deterministic=deterministic)
        x = nn.Dense(cfg.out_dim, dtype=self.dtype, name="proj_fc1")(packed)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(cfg.out_dim, dtype=self.dtype, name="proj_fc2")(x)
        return x


class SpatialPoolingProjector(nn.Module):
    """Baseline: avg-pool the (8,16,16) grid then MLP (reference :262-315)."""

    config: PackerConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, *, deterministic: bool = True):
        cfg = self.config
        gd, gh, gw = cfg.grid
        p = cfg.pooling_size
        x = rearrange(
            tokens,
            "b (d pd h ph w pw) c -> b (d h w) (pd ph pw) c",
            d=gd // p, pd=p, h=gh // p, ph=p, w=gw // p, pw=p,
        ).mean(axis=2)
        for i in range(cfg.mlp_depth):
            x = nn.Dense(cfg.out_dim, dtype=self.dtype, name=f"fc{i+1}")(x)
            if i < cfg.mlp_depth - 1:
                x = jax.nn.gelu(x, approximate=False)
        return x


class MLPProjector(nn.Module):
    """Per-token MLP with no pooling (ablation head, reference :317-372)."""

    config: PackerConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, *, deterministic: bool = True):
        cfg = self.config
        x = tokens
        for i in range(cfg.mlp_depth):
            x = nn.Dense(cfg.out_dim, dtype=self.dtype, name=f"fc{i+1}")(x)
            if i < cfg.mlp_depth - 1:
                x = jax.nn.gelu(x, approximate=False)
        return x


def build_projector(config: PackerConfig, dtype=jnp.float32, name=None):
    """Registry mirroring `multimodal_projector/builder.py:81-106`."""
    if config.projector_type == "packer_v3":
        return VisualPacker(config, dtype=dtype, name=name)
    if config.projector_type == "spatial_pooling":
        return SpatialPoolingProjector(config, dtype=dtype, name=name)
    if config.projector_type == "mlp":
        return MLPProjector(config, dtype=dtype, name=name)
    if config.projector_type == "qformer":
        return QFormerProjector(
            config, num_queries=config.num_queries, dtype=dtype, name=name
        )
    if config.projector_type == "med2e3":
        return Med2E3Projector(config, dtype=dtype, name=name)
    raise ValueError(f"Unknown projector type: {config.projector_type}")


class QFormerProjector(nn.Module):
    """32-query Q-Former ablation head (reference ablation_qformerProjector,
    spatial_pooling_projector.py:455-512): learned queries -> self-attn ->
    cross-attn over the 2048 vision tokens -> 2 post-norm encoder layers ->
    MLP into LLM space."""

    config: PackerConfig
    num_queries: int = 32
    num_heads: int = 8
    num_layers: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, *, deterministic: bool = True):
        from hsenet_tpu.ops.attention import multi_head_attention

        cfg = self.config
        b = tokens.shape[0]
        queries = self.param(
            "query_embeds",
            nn.initializers.xavier_uniform(),
            (self.num_queries, cfg.in_dim),
            jnp.float32,
        )
        q = jnp.broadcast_to(
            queries.astype(self.dtype), (b, self.num_queries, cfg.in_dim)
        )

        def mha(name, q_in, kv):
            def heads(t, proj):
                t = nn.Dense(cfg.in_dim, dtype=self.dtype, name=f"{name}_{proj}")(t)
                return rearrange(t, "b s (n d) -> b n s d", n=self.num_heads)

            out = multi_head_attention(
                heads(q_in, "q"), heads(kv, "k"), heads(kv, "v")
            )
            out = rearrange(out, "b n s d -> b s (n d)")
            return nn.Dense(cfg.in_dim, dtype=self.dtype, name=f"{name}_o")(out)

        q = mha("self_attn", q, q)
        attended = mha("cross_attn", q, tokens.astype(self.dtype))

        # post-norm transformer encoder layers (torch TransformerEncoderLayer)
        for i in range(self.num_layers):
            y = mha(f"layer{i}_attn", attended, attended)
            attended = nn.LayerNorm(dtype=jnp.float32, name=f"layer{i}_norm1")(
                attended + y
            )
            y = nn.Dense(2048, dtype=self.dtype, name=f"layer{i}_fc1")(attended)
            y = jax.nn.relu(y)
            y = nn.Dense(cfg.in_dim, dtype=self.dtype, name=f"layer{i}_fc2")(y)
            attended = nn.LayerNorm(dtype=jnp.float32, name=f"layer{i}_norm2")(
                attended + y
            )

        x = nn.Dense(cfg.out_dim, dtype=self.dtype, name="proj_fc1")(attended)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(cfg.out_dim, dtype=self.dtype, name="proj_fc2")(x)


class Med2E3Projector(nn.Module):
    """Med-2E3 reproduction projector (SpatialPoolingProjector_med2e3,
    spatial_pooling_projector.py:515-592): pooled 3D tokens + per-slice 2D
    features, text-guided slice scoring from the prompt embeddings, output =
    [128 pooled 3D tokens | 32 score-weighted slice tokens]."""

    config: PackerConfig
    num_slices: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,  # (B, 2048, in_dim)
        slice_features: jax.Array,  # (B, 32, in_dim)
        text_embeds: jax.Array,  # (B, S, out_dim) prompt embeddings
        *,
        deterministic: bool = True,
    ):
        cfg = self.config
        gd, gh, gw = cfg.grid
        kd, kh, kw = cfg.kernel
        b = tokens.shape[0]
        pooled = rearrange(
            tokens,
            "b (d wd h wh w ww) c -> b (d h w) (wd wh ww) c",
            d=gd // kd, wd=kd, h=gh // kh, wh=kh, w=gw // kw, ww=kw,
        ).mean(axis=2)

        def mlp(name, x):
            x = nn.Dense(cfg.out_dim, dtype=self.dtype, name=f"{name}_fc1")(x)
            x = jax.nn.gelu(x, approximate=False)
            return nn.Dense(cfg.out_dim, dtype=self.dtype, name=f"{name}_fc2")(x)

        f3d = mlp("projector_3d", pooled)  # (B, 128, out)
        f2d = mlp("projector_2d", slice_features.astype(self.dtype))

        # per-slice context: slices grouped with their depth-plane of 3D
        # tokens, mean-pooled (reference :570-575)
        n3d = f3d.shape[1]
        d_out, h_out, w_out = cfg.out_grid
        grid3d = f3d.reshape(b, d_out, h_out * w_out, -1)
        rep = self.num_slices // d_out
        grid3d = jnp.repeat(grid3d, rep, axis=1)  # (B, 32, hw, out)
        ctx = jnp.concatenate([grid3d, f2d[:, :, None, :]], axis=2).mean(axis=2)

        # text guidance: prompt tokens after the visual block (:580-583)
        valid = n3d + self.num_slices
        text = text_embeds[:, valid + 1 :, :].astype(jnp.float32).mean(axis=1)
        score = jnp.einsum("bsd,bd->bs", ctx.astype(jnp.float32), text)
        score = jax.nn.softmax(score, axis=1).astype(f2d.dtype)
        f2d_weighted = f2d * score[..., None]
        return jnp.concatenate([f3d, f2d_weighted], axis=1)

    @property
    def proj_out_num(self):
        return self.config.proj_out_num + self.num_slices
