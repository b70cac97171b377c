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
    raise ValueError(f"Unknown projector type: {config.projector_type}")
