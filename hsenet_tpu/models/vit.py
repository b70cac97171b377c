"""3D vision encoders: ViT3D (stage 1), the 2E3 slice-guided ViT (stage 2),
the 2D slice trunk, and the dual-encoder tower.

Reference behavior (all cites into /root/reference/Preprint/LaMed/src/):
  * `ViT_stage1` (model/multimodal_encoder/vit.py:360-469): patch embed ->
    [CLS | tokens] -> 12 transformer blocks -> final LayerNorm.
  * `ViT_stage2` (vit.py:222-357): patch embed -> single-head cross-attention
    from the 2048 patch tokens onto the 32 per-slice BiomedCLIP features ->
    Linear(768->1)+Sigmoid per-patch score -> tokens *= score -> [CLS |
    tokens] -> same tower. ("linear_sigmoid" score strategy, vit.py:336-345.)
  * `ViT3DTower_dual_encoders` (vit.py:891-960): both towers; strips CLS when
    select_feature == 'patch'; `tower_mode` mirrors remain_2d3d_ViT_type.
  * `ViT2D` is the BiomedCLIP-compatible ViT-B/16 trunk the reference runs
    via open_clip offline (CT-RATE_2D_to_npy_file.py:88) or in-graph
    (vit.py:529-532); here it is a first-class in-graph module.

TPU notes: the 12-layer tower is an `nn.scan` over stacked block params (one
compiled block body, weights as a leading-axis stack), attention runs through
the Pallas flash kernel, and everything is shape-static so XLA tiles the
(2048x1024)x(1024x768) patch matmul and the block matmuls straight onto the
MXU.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hsenet_tpu.configs import ViT2DConfig, ViT3DConfig
from hsenet_tpu.models.layers import (
    PatchEmbed2D,
    PatchEmbed3D,
    SingleHeadCrossAttention,
    TransformerBlock,
)

Dtype = Any


class TransformerTower(nn.Module):
    """num_layers pre-LN blocks as a scanned stack + final LayerNorm."""

    num_layers: int
    num_heads: int
    mlp_dim: int
    qkv_bias: bool = False
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    remat: bool = False
    quant: bool = False
    quant_static: bool = False
    gelu_approx: bool = False
    attn_block_q: Optional[int] = None

    @nn.compact
    def __call__(
        self, x, *, kv_lens=None, deterministic: bool = True,
        skip_final_norm: bool = False,
        sp_axis: Optional[str] = None, sp_size: int = 1,
        sp_kv_len: Optional[int] = None,
    ):
        def body(block, carry):
            y = block(
                carry, kv_lens=kv_lens, deterministic=deterministic,
                sp_axis=sp_axis, sp_size=sp_size, sp_kv_len=sp_kv_len,
            )
            return y, None

        if self.remat:
            # remat the body fn, not the module class: the static kwargs
            # (deterministic, sp axis/size) stay closure-captured where
            # jax.checkpoint never traces them (see Phi3Decoder note)
            body = nn.remat(body, prevent_cse=False)

        stack = nn.scan(
            body,
            # "calibration" only materialises when a caller passes
            # mutable=["calibration"] (static W8A8 scale calibration)
            variable_axes={"params": 0, "calibration": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_layers,
        )
        x, _ = stack(
            TransformerBlock(
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                qkv_bias=self.qkv_bias,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                quant=self.quant,
                quant_static=self.quant_static,
                gelu_approx=self.gelu_approx,
                attn_block_q=self.attn_block_q,
                name="blocks",
            ),
            x,
        )
        if skip_final_norm:
            # caller applies its own final norm (e.g. MaskedViT3D's
            # norm_masked replaces the shared norm, reference vit.py:156-159)
            return x
        return nn.LayerNorm(dtype=jnp.float32, name="norm")(x)


class ViT3D(nn.Module):
    """Stage-1 3D ViT; with `config.slice_guided=True` it is the 2E3 encoder."""

    config: ViT3DConfig
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        volume: jax.Array,  # (B, C, D, H, W) in [0, 1]
        slice_features: Optional[jax.Array] = None,  # (B, 32, 768) for 2E3
        *,
        deterministic: bool = True,
        return_scores: bool = False,
        sp_axis: Optional[str] = None,
        sp_size: int = 1,
    ):
        """`sp_axis`/`sp_size`: sequence-parallel mode — must be called
        inside `shard_map` over that mesh axis (see parallel/sp.py). Patch
        embedding (+ the 2E3 slice-guided scoring, which reads all tokens)
        runs replicated on every sp member — it is <2% of tower FLOPs —
        then each device keeps its contiguous token chunk and the tower
        runs with ring attention. Returns this device's (B, S/sp, D)
        output chunk (padded tail tokens included; the sp wrapper strips
        them after shard_map reassembly)."""
        cfg = self.config
        x = PatchEmbed3D(
            cfg.patch_size,
            cfg.hidden_size,
            dropout_rate=cfg.dropout_rate,
            dtype=self.dtype,
            name="patch_embed",
        )(volume, deterministic=deterministic)

        scores = None
        if cfg.slice_guided:
            assert slice_features is not None, "2E3 encoder needs slice features"
            guided, _ = SingleHeadCrossAttention(
                emb_dim=cfg.hidden_size,
                dropout_rate=cfg.slice_dropout_rate,
                dtype=self.dtype,
                name="slice_guided_attention",
            )(
                x,
                slice_features.astype(self.dtype),
                slice_features.astype(self.dtype),
                deterministic=deterministic,
            )
            score_logit = nn.Dense(
                1, dtype=jnp.float32, name="patch_score_proj"
            )(guided)
            scores = jax.nn.sigmoid(score_logit)  # (B, N, 1) in (0, 1)
            x = x * scores.astype(x.dtype)

        if cfg.classification:
            cls = self.param(
                "cls_token",
                nn.initializers.zeros,
                (1, 1, cfg.hidden_size),
                jnp.float32,
            )
            cls = jnp.broadcast_to(
                cls.astype(x.dtype), (x.shape[0], 1, cfg.hidden_size)
            )
            x = jnp.concatenate([cls, x], axis=1)

        sp_kv_len = None
        if sp_axis is not None:
            from hsenet_tpu.ops.ring_attention import local_chunk, pad_to_multiple

            sp_kv_len = x.shape[1]  # true token count before padding
            x = pad_to_multiple(x, sp_size, axis=1)
            x = local_chunk(x, sp_axis, sp_size, axis=1)

        x = TransformerTower(
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            mlp_dim=cfg.mlp_dim,
            qkv_bias=cfg.qkv_bias,
            dropout_rate=cfg.dropout_rate,
            dtype=self.dtype,
            remat=self.remat,
            quant=cfg.quant_w8a8,
            quant_static=cfg.quant_w8a8_static,
            gelu_approx=cfg.gelu_approx,
            attn_block_q=cfg.attn_block_q,
            name="tower",
        )(
            x, deterministic=deterministic,
            sp_axis=sp_axis, sp_size=sp_size, sp_kv_len=sp_kv_len,
        )

        if return_scores:
            return x, scores
        return x


class MaskedViT3D(nn.Module):
    """Legacy masked-contrastive ViT (reference `ViT` vit.py:67-219).

    Runs BOTH streams: the full 2049-token tower, and a masked tower over
    the top-`unmasked_tokens` patches ranked by slice-guided cross-attention
    score (score-weighted, gathered in sorted index order, separate final
    LayerNorm `norm_masked`). The reference's mask ratio is continuous
    (Gaussian ramp, CLIP.py:54-72); here `unmasked_tokens` is a static int —
    quantize the schedule to buckets (see
    `hsenet_tpu.train.legacy_clip.mask_schedule_buckets`) so XLA compiles a
    bounded set of shapes instead of one per step.
    """

    config: ViT3DConfig
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        volume: jax.Array,
        slice_features: jax.Array,  # (B, 32, 768)
        unmasked_tokens: Optional[int] = None,
        *,
        deterministic: bool = True,
    ):
        cfg = self.config
        x = PatchEmbed3D(
            cfg.patch_size,
            cfg.hidden_size,
            dropout_rate=cfg.dropout_rate,
            dtype=self.dtype,
            name="patch_embed",
        )(volume, deterministic=deterministic)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size),
            jnp.float32,
        )
        tower = TransformerTower(
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            mlp_dim=cfg.mlp_dim,
            qkv_bias=cfg.qkv_bias,
            dropout_rate=cfg.dropout_rate,
            dtype=self.dtype,
            remat=self.remat,
            quant=cfg.quant_w8a8,
            quant_static=cfg.quant_w8a8_static,
            gelu_approx=cfg.gelu_approx,
            attn_block_q=cfg.attn_block_q,
            name="tower",
        )

        def with_cls(tokens):
            c = jnp.broadcast_to(
                cls.astype(tokens.dtype), (tokens.shape[0], 1, cfg.hidden_size)
            )
            return jnp.concatenate([c, tokens], axis=1)

        x_masked = None
        if unmasked_tokens is not None:
            guided, _ = SingleHeadCrossAttention(
                emb_dim=cfg.hidden_size,
                dropout_rate=cfg.slice_dropout_rate,
                dtype=self.dtype,
                name="slice_guided_attention",
            )(
                x,
                slice_features.astype(self.dtype),
                slice_features.astype(self.dtype),
                deterministic=deterministic,
            )
            score_logit = nn.Dense(
                1, dtype=jnp.float32, name="patch_score_proj"
            )(guided)
            scores = jax.nn.sigmoid(score_logit)[..., 0]  # (B, N)
            weighted = x * scores[..., None].astype(x.dtype)
            _, top_idx = jax.lax.top_k(scores, unmasked_tokens)
            top_idx = jnp.sort(top_idx, axis=1)  # keep spatial order (:195)
            kept = jnp.take_along_axis(weighted, top_idx[..., None], axis=1)
            # masked stream: same blocks, but norm_masked *instead of* the
            # shared final norm (reference vit.py:156-159) — weight-faithful
            # for legacy-checkpoint conversion
            h = tower(
                with_cls(kept), deterministic=deterministic,
                skip_final_norm=True,
            )
            x_masked = nn.LayerNorm(dtype=jnp.float32, name="norm_masked")(h)

        x_full = tower(with_cls(x), deterministic=deterministic)
        if unmasked_tokens is not None:
            return x_full, x_masked
        return x_full


class ViT2D(nn.Module):
    """BiomedCLIP-compatible 2D ViT-B/16 trunk (timm-style, pre-LN, CLS)."""

    config: ViT2DConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, *, deterministic: bool = True):
        """images: (B, H, W, C) -> (B, hidden) pooled CLS feature."""
        cfg = self.config
        x = PatchEmbed2D(
            cfg.patch_size, cfg.hidden_size, dtype=self.dtype, name="patch_embed"
        )(images)
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size), jnp.float32
        )
        cls = jnp.broadcast_to(
            cls.astype(x.dtype), (x.shape[0], 1, cfg.hidden_size)
        )
        x = jnp.concatenate([cls, x], axis=1)
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(stddev=0.02),
            (1, cfg.num_patches + 1, cfg.hidden_size),
            jnp.float32,
        )
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm_pre")(x)
        x = TransformerTower(
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            mlp_dim=cfg.mlp_dim,
            qkv_bias=True,  # timm ViT uses qkv bias
            dtype=self.dtype,
            name="tower",
        )(x, deterministic=deterministic)
        return x[:, 0]


class OnlineSliceFeatures(nn.Module):
    """In-graph BiomedCLIP slice features (reference ViT4LLM_v3 path,
    vit.py:471-571: trilinear-resize the volume to (32, 224, 224), run the
    frozen 2D trunk per slice). Replaces the offline (32, 768) feature npy
    when no precomputed features are available; freeze via the optimizer
    mask (path contains 'slice_encoder_2d').
    """

    config: ViT2DConfig
    num_slices: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, volume: jax.Array, *, deterministic: bool = True):
        """volume (B, 1, D, H, W) in [0,1] -> (B, num_slices, hidden)."""
        cfg = self.config
        b = volume.shape[0]
        v = volume[:, 0]  # (B, D, H, W)
        v = jax.image.resize(
            v, (b, self.num_slices, cfg.image_size, cfg.image_size),
            method="trilinear",
        )
        # per-slice min-max + CLIP normalisation (preprocess.extract_slices
        # semantics for volumes already in [0,1])
        mn = v.min(axis=(2, 3), keepdims=True)
        mx = v.max(axis=(2, 3), keepdims=True)
        v = (v - mn) / jnp.maximum(mx - mn, 1e-8)
        rgb = jnp.repeat(v[..., None], 3, axis=-1)
        mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
        std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])
        rgb = (rgb - mean) / std
        flat = rgb.reshape(
            b * self.num_slices, cfg.image_size, cfg.image_size, 3
        )
        feats = ViT2D(cfg, dtype=self.dtype, name="slice_encoder_2d")(
            flat, deterministic=deterministic
        )
        return feats.reshape(b, self.num_slices, cfg.hidden_size)


class DualVisionTower(nn.Module):
    """Both towers; returns per-mode patch-token streams (CLS stripped).

    tower_mode: 'dual_vits' -> (feats_3d, feats_2e3); '3d_vit' / '2e3_vit'
    -> single stream. Mirrors vit.py:926-948.
    """

    config: ViT3DConfig
    tower_mode: str = "dual_vits"
    select_feature: str = "patch"
    dtype: Dtype = jnp.float32
    remat: bool = False

    def setup(self):
        import dataclasses

        base = dataclasses.replace(self.config, slice_guided=False)
        guided = dataclasses.replace(self.config, slice_guided=True)
        if self.tower_mode in ("dual_vits", "3d_vit"):
            self.tower_stage1 = ViT3D(
                base, dtype=self.dtype, remat=self.remat, name="tower_stage1"
            )
        if self.tower_mode in ("dual_vits", "2e3_vit"):
            self.tower_stage2 = ViT3D(
                guided, dtype=self.dtype, remat=self.remat, name="tower_stage2"
            )

    def _select(self, feats):
        if self.select_feature == "patch" and self.config.classification:
            return feats[:, 1:]
        if self.select_feature in ("patch", "cls_patch"):
            return feats
        raise ValueError(f"Unexpected select_feature: {self.select_feature}")

    def __call__(self, volume, slice_features=None, *, deterministic=True):
        outs = []
        if self.tower_mode in ("dual_vits", "3d_vit"):
            outs.append(
                self._select(
                    self.tower_stage1(volume, deterministic=deterministic)
                )
            )
        if self.tower_mode in ("dual_vits", "2e3_vit"):
            outs.append(
                self._select(
                    self.tower_stage2(
                        volume, slice_features, deterministic=deterministic
                    )
                )
            )
        if self.tower_mode == "dual_vits":
            return tuple(outs)
        return outs[0]
