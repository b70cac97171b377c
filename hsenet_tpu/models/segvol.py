"""SegVol: text-promptable volumetric segmentation (optional VLM module).

Reference: `model/segmentation_module/` — a 3D-adapted SAM
(`segvol.py:6-53`, `build_sam.py:36-111`, `modeling/{prompt_encoder,
mask_decoder,transformer}.py`): ViT-B image encoder (no CLS) -> (8,16,16)
feature grid; prompt encoder embeds text (+ points/boxes) with a random
Fourier positional encoding; a depth-2 two-way transformer decodes mask
tokens; hypernetwork MLPs dot the 4x-upscaled feature grid; a text-similarity
map is added (mask_decoder.py:173-188); logits upsample trilinearly to the
input shape. The reference ships it disabled by default
(`segmentation_module=None`, train_VLM.py:99).

TPU adaptations: NDHWC layouts, flax ConvTranspose upscaling, LayerNorm over
channels (the reference normalises over the full (C,D,H,W) extent — a
per-shape affine that pins the module to one resolution; channel-LN keeps
the math resolution-independent), everything static-shape.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from hsenet_tpu.configs import SwinConfig, ViT3DConfig
from hsenet_tpu.models.vit import ViT3D

Dtype = Any


class PositionEmbeddingRandom3D(nn.Module):
    """Random Fourier-feature PE over [0,1]^3 coords (SAM pe_layer)."""

    num_pos_feats: int = 384  # embed_dim // 2

    @nn.compact
    def __call__(self, coords: jax.Array) -> jax.Array:
        """coords (..., 3) in [0,1] -> (..., 2*num_pos_feats)."""
        gauss = self.param(
            "gaussian_matrix",
            lambda key: jax.random.normal(key, (3, self.num_pos_feats)),
        )
        c = 2.0 * coords - 1.0
        c = c @ jax.lax.stop_gradient(gauss)
        c = 2.0 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    @staticmethod
    def grid_coords(shape: Tuple[int, int, int]) -> jax.Array:
        """Normalised voxel-center coordinates of a (D, H, W) grid."""
        d, h, w = shape
        zs = (jnp.arange(d) + 0.5) / d
        ys = (jnp.arange(h) + 0.5) / h
        xs = (jnp.arange(w) + 0.5) / w
        z, y, x = jnp.meshgrid(zs, ys, xs, indexing="ij")
        return jnp.stack([z, y, x], axis=-1)  # (D, H, W, 3)


class PromptEncoder3D(nn.Module):
    """Sparse (text/points/boxes) + dense prompt embeddings."""

    embed_dim: int = 768
    grid: Tuple[int, int, int] = (8, 16, 16)
    dtype: Dtype = jnp.float32

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom3D(
            self.embed_dim // 2, name="pe_layer"
        )
        # pos/neg point + 2 box corners (prompt_encoder.py:46-48)
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0),
            (4, self.embed_dim), jnp.float32,
        )
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0),
            (1, self.embed_dim), jnp.float32,
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0),
            (1, self.embed_dim), jnp.float32,
        )

    def dense_pe(self) -> jax.Array:
        """(1, D, H, W, C) positional encoding of the feature grid."""
        coords = PositionEmbeddingRandom3D.grid_coords(self.grid)
        return self.pe_layer(coords)[None]

    def __call__(
        self,
        text_embedding: Optional[jax.Array] = None,  # (B, C)
        points: Optional[Tuple[jax.Array, jax.Array]] = None,  # ((B,N,3),(B,N))
        boxes: Optional[jax.Array] = None,  # (B, 6) normalized
    ):
        """Returns (sparse (B, T, C), dense (B, D, H, W, C))."""
        sparse_parts = []
        batch = None
        if points is not None:
            coords, labels = points
            pe = self.pe_layer(coords)
            pe = jnp.where(
                (labels == -1)[..., None], self.not_a_point_embed[0], pe
            )
            pe = pe + jnp.where(
                (labels == 1)[..., None],
                self.point_embeddings[1],
                self.point_embeddings[0],
            ) * (labels != -1)[..., None]
            sparse_parts.append(pe)
            batch = coords.shape[0]
        if boxes is not None:
            corners = boxes.reshape(-1, 2, 3)
            pe = self.pe_layer(corners)
            pe = pe + self.point_embeddings[2:4][None]
            sparse_parts.append(pe)
            batch = boxes.shape[0]
        if text_embedding is not None:
            sparse_parts.append(text_embedding[:, None, :])
            batch = text_embedding.shape[0]
        assert batch is not None, "need at least one prompt"
        sparse = jnp.concatenate(
            [p.astype(self.dtype) for p in sparse_parts], axis=1
        )
        dense = jnp.broadcast_to(
            self.no_mask_embed[0].astype(self.dtype),
            (batch, *self.grid, self.embed_dim),
        )
        return sparse, dense


class _DownsampledAttention(nn.Module):
    """SAM decoder attention with internal dim // downsample_rate."""

    embed_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        inner = self.embed_dim // self.downsample_rate
        head_dim = inner // self.num_heads
        qp = nn.Dense(inner, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(inner, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(inner, dtype=self.dtype, name="v_proj")(v)

        def heads(t):
            return rearrange(t, "b s (n d) -> b n s d", n=self.num_heads)

        s = jnp.einsum(
            "bnqd,bnkd->bnqk", heads(qp), heads(kp),
            preferred_element_type=jnp.float32,
        ) / jnp.sqrt(jnp.float32(head_dim))
        attn = jax.nn.softmax(s, axis=-1).astype(vp.dtype)
        out = jnp.einsum("bnqk,bnkd->bnqd", attn, heads(vp))
        out = rearrange(out, "b n s d -> b s (n d)")
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayBlock(nn.Module):
    embed_dim: int
    num_heads: int
    mlp_dim: int
    skip_first_layer_pe: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = _DownsampledAttention(
                self.embed_dim, self.num_heads, 1, self.dtype, name="self_attn"
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + _DownsampledAttention(
                self.embed_dim, self.num_heads, 1, self.dtype, name="self_attn"
            )(q, q, queries)
        queries = nn.LayerNorm(dtype=jnp.float32, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + _DownsampledAttention(
            self.embed_dim, self.num_heads, 2, self.dtype,
            name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(dtype=jnp.float32, name="norm2")(queries)

        mlp = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_fc1")(queries)
        mlp = jax.nn.relu(mlp)
        mlp = nn.Dense(self.embed_dim, dtype=self.dtype, name="mlp_fc2")(mlp)
        queries = nn.LayerNorm(dtype=jnp.float32, name="norm3")(queries + mlp)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + _DownsampledAttention(
            self.embed_dim, self.num_heads, 2, self.dtype,
            name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = nn.LayerNorm(dtype=jnp.float32, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embed_dim: int = 768
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/pe: (B, N, C); point_embedding: (B, T, C)."""
        queries, keys = point_embedding, image_embedding
        for i in range(self.depth):
            queries, keys = TwoWayBlock(
                self.embed_dim, self.num_heads, self.mlp_dim,
                skip_first_layer_pe=(i == 0), dtype=self.dtype,
                name=f"block{i}",
            )(queries, keys, point_embedding, image_pe)
        q = queries + point_embedding
        k = keys + image_pe
        queries = queries + _DownsampledAttention(
            self.embed_dim, self.num_heads, 2, self.dtype,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(dtype=jnp.float32, name="norm_final")(queries)
        return queries, keys


class _HyperMLP(nn.Module):
    hidden: int
    out: int
    depth: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth - 1):
            x = jax.nn.relu(
                nn.Dense(self.hidden, dtype=self.dtype, name=f"fc{i+1}")(x)
            )
        return nn.Dense(self.out, dtype=self.dtype, name=f"fc{self.depth}")(x)


class MaskDecoder3D(nn.Module):
    """SAM mask decoder with text-similarity fusion (mask_decoder.py)."""

    embed_dim: int = 768
    num_multimask_outputs: int = 3
    iou_head_hidden: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_embeddings: jax.Array,  # (B, D, H, W, C)
        image_pe: jax.Array,  # (1, D, H, W, C)
        sparse_prompts: jax.Array,  # (B, T, C)
        dense_prompts: jax.Array,  # (B, D, H, W, C)
        text_embedding: Optional[jax.Array] = None,  # (B, 768)
    ):
        num_mask_tokens = self.num_multimask_outputs + 1
        iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, self.embed_dim),
            jnp.float32,
        )
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0),
            (num_mask_tokens, self.embed_dim), jnp.float32,
        )
        b = sparse_prompts.shape[0]
        output_tokens = jnp.broadcast_to(
            jnp.concatenate([iou_token, mask_tokens]).astype(self.dtype),
            (b, 1 + num_mask_tokens, self.embed_dim),
        )
        tokens = jnp.concatenate([output_tokens, sparse_prompts], axis=1)

        src = image_embeddings + dense_prompts
        _, d, h, w, c = src.shape
        src_flat = src.reshape(b, d * h * w, c)
        pe_flat = jnp.broadcast_to(
            image_pe.reshape(1, d * h * w, c), (b, d * h * w, c)
        ).astype(self.dtype)

        hs, src_out = TwoWayTransformer(
            embed_dim=self.embed_dim, dtype=self.dtype, name="transformer"
        )(src_flat, pe_flat, tokens)
        iou_out = hs[:, 0]
        mask_tokens_out = hs[:, 1 : 1 + num_mask_tokens]

        grid = src_out.reshape(b, d, h, w, c)
        up = nn.ConvTranspose(
            self.embed_dim // 4, (2, 2, 2), strides=(2, 2, 2),
            dtype=self.dtype, name="upscale1",
        )(grid)
        up = nn.LayerNorm(dtype=jnp.float32, name="upscale_norm")(up)
        up = jax.nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(
            self.embed_dim // 8, (2, 2, 2), strides=(2, 2, 2),
            dtype=self.dtype, name="upscale2",
        )(up)
        up = jax.nn.gelu(up, approximate=False)  # (B, 4d, 4h, 4w, C/8)

        hyper = jnp.stack(
            [
                _HyperMLP(
                    self.embed_dim, self.embed_dim // 8, dtype=self.dtype,
                    name=f"hyper_mlp{i}",
                )(mask_tokens_out[:, i])
                for i in range(num_mask_tokens)
            ],
            axis=1,
        )  # (B, M, C/8)
        bu, du, hu, wu, cu = up.shape
        up_flat = up.reshape(bu, du * hu * wu, cu)
        masks = jnp.einsum("bmc,bnc->bmn", hyper, up_flat)

        if text_embedding is not None:
            txt_down = nn.Dense(
                self.embed_dim // 8, dtype=self.dtype,
                name="txt_align_upscaled_embedding",
            )(text_embedding.astype(self.dtype))
            sim = jnp.einsum("bc,bnc->bn", txt_down, up_flat)
            masks = masks + sim[:, None, :]

        masks = masks.reshape(bu, -1, du, hu, wu)
        iou_pred = _HyperMLP(
            self.iou_head_hidden, num_mask_tokens, dtype=self.dtype,
            name="iou_prediction_head",
        )(iou_out)
        return masks, iou_pred


class SegVol(nn.Module):
    """Full SegVol: encoder -> prompt encoder -> decoder -> input-res logits.

    `swin` selects the hierarchical 3D Swin encoder variant the reference
    vendors but never registers (image_encoder_swin.py; sam_model_registry
    exposes only 'vit', build_sam.py:46-48) — here a first-class option.
    The default SwinConfig emits a (4,16,16)x768 grid, matching the
    decoder/prompt dims of the ViT path.
    """

    vision: ViT3DConfig
    swin: Optional[SwinConfig] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        import dataclasses

        cfg = dataclasses.replace(self.vision, classification=False)
        if self.swin is not None:
            from hsenet_tpu.models.swin import SwinTransformer3D

            self.image_encoder = SwinTransformer3D(self.swin, dtype=self.dtype)
            self._grid = self.swin.grid
            self._embed_dim = self.swin.out_dim
        else:
            self.image_encoder = ViT3D(cfg, dtype=self.dtype)
            self._grid = cfg.grid
            self._embed_dim = cfg.hidden_size
        self.prompt_encoder = PromptEncoder3D(
            embed_dim=self._embed_dim, grid=self._grid, dtype=self.dtype
        )
        self.mask_decoder = MaskDecoder3D(
            embed_dim=self._embed_dim, dtype=self.dtype
        )

    def encode_image(self, volume: jax.Array) -> jax.Array:
        """(B, 1, D, H, W) -> (B, gd, gh, gw, C) feature grid — the cacheable
        half of inference (the reference predictor caches exactly this,
        predictor.py:34-90 set_image)."""
        feats = self.image_encoder(volume)
        gd, gh, gw = self._grid
        if feats.ndim == 3:  # ViT token stream; swin already returns a grid
            feats = feats.reshape(feats.shape[0], gd, gh, gw, self._embed_dim)
        return feats

    def decode(
        self,
        grid_feats: jax.Array,  # (B, gd, gh, gw, C)
        out_shape: Tuple[int, int, int],  # static (D, H, W) of the volume
        text_embedding: Optional[jax.Array] = None,
        boxes: Optional[jax.Array] = None,
        points=None,
        multimask_output: bool = False,
    ) -> jax.Array:
        """Prompt encode + mask decode + trilinear upsample to `out_shape`
        (the per-prompt half; reference predictor.py:92-243 predict)."""
        sparse, dense = self.prompt_encoder(
            text_embedding=text_embedding, boxes=boxes, points=points
        )
        masks, iou_pred = self.mask_decoder(
            grid_feats, self.prompt_encoder.dense_pe(), sparse, dense,
            text_embedding,
        )
        masks = masks[:, 1:] if multimask_output else masks[:, :1]
        d, h, w = out_shape
        logits = jax.vmap(
            lambda m: jax.image.resize(
                m, (m.shape[0], d, h, w), method="trilinear"
            )
        )(masks.astype(jnp.float32))
        return logits

    def __call__(
        self,
        volume: jax.Array,  # (B, 1, D, H, W)
        text_embedding: Optional[jax.Array] = None,  # (B, 768)
        boxes: Optional[jax.Array] = None,
        points=None,
        multimask_output: bool = False,
    ) -> jax.Array:
        grid_feats = self.encode_image(volume)
        return self.decode(
            grid_feats,
            tuple(volume.shape[2:]),
            text_embedding=text_embedding,
            boxes=boxes,
            points=points,
            multimask_output=multimask_output,
        )


# -------------------------------------------------------------- losses


def binary_dice_loss(logits: jax.Array, targets: jax.Array,
                     smooth: float = 1.0) -> jax.Array:
    """Reference `BinaryDiceLoss` (model/loss.py:5-24): sigmoid + soft dice."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32)).reshape(logits.shape[0], -1)
    t = targets.astype(jnp.float32).reshape(targets.shape[0], -1)
    inter = jnp.sum(p * t, axis=1)
    denom = jnp.sum(p, axis=1) + jnp.sum(t, axis=1)
    dice = (2 * inter + smooth) / (denom + smooth)
    return jnp.mean(1.0 - dice)


def masked_bce_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Reference `BCELoss` (model/loss.py:27-43): BCE-with-logits ignoring
    voxels labeled -1."""
    t = targets.astype(jnp.float32)
    valid = t >= 0
    safe_t = jnp.where(valid, t, 0.0)
    x = logits.astype(jnp.float32)
    bce = jnp.maximum(x, 0) - x * safe_t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    denom = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, bce, 0.0).sum() / denom
