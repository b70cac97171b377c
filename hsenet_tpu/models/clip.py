"""Dual-encoder CLIP models: stage 1 (3D ViT + BERT) and stage 2 (2E3).

Reference: `M3DCLIP_stage1` (model/CLIP_stage1.py:57-159) and
`M3DCLIP_stage2` (model/CLIP_stage2.py:58-196). Both share: BERT text
encoder, per-encoder Linear projection, L2 normalisation, learnable
logit_scale initialised to log(1/0.07) and — reference quirk — multiplied in
*raw* (never exponentiated) form (CLIP_stage1.py:144-152); `scale_is_log`
in `CLIPConfig` controls this.

Stage 2 adds the slice-guided 2E3 vision encoder and is trained against a
frozen stage-1 teacher with a semantic-consistency MSE between the teacher's
and student's logit matrices (CLIP_stage2.py:124-151,187-190). The teacher
here is simply a second (frozen) parameter tree for the same `CLIPModel`
module — functional JAX makes the teacher/student split a parameter
question, not a module-graph question.

Efficiency note: the reference projects and normalises *all* text/vision
tokens then keeps token 0 (CLIP_stage1.py:104-118). Projection is per-token,
so we take the CLS token first and project once — identical math, 1/2049th
of the projection FLOPs.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hsenet_tpu.configs import CLIPConfig
from hsenet_tpu.models.bert import BertEncoder
from hsenet_tpu.models.vit import MaskedViT3D, ViT3D

Dtype = Any


class CLIPModel(nn.Module):
    """Stage-1 or stage-2 CLIP depending on `config.vision.slice_guided`."""

    config: CLIPConfig
    dtype: Dtype = jnp.float32
    remat: bool = False

    def setup(self):
        cfg = self.config
        self.vision_encoder = ViT3D(
            cfg.vision, dtype=self.dtype, remat=self.remat, name="vision_encoder"
        )
        self.language_encoder = BertEncoder(
            cfg.text, dtype=self.dtype, name="language_encoder"
        )
        self.mm_vision_proj = nn.Dense(
            cfg.projection_dim, dtype=self.dtype, name="mm_vision_proj"
        )
        self.mm_language_proj = nn.Dense(
            cfg.projection_dim, dtype=self.dtype, name="mm_language_proj"
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda _key: jnp.asarray(cfg.logit_scale_init, jnp.float32),
        )

    def encode_image(
        self,
        volume: jax.Array,
        slice_features: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
        pooled: bool = True,
    ) -> jax.Array:
        feats = self.vision_encoder(
            volume, slice_features, deterministic=deterministic
        )
        if pooled:
            feats = feats[:, 0]  # CLS
        feats = self.mm_vision_proj(feats)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats

    def encode_text(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
        pooled: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (projected+normalised features, raw last_hidden_state)."""
        hidden = self.language_encoder(
            input_ids, attention_mask, deterministic=deterministic
        )
        feats = hidden[:, 0] if pooled else hidden
        feats = self.mm_language_proj(feats)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats, hidden

    def scale(self) -> jax.Array:
        s = self.logit_scale
        return jnp.exp(s) if self.config.scale_is_log else s

    def __call__(
        self,
        volume: jax.Array,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        slice_features: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ):
        """Returns (image_features, text_features, logit_scale)."""
        text_features, _ = self.encode_text(
            input_ids, attention_mask, deterministic=deterministic
        )
        image_features = self.encode_image(
            volume, slice_features, deterministic=deterministic
        )
        return image_features, text_features, self.scale()


class MaskedCLIPModel(nn.Module):
    """Legacy masked-contrastive CLIP (reference `M3DCLIP`, model/CLIP.py):
    dual-stream vision encoding (full + top-k masked), shared BERT text
    encoder and projections. Returns (img_f, img_f_masked, txt_f, scale)."""

    config: CLIPConfig
    dtype: Dtype = jnp.float32
    remat: bool = False

    def setup(self):
        cfg = self.config
        self.vision_encoder = MaskedViT3D(
            cfg.vision, dtype=self.dtype, remat=self.remat,
            name="vision_encoder",
        )
        self.language_encoder = BertEncoder(
            cfg.text, dtype=self.dtype, name="language_encoder"
        )
        self.mm_vision_proj = nn.Dense(
            cfg.projection_dim, dtype=self.dtype, name="mm_vision_proj"
        )
        self.mm_language_proj = nn.Dense(
            cfg.projection_dim, dtype=self.dtype, name="mm_language_proj"
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda _key: jnp.asarray(cfg.logit_scale_init, jnp.float32),
        )

    def _proj_norm(self, feats):
        feats = self.mm_vision_proj(feats[:, 0])
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def __call__(
        self,
        volume,
        input_ids,
        attention_mask=None,
        slice_features=None,
        unmasked_tokens: Optional[int] = None,
        *,
        deterministic: bool = True,
    ):
        hidden = self.language_encoder(
            input_ids, attention_mask, deterministic=deterministic
        )
        txt = self.mm_language_proj(hidden[:, 0])
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = (
            jnp.exp(self.logit_scale)
            if self.config.scale_is_log
            else self.logit_scale
        )
        if unmasked_tokens is None:
            full = self.vision_encoder(
                volume, slice_features, None, deterministic=deterministic
            )
            return self._proj_norm(full), txt, scale
        full, masked = self.vision_encoder(
            volume, slice_features, unmasked_tokens,
            deterministic=deterministic,
        )
        return self._proj_norm(full), self._proj_norm(masked), txt, scale
