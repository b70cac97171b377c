"""HSENet VLM: dual vision towers + dual spatial packers + Phi LLM.

Reference assembly (`model/lamed_arch.py` + `train_VLM.py`):
  * `encode_images` (lamed_arch.py:122-141): dual tower -> per-stream packer
    (`mm_projector`, `mm_projector2`) -> concat = 256 image tokens.
  * `prepare_inputs_for_multimodal` (lamed_arch.py:143-155): embed the token
    ids, then splice the image features over the `<im_patch>` placeholder
    block immediately after BOS:
    cat(embeds[:, :1], image_feats, embeds[:, 1+n_img:]).
  * forward routes the spliced embeddings through the LLM
    (lamed_phi3.py:41-148); labels carry -100 over question+image+pad
    positions (dataset rule, multi_dataset.py:484-501).

The splice is a pure function on embeddings here; generation prefability
comes from `Phi3ForCausalLM.decode_embeds` + KV cache.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hsenet_tpu.configs import VLMConfig
from hsenet_tpu.models.phi3 import KVCache, Phi3ForCausalLM
from hsenet_tpu.models.projector import build_projector
from hsenet_tpu.models.vit import DualVisionTower

Dtype = Any


def splice_image_embeds(
    token_embeds: jax.Array, image_feats: jax.Array
) -> jax.Array:
    """Overwrite the placeholder block right after BOS with image features.

    Mirrors lamed_arch.py:150-155 exactly (fixed-position splice: the
    datasets always place proj_out_num `<im_patch>` tokens at positions
    1..n_img).
    """
    n_img = image_feats.shape[1]
    return jnp.concatenate(
        [
            token_embeds[:, :1, :],
            image_feats.astype(token_embeds.dtype),
            token_embeds[:, 1 + n_img :, :],
        ],
        axis=1,
    )


class HSENetVLM(nn.Module):
    config: VLMConfig
    dtype: Dtype = jnp.bfloat16
    remat: bool = False

    def setup(self):
        cfg = self.config
        # med2e3 mode runs the plain 3D tower; the projector consumes the
        # raw 2D slice features + prompt embeddings (lamed_arch.py:134-136)
        tower_mode = "3d_vit" if cfg.tower_mode == "med2e3" else cfg.tower_mode
        self.vision_tower = DualVisionTower(
            cfg.vision,
            tower_mode=tower_mode,
            select_feature=cfg.select_feature,
            dtype=self.dtype,
            remat=self.remat,
            name="vision_tower",
        )
        if cfg.tower_mode == "med2e3":
            from hsenet_tpu.models.projector import Med2E3Projector

            self.mm_projector = Med2E3Projector(
                cfg.packer,
                num_slices=cfg.vision.num_slices,
                dtype=self.dtype,
                name="mm_projector",
            )
        else:
            self.mm_projector = build_projector(
                cfg.packer, dtype=self.dtype, name="mm_projector"
            )
        if cfg.tower_mode == "dual_vits":
            if cfg.use_parallel_projector:
                self.mm_projector2 = build_projector(
                    cfg.packer, dtype=self.dtype, name="mm_projector2"
                )
            else:
                self.mm_projector2 = None
        self.llm = Phi3ForCausalLM(
            cfg.llm, dtype=self.dtype, remat=self.remat, name="llm"
        )
        if cfg.online_slice_features:
            from hsenet_tpu.configs import ViT2DConfig
            from hsenet_tpu.models.vit import OnlineSliceFeatures

            self.slice_encoder = OnlineSliceFeatures(
                cfg.vit2d or ViT2DConfig(),
                num_slices=cfg.vision.num_slices,
                dtype=self.dtype,
                name="slice_encoder",
            )
        if cfg.seg_enable:
            seg_cfg = cfg.seg_vision or dataclasses.replace(
                cfg.vision, classification=False
            )
            from hsenet_tpu.models.segvol import SegVol

            self.seg_module = SegVol(seg_cfg, dtype=self.dtype, name="seg_module")
            # Linear-ReLU-Linear-Dropout projector (lamed_arch.py:91-96);
            # the trailing Dropout(0.1) is applied in forward_with_seg so it
            # can be gated by `deterministic`.
            self.seg_projector = nn.Sequential(
                [
                    nn.Dense(cfg.llm.hidden_size, dtype=self.dtype),
                    jax.nn.relu,
                    nn.Dense(cfg.vision.hidden_size, dtype=self.dtype),
                ],
                name="seg_projector",
            )
            self.seg_dropout = nn.Dropout(0.1, name="seg_dropout")

    def encode_images(
        self,
        volume: jax.Array,
        slice_features: Optional[jax.Array] = None,
        *,
        text_embeds: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.config
        if slice_features is None and cfg.online_slice_features:
            slice_features = self.slice_encoder(
                volume, deterministic=deterministic
            )
        feats = self.vision_tower(
            volume, slice_features, deterministic=deterministic
        )
        if cfg.stop_tower_gradients:
            feats = jax.tree.map(jax.lax.stop_gradient, feats)
        if cfg.tower_mode == "dual_vits":
            f1, f2 = feats
            p1 = self.mm_projector(f1, deterministic=deterministic)
            proj2 = self.mm_projector2 or self.mm_projector
            p2 = proj2(f2, deterministic=deterministic)
            return jnp.concatenate([p1, p2], axis=1)
        if cfg.tower_mode == "med2e3":
            # text-guided slice scoring needs the prompt embeddings
            # (lamed_arch.py:134-136 med2e3 dispatch)
            return self.mm_projector(
                feats, slice_features, text_embeds,
                deterministic=deterministic,
            )
        return self.mm_projector(feats, deterministic=deterministic)

    def multimodal_embeds(
        self,
        input_ids: jax.Array,
        volume: Optional[jax.Array],
        slice_features: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        embeds = self.llm.embed_tokens(input_ids)
        if volume is None:
            return embeds
        image_feats = self.encode_images(
            volume, slice_features, text_embeds=embeds,
            deterministic=deterministic,
        )
        return splice_image_embeds(embeds, image_feats)

    def __call__(
        self,
        input_ids: jax.Array,
        volume: Optional[jax.Array] = None,
        slice_features: Optional[jax.Array] = None,
        *,
        kv_lens: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """Training/eval forward: returns logits (B, S, V)."""
        embeds = self.multimodal_embeds(
            input_ids, volume, slice_features, deterministic=deterministic
        )
        logits, _ = self.llm.decode_embeds(
            embeds, kv_lens=kv_lens, deterministic=deterministic
        )
        return logits

    def prefill(
        self,
        input_ids: jax.Array,
        volume: Optional[jax.Array],
        slice_features: Optional[jax.Array],
        cache: KVCache,
        kv_lens: jax.Array,
    ) -> Tuple[jax.Array, KVCache]:
        """Generation prefill: returns (last-valid-token logits, cache)."""
        embeds = self.multimodal_embeds(
            input_ids, volume, slice_features, deterministic=True
        )
        logits, cache = self.llm.decode_embeds(
            embeds, kv_lens=kv_lens, cache=cache, last_token_only=True
        )
        return logits[:, 0], cache

    def encode_images_only(
        self,
        volume: jax.Array,
        slice_features: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Vision side alone: towers + packers -> (B, n_img, llm_hidden).

        The prompt-independent, cacheable prefix of multimodal prefill —
        serving traffic that asks several questions about one CT volume
        (the reference's VQA protocol, eval_HSENet_Rad_Geome_VQA.py asks
        per-anatomy question sets per scan) re-encodes nothing
        (serving.py volume cache). Not valid for tower_mode='med2e3',
        whose projector consumes the prompt embeddings."""
        if self.config.tower_mode == "med2e3":
            raise ValueError(
                "med2e3 image features depend on the prompt; they cannot "
                "be cached per volume"
            )
        return self.encode_images(volume, slice_features, deterministic=True)

    def prefill_with_features(
        self,
        input_ids: jax.Array,
        image_feats: jax.Array,
        cache: KVCache,
        kv_lens: jax.Array,
    ) -> Tuple[jax.Array, KVCache]:
        """Prefill consuming precomputed image features (disaggregated
        encode/prefill): splice + LLM only. Composes with
        `encode_images_only`; token-identical to `prefill` (tested)."""
        embeds = self.llm.embed_tokens(input_ids)
        embeds = splice_image_embeds(embeds, image_feats)
        logits, cache = self.llm.decode_embeds(
            embeds, kv_lens=kv_lens, cache=cache, last_token_only=True
        )
        return logits[:, 0], cache

    def prefill_continue(
        self,
        input_ids: jax.Array,
        cache: KVCache,
        kv_lens: jax.Array,
    ) -> Tuple[jax.Array, KVCache]:
        """Text-only continuation prefill: append a question chunk to a
        cache row that already holds the prompt PREFIX's KV (serving's
        per-volume KV-prefix cache — the BOS + image block is identical
        for every question about one scan, so its KV is computed once and
        resumed here). `kv_lens` counts the NEW valid tokens in
        `input_ids`; positions and the causal mask continue from
        `cache.lengths` (the chunked-prefill `q_offset` path). No splice —
        the chunk is past the image block by construction."""
        embeds = self.llm.embed_tokens(input_ids)
        logits, cache = self.llm.decode_embeds(
            embeds, kv_lens=kv_lens, cache=cache, last_token_only=True
        )
        return logits[:, 0], cache

    def decode_step(
        self, token: jax.Array, cache: KVCache
    ) -> Tuple[jax.Array, KVCache]:
        """One decode step: token (B, 1) -> (logits (B, V), cache)."""
        embeds = self.llm.embed_tokens(token)
        logits, cache = self.llm.decode_embeds(embeds, cache=cache)
        return logits[:, 0], cache

    def verify_step(
        self, tokens: jax.Array, cache: KVCache, kv_lens: jax.Array
    ) -> Tuple[jax.Array, KVCache]:
        """Multi-token decode for speculative verification: tokens (B, K)
        -> (logits (B, K, V), cache). Runs the chunked-prefill path
        (per-row `q_offset` causal attention over the cache) so one
        forward scores K draft positions — see `eval/speculative.py`."""
        embeds = self.llm.embed_tokens(tokens)
        return self.llm.decode_embeds(embeds, kv_lens=kv_lens, cache=cache)

    def forward_with_seg(
        self,
        input_ids: jax.Array,
        volume: jax.Array,
        slice_features: Optional[jax.Array] = None,
        *,
        kv_lens: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """LM logits + SegVol logits driven by [SEG]-token hidden states.

        Mirrors lamed_phi3.py:87-135: the hidden state at the position
        *preceding* each [SEG] token (shifted mask, :106-113) is mean-pooled
        per row, projected to the vision width, and used as SegVol's text
        prompt. Rows with no [SEG] produce a zero prompt (caller gates their
        seg loss, as the reference gates by nonzero seg masks).
        """
        cfg = self.config
        assert cfg.seg_enable, "seg branch disabled in config"
        embeds = self.multimodal_embeds(
            input_ids, volume, slice_features, deterministic=deterministic
        )
        logits, _, hidden = self.llm.decode_embeds(
            embeds, kv_lens=kv_lens, deterministic=deterministic,
            return_hidden=True,
        )
        # mask: position t where token t+1 is [SEG] (shifted-left, zero tail)
        is_seg = input_ids == cfg.seg_token_id
        mask = jnp.concatenate(
            [is_seg[:, 1:], jnp.zeros_like(is_seg[:, :1])], axis=1
        ).astype(hidden.dtype)
        denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
        pooled = jnp.einsum("bs,bsh->bh", mask / denom, hidden)
        has_seg = mask.sum(axis=1) > 0
        prompt = self.seg_projector(pooled)
        prompt = self.seg_dropout(prompt, deterministic=deterministic)
        prompt = jnp.where(has_seg[:, None], prompt, 0.0)
        seg_logits = self.seg_module(volume, text_embedding=prompt)
        return logits, seg_logits
