"""Phi-3 / Phi-4-mini decoder-only LLM in flax, TPU-first.

Architecture contract comes from HF `Phi3ForCausalLM` (the reference's LLM
backbone, `model/language_model/lamed_phi3.py:15-243`, loaded as Phi-4-mini
per train_VLM.py:62-65): RMSNorm, fused qkv_proj (q|k|v), GQA, partial
rotary embeddings (rotary_dim = partial_rotary_factor * head_dim), fused
gate_up_proj with SiLU gating, optional tied embeddings.

TPU design:
  * right-padded batches throughout — each row tracks its own KV-cache
    length, so decode writes land exactly after each prompt. (The reference
    leans on HF's attention-mask machinery; eval also pads right,
    Bench/eval/eval_HSENet_CT_Rate_MRG.py:412-428.)
  * train/prefill: causal flash attention with per-row valid lengths;
    decode: single-token query against a static-shape KV cache updated with
    per-row dynamic slices (donate the cache under jit for in-place reuse).
  * layers run under `nn.scan` (one compiled block body, stacked weights);
    the KV cache scans along the same leading layer axis.
  * LoRA via `LoRADense` on all four projections (reference peft targets,
    train_VLM.py:254-264).

Initialize with `input_ids` (not only embeds) so the embedding table always
materialises.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn
from flax import struct

from hsenet_tpu.configs import Phi3Config
from hsenet_tpu.models.lora import LoRADense
from hsenet_tpu.ops.attention import multi_head_attention

Dtype = Any


@struct.dataclass
class KVCache:
    """Static-shape KV cache; `dtype=jnp.int8` at `create` switches on
    quantized storage (per-(layer, row, head, token) f32 absmax scales in
    `k_scale`/`v_scale`, None in the plain bf16 cache). Batched decode is
    KV-READ-bound on HBM (BENCH.md batch sweep: per-step cache reads
    overtake the int8 weight stream past batch 16), so halving KV traffic
    is a direct aggregate-throughput lever; quantize/dequantize fuse into
    the attention dots. The reference has no KV quantization (HF fp16
    cache) — this is a TPU serving extension, opt-in everywhere."""

    k: jax.Array  # (num_layers, B, Hkv, T, D)
    v: jax.Array
    lengths: jax.Array  # (B,) valid tokens per row
    k_scale: Optional[jax.Array] = None  # (num_layers, B, Hkv, T) f32
    v_scale: Optional[jax.Array] = None

    @classmethod
    def create(
        cls, config: Phi3Config, batch: int, max_len: int, dtype=jnp.bfloat16
    ):
        shape = (
            config.num_layers,
            batch,
            config.num_kv_heads,
            max_len,
            config.head_dim,
        )
        quant = dtype == jnp.int8
        # k_scale/v_scale must be DISTINCT buffers: engine paths donate the
        # whole cache pytree, and XLA rejects donating one buffer twice.
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            lengths=jnp.zeros((batch,), jnp.int32),
            k_scale=jnp.zeros(shape[:-1], jnp.float32) if quant else None,
            v_scale=jnp.zeros(shape[:-1], jnp.float32) if quant else None,
        )

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def quantize_kv(x: jax.Array):
    """(..., S, D) -> int8 codes + per-(..., S) f32 scales (absmax/127)."""
    x32 = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1) / 127.0, 1e-10)
    q = jnp.clip(jnp.round(x32 / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


def dequantize_kv(q: jax.Array, scale: jax.Array, dtype) -> jax.Array:
    """Inverse of `quantize_kv`; fuses into the consuming attention dot."""
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def _rope_cos_sin(
    positions,
    rotary_dim,
    theta,
    dtype=jnp.float32,
    ext_factors=None,
    attention_scaling: float = 1.0,
):
    """positions: (B, S) -> cos/sin (B, S, rotary_dim), HF half-split layout.

    ext_factors/attention_scaling implement LongRoPE (HF
    _compute_longrope_parameters semantics): per-frequency divisors plus a
    global scale on cos/sin.
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim)
    )
    if ext_factors is not None:
        inv_freq = inv_freq / jnp.asarray(ext_factors, jnp.float32)
    freqs = positions[..., None].astype(jnp.float32) * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return (
        (jnp.cos(emb) * attention_scaling).astype(dtype),
        (jnp.sin(emb) * attention_scaling).astype(dtype),
    )


def _longrope_params(cfg: Phi3Config, total_len: int):
    """Static choice of LongRoPE factors for a given (static) max length."""
    if cfg.rope_short_factor is None and cfg.rope_long_factor is None:
        return None, 1.0
    import math

    use_long = total_len > cfg.original_max_position_embeddings
    ext = cfg.rope_long_factor if use_long else cfg.rope_short_factor
    factor = cfg.max_position_embeddings / cfg.original_max_position_embeddings
    if factor <= 1.0:
        scaling = 1.0
    else:
        scaling = math.sqrt(
            1 + math.log(factor) / math.log(cfg.original_max_position_embeddings)
        )
    return ext, scaling


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q, k, cos, sin, rotary_dim):
    """q,k: (B, H, S, D); cos/sin: (B, S, rotary_dim). Partial rotation."""
    cos = cos[:, None]
    sin = sin[:, None]

    def rot(x):
        x_rot, x_pass = x[..., :rotary_dim], x[..., rotary_dim:]
        x_rot = x_rot * cos + _rotate_half(x_rot) * sin
        return jnp.concatenate([x_rot, x_pass], axis=-1).astype(x.dtype)

    return rot(q), rot(k)


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "scale", nn.initializers.ones, (x.shape[-1],), jnp.float32
        )
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.eps)
        return (y * scale).astype(x.dtype)


def _update_cache_layer(cache_k, cache_v, k_new, v_new, lengths):
    """Write (B, Hkv, S, D) new keys/values at per-row offsets `lengths`."""

    def write_row(ck, cv, kn, vn, off):
        ck = jax.lax.dynamic_update_slice(ck, kn, (0, off, 0))
        cv = jax.lax.dynamic_update_slice(cv, vn, (0, off, 0))
        return ck, cv

    return jax.vmap(write_row)(cache_k, cache_v, k_new, v_new, lengths)


def _update_cache_layer_quant(
    cache_k, cache_v, k_scale, v_scale, kq, vq, ks_new, vs_new, lengths
):
    """Quantized-cache write: int8 codes (B, Hkv, S, D) + their scales
    (B, Hkv, S) land at the same per-row offsets."""

    def write_row(ck, cv, ks, vs, kn, vn, ksn, vsn, off):
        ck = jax.lax.dynamic_update_slice(ck, kn, (0, off, 0))
        cv = jax.lax.dynamic_update_slice(cv, vn, (0, off, 0))
        ks = jax.lax.dynamic_update_slice(ks, ksn, (0, off))
        vs = jax.lax.dynamic_update_slice(vs, vsn, (0, off))
        return ck, cv, ks, vs

    return jax.vmap(write_row)(
        cache_k, cache_v, k_scale, v_scale, kq, vq, ks_new, vs_new, lengths
    )


class Phi3Block(nn.Module):
    config: Phi3Config
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x, cos, sin, kv_lens, layer_cache, *, deterministic=True,
        sp_axis=None, sp_size=1, sp_block_q=None,
    ):
        """layer_cache: None or (k, v, lengths), k/v (B, Hkv, T, D).

        `sp_axis`/`sp_size`: sequence-parallel training (inside shard_map,
        x = this device's token chunk, cos/sin already per-chunk global
        positions, kv_lens = per-row GLOBAL lengths); attention runs the
        causal K/V ring (ops/ring_attention.py). Cache paths don't compose
        with sp (generation is token-recurrent, not sequence-wide).

        Returns (x, new_layer_kv or None).
        """
        cfg = self.config
        h = cfg.hidden_size

        y = RMSNorm(cfg.rms_norm_eps, name="input_norm")(x)
        # Separate q/k/v projections (HF fuses them; the converter splits the
        # fused weight). Separate matmuls keep tensor-parallel shardings
        # head-aligned: a 'tp' shard of the fused (q|k|v) output would
        # straddle the q/kv boundary and force resharding collectives.
        q = LoRADense(
            cfg.q_dim, use_bias=cfg.attention_bias, lora=cfg.lora,
            dtype=self.dtype, quantized=cfg.quant_int8, name="q_proj",
        )(y, deterministic=deterministic)
        k = LoRADense(
            cfg.kv_dim, use_bias=cfg.attention_bias, lora=cfg.lora,
            dtype=self.dtype, quantized=cfg.quant_int8, name="k_proj",
        )(y, deterministic=deterministic)
        v = LoRADense(
            cfg.kv_dim, use_bias=cfg.attention_bias, lora=cfg.lora,
            dtype=self.dtype, quantized=cfg.quant_int8, name="v_proj",
        )(y, deterministic=deterministic)
        q = rearrange(q, "b s (n d) -> b n s d", n=cfg.num_heads)
        k = rearrange(k, "b s (n d) -> b n s d", n=cfg.num_kv_heads)
        v = rearrange(v, "b s (n d) -> b n s d", n=cfg.num_kv_heads)
        q, k = apply_rope(q, k, cos, sin, cfg.rotary_dim)

        if sp_axis is not None:
            assert layer_cache is None, "sp is a training-path axis"
            from hsenet_tpu.ops.ring_attention import ring_attention

            # GQA is handled inside the ring (queries grouped per kv head)
            # so only the Hkv-sized k/v chunks ride the ICI hops
            attn = ring_attention(
                q, k, v, axis_name=sp_axis, axis_size=sp_size,
                kv_lens=kv_lens, causal=True, block_q=sp_block_q,
            )
            new_kv = None
        elif layer_cache is None:
            attn = multi_head_attention(q, k, v, kv_lens=kv_lens, causal=True)
            new_kv = None
        else:
            if len(layer_cache) == 5:
                # int8 cache: quantize the new rows, write codes + scales,
                # read back dequantized (the convert/mul fuse into the
                # attention dots, so HBM traffic stays int8)
                ck, cv, ksc, vsc, lengths = layer_cache
                kq, ks_new = quantize_kv(k)
                vq, vs_new = quantize_kv(v)
                ck, cv, ksc, vsc = _update_cache_layer_quant(
                    ck, cv, ksc, vsc, kq, vq, ks_new, vs_new, lengths
                )
                k_read = dequantize_kv(ck, ksc, q.dtype)
                v_read = dequantize_kv(cv, vsc, q.dtype)
                new_kv = (ck, cv, ksc, vsc)
            else:
                ck, cv, lengths = layer_cache
                ck, cv = _update_cache_layer(
                    ck, cv, k.astype(ck.dtype), v.astype(cv.dtype), lengths
                )
                k_read = ck.astype(q.dtype)
                v_read = cv.astype(q.dtype)
                new_kv = (ck, cv)
            s = q.shape[2]
            total = lengths + (1 if s == 1 else kv_lens)
            if s == 1:
                # decode: single-query attention over the cache (XLA matvec)
                attn = multi_head_attention(
                    q,
                    k_read,
                    v_read,
                    kv_lens=total,
                    use_flash=False,
                )
            else:
                # prefill: causal flash with per-row query offset = current
                # cache lengths, so chunked prefill into a non-empty cache
                # masks query i to cache columns <= lengths + i (lengths is
                # 0 on the common fresh-cache path, reducing to plain causal)
                attn = multi_head_attention(
                    q,
                    k_read,
                    v_read,
                    kv_lens=total,
                    causal=True,
                    q_offset=lengths,
                    # small chunks (speculative verify windows) skip the
                    # flash kernel: padding s<<block_q queries up to a
                    # q-block wastes MXU work; XLA sdpa is cheaper there
                    use_flash=None if s >= 64 else False,
                )

        attn = rearrange(attn, "b n s d -> b s (n d)")
        attn = LoRADense(
            h,
            use_bias=cfg.attention_bias,
            lora=cfg.lora,
            dtype=self.dtype,
            quantized=cfg.quant_int8,
            name="o_proj",
        )(attn, deterministic=deterministic)
        x = x + attn

        y = RMSNorm(cfg.rms_norm_eps, name="post_attn_norm")(x)
        gate = LoRADense(
            cfg.intermediate_size, lora=cfg.lora, dtype=self.dtype,
            quantized=cfg.quant_int8, name="gate_proj",
        )(y, deterministic=deterministic)
        up = LoRADense(
            cfg.intermediate_size, lora=cfg.lora, dtype=self.dtype,
            quantized=cfg.quant_int8, name="up_proj",
        )(y, deterministic=deterministic)
        y = jax.nn.silu(gate) * up
        y = LoRADense(
            h, lora=cfg.lora, dtype=self.dtype, quantized=cfg.quant_int8,
            name="down_proj",
        )(y, deterministic=deterministic)
        return x + y, new_kv


class Phi3Decoder(nn.Module):
    """Scanned decoder stack + final RMSNorm; operates on embeddings."""

    config: Phi3Config
    dtype: Dtype = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        inputs_embeds: jax.Array,
        *,
        kv_lens: Optional[jax.Array] = None,
        cache: Optional[KVCache] = None,
        positions: Optional[jax.Array] = None,
        deterministic: bool = True,
        sp_axis: Optional[str] = None,
        sp_size: int = 1,
        sp_global_len: Optional[int] = None,
        sp_block_q: Optional[int] = None,
    ) -> Tuple[jax.Array, Optional[KVCache]]:
        """`sp_axis`/`sp_size`/`sp_global_len`: sequence-parallel training —
        must run inside shard_map with `inputs_embeds` being this device's
        contiguous token chunk and `kv_lens` per-row GLOBAL lengths;
        positions and LongRoPE factors come from the global sequence
        (sp_global_len), attention is the causal ring (parallel/sp.py)."""
        cfg = self.config
        x = inputs_embeds.astype(self.dtype)
        b, s, _ = x.shape

        if sp_axis is not None:
            assert cache is None and positions is None, "sp = training path"
            assert kv_lens is not None, "sp needs global kv_lens"
            assert sp_global_len is not None
            idx = jax.lax.axis_index(sp_axis)
            positions = jnp.broadcast_to(
                idx * s + jnp.arange(s)[None, :], (b, s)
            )
        elif positions is None:
            if cache is not None:
                positions = cache.lengths[:, None] + jnp.arange(s)[None, :]
            else:
                positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        # LongRoPE factor choice is static: the max reachable position is the
        # cache capacity (generation), the global sequence length (sp
        # training), or the local sequence length (plain training)
        if cache is not None:
            total_len = cache.k.shape[3]
        elif sp_axis is not None:
            total_len = sp_global_len
        else:
            total_len = s
        ext_factors, attn_scaling = _longrope_params(cfg, total_len)
        cos, sin = _rope_cos_sin(
            positions, cfg.rotary_dim, cfg.rope_theta,
            ext_factors=ext_factors, attention_scaling=attn_scaling,
        )

        if kv_lens is None:
            kv_lens = jnp.full((b,), s, jnp.int32)

        def maybe_remat(body_fn):
            # remat the scan BODY FUNCTION, not the module class: statics
            # (the deterministic flag, sp axis/size) stay in the closure,
            # where jax.checkpoint never traces them. nn.remat(Phi3Block)
            # would convert bool kwargs to tracers and crash every
            # dropout>0 config at `if deterministic` (flax stochastic.py).
            if not self.remat:
                return body_fn
            policy = None  # "full": save block inputs only
            if cfg.remat_policy == "dots":
                policy = (
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                )
            return nn.remat(body_fn, prevent_cse=False, policy=policy)

        if cache is None:

            def body(block, carry):
                y, _ = block(
                    carry, cos, sin, kv_lens, None,
                    deterministic=deterministic,
                    sp_axis=sp_axis, sp_size=sp_size, sp_block_q=sp_block_q,
                )
                return y, None

            stack = nn.scan(
                maybe_remat(body),
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=cfg.num_layers,
            )
            x, _ = stack(Phi3Block(cfg, dtype=self.dtype, name="layers"), x)
            new_cache = None
        else:

            quant = cache.quantized

            def body(block, carry, layer_kv):
                y, new_kv = block(
                    carry,
                    cos,
                    sin,
                    kv_lens,
                    layer_kv + (cache.lengths,),
                    deterministic=deterministic,
                )
                return y, new_kv

            stack = nn.scan(
                maybe_remat(body),
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=0,
                out_axes=0,
                length=cfg.num_layers,
            )
            kv_in = (
                (cache.k, cache.v, cache.k_scale, cache.v_scale)
                if quant
                else (cache.k, cache.v)
            )
            x, kv_out = stack(
                Phi3Block(cfg, dtype=self.dtype, name="layers"), x, kv_in
            )
            appended = (
                jnp.ones_like(cache.lengths) if s == 1 else kv_lens
            )
            new_cache = KVCache(
                k=kv_out[0],
                v=kv_out[1],
                lengths=cache.lengths + appended,
                k_scale=kv_out[2] if quant else None,
                v_scale=kv_out[3] if quant else None,
            )
        x = RMSNorm(cfg.rms_norm_eps, name="norm")(x)
        return x, new_cache


class Phi3ForCausalLM(nn.Module):
    """Embeddings + decoder + LM head. Multi-method: `embed_tokens` and
    `decode_embeds` are exposed for the VLM's image-token splice."""

    config: Phi3Config
    dtype: Dtype = jnp.bfloat16
    remat: bool = False

    def setup(self):
        cfg = self.config
        if cfg.quant_int8_embed:
            from hsenet_tpu.models.lora import QuantEmbed

            self.embed = QuantEmbed(
                cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="embed"
            )
        else:
            self.embed = nn.Embed(
                cfg.vocab_size,
                cfg.hidden_size,
                dtype=self.dtype,
                embedding_init=nn.initializers.normal(stddev=0.02),
                name="embed",
            )
        self.decoder = Phi3Decoder(
            cfg, dtype=self.dtype, remat=self.remat, name="decoder"
        )
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(
                cfg.vocab_size, use_bias=False, dtype=self.dtype, name="lm_head"
            )

    def embed_tokens(self, input_ids: jax.Array) -> jax.Array:
        return self.embed(input_ids)

    def compute_logits(self, hidden: jax.Array) -> jax.Array:
        if self.config.tie_word_embeddings:
            return self.embed.attend(hidden)
        return self.lm_head(hidden)

    def decode_embeds(
        self,
        inputs_embeds: jax.Array,
        *,
        kv_lens: Optional[jax.Array] = None,
        cache: Optional[KVCache] = None,
        positions: Optional[jax.Array] = None,
        deterministic: bool = True,
        last_token_only: bool = False,
        return_hidden: bool = False,
    ):
        hidden, new_cache = self.decoder(
            inputs_embeds,
            kv_lens=kv_lens,
            cache=cache,
            positions=positions,
            deterministic=deterministic,
        )
        full_hidden = hidden
        if last_token_only:
            if kv_lens is not None and hidden.shape[1] > 1:
                idx = jnp.maximum(kv_lens - 1, 0)
                hidden = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)
            else:
                hidden = hidden[:, -1:]
        logits = self.compute_logits(hidden)
        if return_hidden:
            return logits, new_cache, full_hidden
        return logits, new_cache

    def __call__(
        self,
        input_ids: Optional[jax.Array] = None,
        *,
        inputs_embeds: Optional[jax.Array] = None,
        kv_lens: Optional[jax.Array] = None,
        cache: Optional[KVCache] = None,
        positions: Optional[jax.Array] = None,
        deterministic: bool = True,
        last_token_only: bool = False,
    ):
        if inputs_embeds is None:
            inputs_embeds = self.embed(input_ids)
        return self.decode_embeds(
            inputs_embeds,
            kv_lens=kv_lens,
            cache=cache,
            positions=positions,
            deterministic=deterministic,
            last_token_only=last_token_only,
        )


def convert_hf_phi3(state_dict, config: Phi3Config):
    """HF torch `Phi3ForCausalLM.state_dict()` -> flax params.

    Per-layer weights are stacked along a leading axis for the scanned stack.
    """
    import numpy as np

    def t(name):
        w = state_dict[name]
        try:
            w = w.detach().to("cpu").float().numpy()
        except AttributeError:
            w = np.asarray(w)
        return w

    def lin(prefix):
        return {"kernel": t(f"{prefix}.weight").T}

    def stack(trees):
        return jax.tree.map(lambda *xs: np.stack(xs), *trees)

    layers = []
    for i in range(config.num_layers):
        p = f"model.layers.{i}"
        # split HF's fused qkv_proj / gate_up_proj into separate kernels
        qkv = t(f"{p}.self_attn.qkv_proj.weight").T  # (hidden, q+2kv)
        q_w = qkv[:, : config.q_dim]
        k_w = qkv[:, config.q_dim : config.q_dim + config.kv_dim]
        v_w = qkv[:, config.q_dim + config.kv_dim :]
        gate_up = t(f"{p}.mlp.gate_up_proj.weight").T  # (hidden, 2*inter)
        gate_w = gate_up[:, : config.intermediate_size]
        up_w = gate_up[:, config.intermediate_size :]
        layers.append(
            {
                "input_norm": {"scale": t(f"{p}.input_layernorm.weight")},
                "q_proj": {"kernel": q_w},
                "k_proj": {"kernel": k_w},
                "v_proj": {"kernel": v_w},
                "o_proj": lin(f"{p}.self_attn.o_proj"),
                "post_attn_norm": {
                    "scale": t(f"{p}.post_attention_layernorm.weight")
                },
                "gate_proj": {"kernel": gate_w},
                "up_proj": {"kernel": up_w},
                "down_proj": lin(f"{p}.mlp.down_proj"),
            }
        )

    params = {
        "embed": {"embedding": t("model.embed_tokens.weight")},
        "decoder": {
            "layers": stack(layers),
            "norm": {"scale": t("model.norm.weight")},
        },
    }
    if not config.tie_word_embeddings and "lm_head.weight" in state_dict:
        params["lm_head"] = lin("lm_head")
    return {"params": params}
