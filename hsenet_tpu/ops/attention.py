"""Attention entry points: XLA reference + Pallas flash dispatch.

`multi_head_attention` is the single attention call-site used by every model
in the framework (ViT towers, BERT, Phi LLM). It dispatches to the Pallas
flash kernel on TPU and to a fused-by-XLA einsum/softmax path elsewhere, and
handles GQA head expansion and padding masks uniformly.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from hsenet_tpu.ops.flash_attention import flash_attention

# Flash dispatch policy:
#   "auto"   — Pallas flash on TPU and on single-device hosts; the XLA
#              einsum path for multi-device non-TPU programs. Off-TPU the
#              kernel runs in interpret mode, which lowers to an XLA
#              while-loop over the grid; under SPMD partitioning the
#              loop-carried (B, H, S_pad, D_pad) buffers pick up
#              conflicting shardings (batch-dp from the inputs vs tp/dp
#              propagated from sharded projection weights) and the
#              partitioner falls back to involuntary full
#              rematerialization — a full replicate+repartition per grid
#              step. The einsum path has no loop: XLA's dot partitioner
#              inserts the one small collective each reshard actually
#              needs. (On a real multi-chip TPU mesh the kernel must be
#              invoked per-device anyway — see ops/ring_attention.py for
#              the shard_map pattern.)
#   "always" — Pallas flash whenever seq > 1 (kernel-through-model tests).
#   "never"  — einsum path only (numerics A/B tests).
_FLASH_MODE = "auto"


def set_flash_enabled(enabled: bool) -> None:
    """Global switch (e.g. for numerics A/B tests)."""
    global _FLASH_MODE
    _FLASH_MODE = "auto" if enabled else "never"


def set_flash_mode(mode: str) -> None:
    """Set the flash dispatch policy: "auto" | "always" | "never"."""
    assert mode in ("auto", "always", "never"), mode
    global _FLASH_MODE
    _FLASH_MODE = mode


def sdpa_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_lens: Optional[jax.Array] = None,
    causal: bool = False,
    q_offset=0,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Plain scaled-dot-product attention (B, H, S, D); softmax in f32.

    Matches the reference math (`vit.py:25-33`): scores / sqrt(d), additive
    -inf masking, softmax, weighted sum. `q_offset` may be an int or a (B,)
    array of per-row causal offsets (chunked prefill into a non-empty cache).
    """
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    s = s * sm_scale
    sq, skv = q.shape[2], k.shape[2]
    if kv_lens is not None:
        col = jnp.arange(skv)[None, None, None, :]
        s = jnp.where(col < kv_lens[:, None, None, None], s, -1e30)
    if causal:
        col = jnp.arange(skv)[None, None, None, :]
        row = jnp.arange(sq)[None, None, :, None]
        q_off = jnp.broadcast_to(
            jnp.asarray(q_offset, jnp.int32), (q.shape[0],)
        )[:, None, None, None]
        s = jnp.where(col <= row + q_off, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_lens: Optional[jax.Array] = None,
    causal: bool = False,
    q_offset=0,
    sm_scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
    block_q: Optional[int] = None,
) -> jax.Array:
    """Attention over (B, H|Hkv, S, D) with GQA support and flash dispatch.

    `q_offset`: int or (B,) array of per-row causal query offsets.
    `block_q`: flash q-block override (None = kernel default)."""
    heads, kv_heads = q.shape[1], k.shape[1]
    if kv_heads != heads:
        assert heads % kv_heads == 0
        rep = heads // kv_heads
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    if use_flash is None:
        if _FLASH_MODE == "never":
            use_flash = False
        elif _FLASH_MODE == "always":
            use_flash = q.shape[2] > 1
        else:  # "auto" — see the policy note at the top of this module
            use_flash = q.shape[2] > 1 and (
                jax.default_backend() == "tpu" or jax.device_count() == 1
            )
    if use_flash:
        kwargs = {} if block_q is None else {"block_q": block_q}
        return flash_attention(
            q,
            k,
            v,
            kv_lens=kv_lens,
            causal=causal,
            q_offset=q_offset,
            sm_scale=sm_scale,
            **kwargs,
        )
    return sdpa_reference(
        q,
        k,
        v,
        kv_lens=kv_lens,
        causal=causal,
        q_offset=q_offset,
        sm_scale=sm_scale,
    )
