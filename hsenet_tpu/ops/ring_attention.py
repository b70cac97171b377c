"""Ring attention: exact attention with the sequence axis sharded.

The reference caps its context at whatever one GPU's attention memory
allows (a 2049-token ViT sequence, `vit.py:464-466`; a few-K-token LLM
context) and has no sequence-scaling story at all (SURVEY.md §2.10 — DDP
only). On TPU the natural scale-out for long sequences is a ring over an
'sp' mesh axis: every device holds one contiguous sequence chunk of Q, K
and V, computes blockwise attention of its local Q against the K/V chunk
it currently holds, accumulates with the online-softmax recurrence
(running row-max m, normalizer l, unnormalized accumulator acc — the
flash-attention state), and rotates K/V one hop around the ring with
`jax.lax.ppermute` so after `sp` steps every Q block has seen every K/V
block. Attention memory and score-matrix FLOPs per device drop by sp×,
collectives ride adjacent ICI links, and the result is bit-for-bit the
same softmax as the dense computation (up to f32 accumulation order).

Designed to run INSIDE `shard_map` (see `parallel/sp.py` for the jit-level
wrappers). Reverse-mode AD works end-to-end: `ppermute` transposes to the
inverse rotation, so `jax.grad` through a ring-attention forward IS ring
backprop — no hand-written backward schedule.

The per-hop attention is plain einsum + online softmax (f32 accumulators)
rather than a Pallas call: each hop's score block is (S/sp, S/sp), small
enough that XLA fuses the mask/exp/scale chain into the two MXU matmuls;
the Pallas flash kernel stays the single-device path (ops/flash_attention).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # finite mask value: exp(_NEG_INF - m) underflows to 0 in f32


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    axis_size: int,
    kv_len: Optional[int] = None,
    kv_lens: Optional[jax.Array] = None,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
) -> jax.Array:
    """Exact attention over a sequence sharded on `axis_name`.

    Must be called inside `shard_map` with the sequence axis of q/k/v
    sharded over `axis_name` in contiguous chunks (chunk i = global
    positions [i*S_local, (i+1)*S_local)).

    Args:
      q: (B, H, S_local, D) local query chunk.
      k, v: (B, Hkv, S_local, D) local key/value chunks. Hkv may divide H
        (GQA): the UNEXPANDED kv heads travel the ring — a hop's ICI
        payload stays Hkv-sized — and queries are grouped per kv head for
        the score/value einsums instead of materializing repeats.
      axis_name: mesh axis the sequence is sharded over.
      axis_size: static size of that axis (sp degree).
      kv_len: optional static global count of valid tokens; global key
        positions >= kv_len are masked out (tail padding from rounding the
        sequence up to a multiple of axis_size). Padded QUERY rows produce
        garbage that callers must drop — only key masking is applied.
      kv_lens: optional (B,) per-row valid GLOBAL lengths (ragged
        right-padded batches, the decoder convention); key positions >=
        kv_lens[b] are masked for row b. Composes with kv_len/causal.
      causal: apply the global causal mask (query position >= key position).
      sm_scale: softmax scale, default 1/sqrt(D).
      block_q: when set, each hop streams query blocks of this size
        through the chunk (flash pattern at the XLA level, body
        rematerialized for backward) instead of materializing the full
        (S_local, S_local) score block — REQUIRED once S_local grows past
        a few K tokens, where the dense per-hop scores would blow HBM
        (the 65k-token workloads sp exists for). None = dense hop.

    Returns (B, H, S_local, D) in q.dtype — this device's output chunk.
    """
    b, h, s_local, d = q.shape
    hkv = k.shape[1]
    assert h % hkv == 0, (h, hkv)
    g = h // hkv  # GQA group size; queries grouped per kv head
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    idx = jax.lax.axis_index(axis_name)
    q_pos = idx * s_local + jnp.arange(s_local, dtype=jnp.int32)  # (S,)
    qg = q.reshape(b, hkv, g, s_local, d)

    m = jnp.full((b, hkv, g, s_local), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, hkv, g, s_local), jnp.float32)
    acc = jnp.zeros((b, hkv, g, s_local, d), jnp.float32)
    # send-left rotation: after t hops this device holds chunk (idx+t)%sp,
    # so consecutive hops touch adjacent ICI neighbours
    perm = [(i, (i - 1) % axis_size) for i in range(axis_size)]

    def hop_stats(k_c, v_c, k_pos):
        """(m_hop, l_hop, pv_hop) of local queries vs the held chunk.

        m_hop: per-query row max of the (masked) scores; l_hop: sum of
        exp(s - m_hop); pv_hop: exp(s - m_hop) @ V — the hop-local flash
        statistics merged across hops below.
        """
        k_mask = None
        if kv_len is not None and kv_len < axis_size * s_local:
            k_mask = k_pos < kv_len  # (Sk,)
        if kv_lens is not None:
            r = k_pos[None, :] < kv_lens[:, None]  # (B, Sk)
            k_mask = (
                r if k_mask is None else jnp.logical_and(k_mask[None, :], r)
            )

        def block(q_blk, q_pos_blk):
            s = jnp.einsum(
                "bhgqd,bhkd->bhgqk", q_blk, k_c,
                preferred_element_type=jnp.float32,
            ) * sm_scale
            mask = None
            if k_mask is not None:
                km = k_mask if k_mask.ndim == 2 else k_mask[None, :]
                mask = km[:, None, None, None, :]  # (B|1,1,1,1,Sk)
            if causal:
                c = k_pos[None, :] <= q_pos_blk[:, None]  # (Sq, Sk)
                c = c[None, None, None]
                mask = c if mask is None else jnp.logical_and(mask, c)
            if mask is not None:
                s = jnp.where(mask, s, _NEG_INF)
            m_h = s.max(axis=-1)
            p = jnp.exp(s - m_h[..., None])
            l_h = p.sum(axis=-1)
            pv = jnp.einsum(
                "bhgqk,bhkd->bhgqd",
                p.astype(v_c.dtype),
                v_c,
                preferred_element_type=jnp.float32,
            )
            return m_h, l_h, pv

        if block_q is None or block_q >= s_local:
            return block(qg, q_pos)
        # stream query blocks through the chunk: peak score memory drops
        # from (S_local, S_local) to (block_q, S_local); the body is
        # rematerialized so backward recomputes p instead of saving it
        nb = -(-s_local // block_q)
        pad = nb * block_q - s_local
        qp = jnp.pad(qg, ((0, 0),) * 3 + ((0, pad), (0, 0)))
        # padded q rows: sentinel position past every key — their garbage
        # rows are trimmed below
        pp = jnp.pad(
            q_pos, (0, pad), constant_values=axis_size * s_local
        )
        qb = jnp.moveaxis(
            qp.reshape(b, hkv, g, nb, block_q, d), 3, 0
        )  # (nb, B, Hkv, G, bq, D)
        pb = pp.reshape(nb, block_q)
        m_h, l_h, pv = jax.lax.map(
            jax.checkpoint(lambda args: block(*args)), (qb, pb)
        )
        def unblk(x):
            x = jnp.moveaxis(x, 0, 3)  # (B,Hkv,G,nb,bq,...)
            x = x.reshape((b, hkv, g, nb * block_q) + x.shape[5:])
            return x[:, :, :, :s_local]
        return unblk(m_h), unblk(l_h), unblk(pv)

    k_c, v_c = k, v
    for t in range(axis_size):
        # issue the next hop's rotation BEFORE this hop's math: the
        # collective has no data dependency on the einsums below, so the
        # scheduler can overlap the ICI transfer with the attention block
        if t != axis_size - 1:  # last hop's rotation would be a no-op wait
            k_n = jax.lax.ppermute(k_c, axis_name, perm)
            v_n = jax.lax.ppermute(v_c, axis_name, perm)
        src = (idx + t) % axis_size  # global chunk index currently held
        k_pos = src * s_local + jnp.arange(s_local, dtype=jnp.int32)
        m_hop, l_hop, pv_hop = hop_stats(k_c, v_c, k_pos)
        m_new = jnp.maximum(m, m_hop)
        # fully-masked-so-far rows: keep m at a finite sentinel so exp()
        # below sees finite arguments (their mass washes out once a real
        # chunk raises m_new; see _NEG_INF note)
        alpha = jnp.exp(m - m_new)  # first hop: exp(-inf - finite) = 0
        beta = jnp.exp(m_hop - m_new)
        l = l * alpha + l_hop * beta
        acc = acc * alpha[..., None] + pv_hop * beta[..., None]
        m = m_new
        if t != axis_size - 1:
            k_c, v_c = k_n, v_n

    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.reshape(b, h, s_local, d).astype(q.dtype)


def pad_to_multiple(x: jax.Array, multiple: int, axis: int) -> jax.Array:
    """Zero-pad `axis` of x up to the next multiple (no-op if already there)."""
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def local_chunk(x: jax.Array, axis_name: str, axis_size: int, axis: int):
    """Slice this device's contiguous chunk of `axis` (inside shard_map).

    `x` must already be padded so shape[axis] % axis_size == 0."""
    size = x.shape[axis]
    assert size % axis_size == 0, (size, axis_size)
    chunk = size // axis_size
    idx = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice_in_dim(x, idx * chunk, chunk, axis=axis)
