"""Pallas TPU flash attention.

The encode hot loop of the framework is 12 transformer blocks over 2049
tokens per CT volume, twice (dual towers) — reference call stack in
SURVEY.md §3.1/§3.3 (vit.py:464-466). XLA materialises the (S,S) score
matrix in HBM; this kernel keeps the online-softmax accumulation in VMEM,
streaming K/V blocks, which makes ViT attention HBM-bandwidth-optimal.

Design:
  * grid = (batch, heads, Sq/BQ); K and V for one (b,h) live fully in VMEM
    (2176x64 f32 = 0.56 MB each — small against the ~16 MB VMEM budget).
  * online softmax in f32 regardless of input dtype.
  * variable-length masking via a scalar-prefetched per-batch kv_len, so
    padded sequences (2049 -> 2176) and padded text batches cost no extra
    HBM traffic and attend correctly.
  * causal mode with a query-offset for KV-cache prefill.
  * backward pass: recompute-based custom VJP (XLA attention under remat
    semantics). A fused Pallas backward is a later optimisation.

The kernel runs in interpret mode off-TPU so the whole test suite exercises
it on CPU.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
# One K/V block per grid cell whenever the sequence fits the VMEM budget:
# measured on v5e, full-K (no inner loop, degenerate online softmax) runs the
# 2049-token ViT attention ~1.75x faster than 256-wide K streaming. Longer
# sequences stream in blocks of this cap.
DEFAULT_BLOCK_K = 2304
NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(
    kv_len_ref,  # (B,) i32 scalar-prefetch: valid kv length per batch row
    q_off_ref,  # (1,) i32 scalar-prefetch: causal query offset
    q_ref,  # (BQ, D)
    k_ref,  # (Skv, D)
    v_ref,  # (Skv, D)
    o_ref,  # (BQ, D)
    *,
    block_k: int,
    sm_scale: float,
    causal: bool,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    skv = k_ref.shape[2]
    block_q, d = q_ref.shape[2], q_ref.shape[3]
    kv_len = kv_len_ref[b]
    q_off = q_off_ref[0]

    # Inputs stay in their storage dtype (bf16 on the production path): the
    # MXU multiplies bf16 natively with f32 accumulation via
    # preferred_element_type — upcasting first would halve MXU throughput.
    q = q_ref[0, 0]
    num_k_blocks = skv // block_k

    row_ids = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )

    def body(j, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        v_blk = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q,
            k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * sm_scale
        col_ids = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = col_ids < kv_len
        if causal:
            mask = jnp.logical_and(mask, col_ids <= row_ids + q_off)
        s = jnp.where(mask, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_prev * corr + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * corr + jax.lax.dot_general(
            p.astype(v_blk.dtype),
            v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_k_blocks, body, (acc0, m0, l0))
    # fully-masked rows (query padding) produce l == 0; avoid 0/0
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def _flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_lens: jax.Array,
    *,
    causal: bool,
    q_offset: int,
    sm_scale: float,
    block_q: int,
    block_k: int,
    interpret: bool,
) -> jax.Array:
    batch, heads, sq, d = q.shape
    skv = k.shape[2]
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_k)
    # Mosaic tiles the lane (last) dim at 128; pad 64-wide heads up so every
    # VMEM slice stays aligned. Zero-padded K columns contribute 0 to scores;
    # padded V columns produce output columns we slice off below.
    d_pad = _round_up(d, 128)

    if sq_pad != sq or d_pad != d:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    if skv_pad != skv or d_pad != d:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_pad - skv), (0, d_pad - d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_pad - skv), (0, d_pad - d)))

    kv_lens = jnp.minimum(kv_lens.astype(jnp.int32), skv)
    q_off = jnp.array([q_offset], jnp.int32)

    grid = (batch, heads, sq_pad // block_q)
    kernel = functools.partial(
        _flash_kernel, block_k=block_k, sm_scale=sm_scale, causal=causal
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d_pad), lambda b, h, i, *_: (b, h, i, 0)
            ),
            pl.BlockSpec(
                (1, 1, skv_pad, d_pad), lambda b, h, i, *_: (b, h, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, skv_pad, d_pad), lambda b, h, i, *_: (b, h, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d_pad), lambda b, h, i, *_: (b, h, i, 0)
        ),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, heads, sq_pad, d_pad), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * heads * sq_pad * skv_pad * d_pad,
            bytes_accessed=(
                q.size * q.dtype.itemsize
                + k.size * k.dtype.itemsize
                + v.size * v.dtype.itemsize
                + batch * heads * sq_pad * d_pad * q.dtype.itemsize
            ),
            transcendentals=batch * heads * sq_pad * skv_pad,
        ),
    )(kv_lens, q_off, q, k, v)
    if sq_pad != sq or d_pad != d:
        out = out[:, :, :sq, :d]
    return out


def _xla_attention(q, k, v, kv_lens, *, causal, q_offset, sm_scale):
    """Reference attention used for the recompute backward (and CPU path)."""
    batch, _, sq, _ = q.shape
    skv = k.shape[2]
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    )
    s = s * sm_scale
    col = jnp.arange(skv)[None, None, None, :]
    mask = col < kv_lens[:, None, None, None]
    if causal:
        row = jnp.arange(sq)[None, None, :, None]
        mask = jnp.logical_and(mask, col <= row + q_offset)
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9)
)
def _flash_attention_core(
    q, k, v, kv_lens, causal, q_offset, sm_scale, block_q, block_k, interpret
):
    return _flash_forward(
        q,
        k,
        v,
        kv_lens,
        causal=causal,
        q_offset=q_offset,
        sm_scale=sm_scale,
        block_q=block_q,
        block_k=block_k,
        interpret=interpret,
    )


def _core_fwd(
    q, k, v, kv_lens, causal, q_offset, sm_scale, block_q, block_k, interpret
):
    out = _flash_attention_core(
        q, k, v, kv_lens, causal, q_offset, sm_scale, block_q, block_k, interpret
    )
    return out, (q, k, v, kv_lens)


def _core_bwd(causal, q_offset, sm_scale, block_q, block_k, interpret, res, g):
    q, k, v, kv_lens = res
    # Recompute-based backward: grads of the mathematically-identical XLA
    # attention. O(S^2) HBM only inside backward, like jax.remat.
    def f(q, k, v):
        return _xla_attention(
            q, k, v, kv_lens, causal=causal, q_offset=q_offset, sm_scale=sm_scale
        )

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_lens: Optional[jax.Array] = None,
    causal: bool = False,
    q_offset: int = 0,
    sm_scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash attention over (batch, heads, seq, head_dim) arrays.

    Args:
      q: (B, H, Sq, D) queries.
      k, v: (B, Hkv, Skv, D); Hkv must equal H (expand GQA beforehand or use
        `hsenet_tpu.ops.attention.multi_head_attention`).
      kv_lens: optional (B,) valid KV lengths (padding mask). Defaults to Skv.
      causal: lower-triangular masking, offset by `q_offset` (for prefill
        where queries start at position q_offset in the KV sequence).
      sm_scale: softmax scale, default 1/sqrt(D).
    """
    batch, heads, _, d = q.shape
    skv = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if kv_lens is None:
        kv_lens = jnp.full((batch,), skv, jnp.int32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_q = min(block_q, _round_up(q.shape[2], 128))
    block_k = min(block_k, _round_up(skv, 128))
    return _flash_attention_core(
        q, k, v, kv_lens, causal, q_offset, sm_scale, block_q, block_k, interpret
    )
