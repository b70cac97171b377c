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
  * full Pallas backward (FlashAttention-2 style): the forward saves the
    per-row logsumexp; two kernels recompute P block-wise and produce dQ
    (grid over q blocks) and dK/dV (grid over k blocks) without ever
    materialising the (S, S) matrix in HBM. An XLA-recompute fallback
    remains selectable (`use_pallas_bwd=False`).
  * LONG sequences (sequence-parallel / fine-patching shapes, DESIGN.md
    §sp): when whole-KV residency would blow the ~16 MB scoped-VMEM
    budget, fwd and bwd switch to STREAMING variants with a fourth grid
    axis over KV (resp. Q) blocks and the online-softmax / grad carries
    held in VMEM scratch across grid steps — K/V stream from HBM a block
    at a time, so attention at 131k tokens compiles in the same ~5 MB
    VMEM footprint as the 2k ViT case. Selection is automatic
    (`_needs_stream`), overridable via `stream=`.

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

DEFAULT_BLOCK_Q = 1152  # 2 grid cells per (b, h) at the 2049-token ViT
# shape, softmax pipelined across 4 row-chunks of 288 inside the fast
# path. A whole-sequence block (2176) measured ~6% faster in isolation but
# exceeds the 16 MB scoped-VMEM budget inside larger fused programs; 1152
# keeps ~5 MB of score buffers live. The backward caps its own q-block
# separately (see _flash_backward).
# One K/V block per grid cell whenever the sequence fits the VMEM budget:
# measured on v5e, full-K (no inner loop, degenerate online softmax) runs the
# 2049-token ViT attention ~1.75x faster than 256-wide K streaming. Longer
# sequences stream in blocks of this cap.
DEFAULT_BLOCK_K = 2304
NEG_INF = -1e30

# Streaming (long-sequence) mode: 1024x1024 f32 score block = 4 MB, K/V
# stream per-block from HBM (double-buffered by Pallas), carries live in
# VMEM scratch. K/V are re-read once per q block — at the sequence lengths
# that trigger streaming the kernel is MXU-bound (attention FLOPs grow as
# S^2 while K/V traffic grows as S^2/BQ), so the re-reads hide under the
# score matmuls.
STREAM_BLOCK_Q = 1024
STREAM_BLOCK_K = 1024
# Scoped-VMEM budget the resident-KV layout must fit in (the hardware
# limit is 16 MB; leave headroom for Mosaic's own temporaries and for
# fusion into larger programs — the 25.29 MB probe failure at 16k tokens
# is the case this guards against).
_VMEM_BUDGET = 11 * 1024 * 1024


def _resident_vmem_bytes(skv_pad, d_pad, block_q, block_k, itemsize):
    """Estimate of the resident-KV fwd kernel's scoped-VMEM footprint."""
    kv = 2 * skv_pad * d_pad * itemsize  # whole K and V per (b, h)
    if skv_pad <= block_k:
        # single-block fast path: softmax runs on row-CHUNKS of the q
        # block (see _flash_kernel), so only ~2 chunk-sized score buffers
        # are live at once
        hq = block_q
        for c in (8, 4, 2):
            if block_q % c == 0 and (block_q // c) % 8 == 0:
                hq = block_q // c
                break
        scores = 2 * hq * skv_pad * 4
    else:
        scores = 2 * block_q * block_k * 4  # s and p, f32
    io = 2 * block_q * d_pad * itemsize + block_q * d_pad * 4  # q, o, acc
    return kv + scores + io


def _needs_stream(skv_pad, d_pad, block_q, block_k, itemsize):
    return (
        _resident_vmem_bytes(skv_pad, d_pad, block_q, block_k, itemsize)
        > _VMEM_BUDGET
    )


# test hook: True forces the streaming kernels at any shape, False forces
# the resident-KV layout, None (production) auto-selects by VMEM estimate
_FORCE_STREAM: Optional[bool] = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(
    kv_len_ref,  # (B,) i32 scalar-prefetch: valid kv length per batch row
    q_off_ref,  # (B,) i32 scalar-prefetch: per-row causal query offset
    q_ref,  # (1, 1, BQ, D)
    k_ref,  # (1, 1, Skv, D)
    v_ref,  # (1, 1, Skv, D)
    o_ref,  # (1, 1, BQ, D)
    lse_ref,  # (1, 1, BQ, 8) or None: per-row logsumexp (8 lane copies;
    # Mosaic wants the last two block dims (8,128)-aligned or array-equal)
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
    q_off = q_off_ref[b]

    # Inputs stay in their storage dtype (bf16 on the production path): the
    # MXU multiplies bf16 natively with f32 accumulation via
    # preferred_element_type — upcasting first would halve MXU throughput.
    q = q_ref[0, 0]
    num_k_blocks = skv // block_k

    row_ids = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )

    if num_k_blocks == 1:
        # Single-block fast path (the 2049-token ViT case): direct softmax,
        # no online-softmax carries. The query block is processed in
        # row-CHUNKS, software-pipelined so chunk j+1's score matmul (MXU,
        # async) is issued before chunk j's softmax (VPU) and p@v — the VPU
        # work hides under the MXU instead of serializing after it.
        # Measured at B8xH12x2049x64 with fixed-overhead-cancelling
        # two-point timing: matmuls alone 1.55 ms (84 TF/s, ~86% of the
        # D=64 shape cap: K=64 contraction and N=64 output each halve MXU
        # utilization), monolithic softmax +0.33 ms, chunked pipeline
        # recovers ~0.26 ms of that (1.88 -> 1.62 ms). Other variants
        # measured and rejected: online-softmax K streaming (slower),
        # bf16 exp (no gain), flat (B*H) grid (no gain).
        k_blk = k_ref[0, 0]
        v_blk = v_ref[0, 0]
        q_scaled = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)

        # largest row-chunk count that keeps chunks sublane-aligned
        n_chunks = 1
        for c in (8, 4, 2):
            if block_q % c == 0 and (block_q // c) % 8 == 0:
                n_chunks = c
                break
        hq = block_q // n_chunks

        col_row = jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        pad_mask = col_row < kv_len  # (1, SKV) broadcast row

        def mm1(j):
            return jax.lax.dot_general(
                q_scaled[j * hq:(j + 1) * hq, :], k_blk,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        s_cur = mm1(0)
        for j in range(n_chunks):
            s_next = mm1(j + 1) if j + 1 < n_chunks else None
            if causal:
                rows = (
                    qi * block_q + j * hq
                    + jax.lax.broadcasted_iota(jnp.int32, (hq, block_k), 0)
                )
                cols = jax.lax.broadcasted_iota(
                    jnp.int32, (hq, block_k), 1
                )
                mask = jnp.logical_and(
                    cols < kv_len, cols <= rows + q_off
                )
            else:
                mask = pad_mask
            m = jnp.max(s_cur, axis=1, keepdims=True)
            p = jnp.where(mask, jnp.exp(s_cur - m), 0.0)
            l = jnp.sum(p, axis=1, keepdims=True)
            empty = l == 0.0
            l = jnp.where(empty, 1.0, l)
            acc = jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, 0, pl.ds(j * hq, hq), :] = (acc / l).astype(o_ref.dtype)
            if lse_ref is not None:
                lse = jnp.where(empty, -NEG_INF, m + jnp.log(l))
                lse_ref[0, 0, pl.ds(j * hq, hq), :] = jnp.broadcast_to(
                    lse, (hq, 8)
                )
            s_cur = s_next
        return

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
    acc, m, l = jax.lax.fori_loop(0, num_k_blocks, body, (acc0, m0, l0))
    # fully-masked rows (query padding) produce l == 0; avoid 0/0
    empty = l == 0.0
    l = jnp.where(empty, 1.0, l)
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)
    if lse_ref is not None:
        # +BIG for empty rows so exp(s - lse) == 0 in the backward kernels
        lse = jnp.where(empty, -NEG_INF, m + jnp.log(l))  # (BQ, 1)
        lse_ref[0, 0] = jnp.broadcast_to(lse, (block_q, 8))


def _flash_kernel_stream(
    kv_len_ref, q_off_ref,
    q_ref,  # (1, 1, BQ, D)
    k_ref,  # (1, 1, BK, D) — streamed per kv grid step
    v_ref,  # (1, 1, BK, D)
    o_ref,  # (1, 1, BQ, D) — revisited across kv steps, written at the last
    lse_ref,  # (1, 1, BQ, 8) or None
    acc_ref,  # VMEM scratch (BQ, D) f32 — carries across kv grid steps
    m_ref,  # VMEM scratch (BQ, 128) f32
    l_ref,  # VMEM scratch (BQ, 128) f32
    *,
    n_kv: int,
    sm_scale: float,
    causal: bool,
):
    """Long-sequence forward: grid (B, H, n_q, n_kv), kv innermost.

    The online-softmax carries (acc, m, l) persist in VMEM scratch across
    the kv grid steps of one q block; K/V blocks stream from HBM instead
    of residing whole in VMEM, so the footprint is independent of Skv."""
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ji = pl.program_id(3)
    block_q, d = q_ref.shape[2], q_ref.shape[3]
    block_k = k_ref.shape[2]
    kv_len = kv_len_ref[b]
    q_off = q_off_ref[b]

    @pl.when(ji == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    # skip fully-masked blocks: past kv_len, or (causal) strictly above the
    # diagonal for every row of this q block. The DMA for a skipped block
    # still happens (index maps are grid-static); the VPU/MXU work doesn't.
    run = ji * block_k < kv_len
    if causal:
        run = jnp.logical_and(
            run, ji * block_k <= (qi + 1) * block_q - 1 + q_off
        )

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]
        k_blk = k_ref[0, 0]
        v_blk = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        col_ids = ji * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = col_ids < kv_len
        if causal:
            row_ids = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            mask = jnp.logical_and(mask, col_ids <= row_ids + q_off)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[...][:, :1]
        l_prev = l_ref[...][:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_prev * corr + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * corr + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ji == n_kv - 1)
    def _write():
        l = l_ref[...][:, :1]
        empty = l == 0.0
        l_safe = jnp.where(empty, 1.0, l)
        o_ref[0, 0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        if lse_ref is not None:
            m = m_ref[...][:, :1]
            lse = jnp.where(empty, -NEG_INF, m + jnp.log(l_safe))
            lse_ref[0, 0] = jnp.broadcast_to(lse, (block_q, 8))


def _flash_forward_stream(
    q, k, v, kv_lens, q_off, *, causal, sm_scale, block_q, block_k,
    interpret, with_lse=False,
):
    """Forward via the streaming kernel (footprint independent of Skv)."""
    batch, heads, sq, d = q.shape
    skv = k.shape[2]
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_k)
    d_pad = d if d in (64, 128) or d % 128 == 0 else _round_up(d, 128)

    if sq_pad != sq or d_pad != d:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    if skv_pad != skv or d_pad != d:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_pad - skv), (0, d_pad - d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_pad - skv), (0, d_pad - d)))
    kv_lens = jnp.minimum(kv_lens.astype(jnp.int32), skv)

    n_kv = skv_pad // block_k
    grid = (batch, heads, sq_pad // block_q, n_kv)
    qspec = pl.BlockSpec(
        (1, 1, block_q, d_pad), lambda b, h, i, j, *_: (b, h, i, 0)
    )
    kvspec = pl.BlockSpec(
        (1, 1, block_k, d_pad), lambda b, h, i, j, *_: (b, h, j, 0)
    )
    scratch = [
        pltpu.VMEM((block_q, d_pad), jnp.float32),
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, 128), jnp.float32),
    ]
    if with_lse:
        # two outputs -> pallas passes (o_ref, lse_ref) positionally
        kernel = functools.partial(
            _flash_kernel_stream, n_kv=n_kv, sm_scale=sm_scale, causal=causal
        )
        out_shape = [
            jax.ShapeDtypeStruct((batch, heads, sq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((batch, heads, sq_pad, 8), jnp.float32),
        ]
        out_specs = [
            qspec,
            pl.BlockSpec((1, 1, block_q, 8), lambda b, h, i, j, *_: (b, h, i, 0)),
        ]
    else:
        # one output -> pallas passes (o_ref, *scratch) positionally; a
        # wrapper injects lse_ref=None at the right slot
        def kernel(kv_len_ref, q_off_ref, q_r, k_r, v_r, o_r, acc, m, l):
            _flash_kernel_stream(
                kv_len_ref, q_off_ref, q_r, k_r, v_r, o_r, None, acc, m, l,
                n_kv=n_kv, sm_scale=sm_scale, causal=causal,
            )

        out_shape = jax.ShapeDtypeStruct(
            (batch, heads, sq_pad, d_pad), q.dtype
        )
        out_specs = qspec
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[qspec, kvspec, kvspec],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    result = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * heads * sq_pad * skv_pad * d_pad,
            bytes_accessed=(
                q.size * q.dtype.itemsize
                + (sq_pad // block_q)
                * (k.size + v.size) * k.dtype.itemsize
                + batch * heads * sq_pad * d_pad * q.dtype.itemsize
            ),
            transcendentals=batch * heads * sq_pad * skv_pad,
        ),
    )(kv_lens, q_off, q, k, v)
    if with_lse:
        out, lse = result
        if sq_pad != sq or d_pad != d:
            out = out[:, :, :sq, :d]
        return out, lse
    out = result
    if sq_pad != sq or d_pad != d:
        out = out[:, :, :sq, :d]
    return out


def _flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_lens: jax.Array,
    q_off: jax.Array,  # (B,) i32 per-row causal query offsets
    *,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_k: int,
    interpret: bool,
    with_lse: bool = False,
):
    batch, heads, sq, d = q.shape
    skv = k.shape[2]
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_k)
    # Lane-dim handling: a block whose last dim equals the array's last dim
    # is Mosaic-compliant at any width, so 64-wide heads stay unpadded
    # (measured ~5% faster + half the HBM traffic); odd widths pad to 128.
    d_pad = d if d in (64, 128) or d % 128 == 0 else _round_up(d, 128)

    stream = _FORCE_STREAM
    if stream is None:
        stream = _needs_stream(
            skv_pad, d_pad, block_q, block_k, q.dtype.itemsize
        )
    if stream:
        return _flash_forward_stream(
            q, k, v, kv_lens, q_off, causal=causal, sm_scale=sm_scale,
            block_q=min(block_q, STREAM_BLOCK_Q),
            block_k=min(block_k, STREAM_BLOCK_K),
            interpret=interpret, with_lse=with_lse,
        )

    if sq_pad != sq or d_pad != d:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    if skv_pad != skv or d_pad != d:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_pad - skv), (0, d_pad - d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_pad - skv), (0, d_pad - d)))

    kv_lens = jnp.minimum(kv_lens.astype(jnp.int32), skv)

    grid = (batch, heads, sq_pad // block_q)
    if with_lse:
        kernel = functools.partial(
            _flash_kernel, block_k=block_k, sm_scale=sm_scale, causal=causal
        )
        out_shape = [
            jax.ShapeDtypeStruct((batch, heads, sq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((batch, heads, sq_pad, 8), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec(
                (1, 1, block_q, d_pad), lambda b, h, i, *_: (b, h, i, 0)
            ),
            pl.BlockSpec((1, 1, block_q, 8), lambda b, h, i, *_: (b, h, i, 0)),
        ]
    else:
        kernel = functools.partial(
            _flash_kernel, lse_ref=None, block_k=block_k, sm_scale=sm_scale,
            causal=causal,
        )
        out_shape = jax.ShapeDtypeStruct((batch, heads, sq_pad, d_pad), q.dtype)
        out_specs = pl.BlockSpec(
            (1, 1, block_q, d_pad), lambda b, h, i, *_: (b, h, i, 0)
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
        out_specs=out_specs,
    )

    result = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
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
    if with_lse:
        out, lse = result
        if sq_pad != sq or d_pad != d:
            out = out[:, :, :sq, :d]
        return out, lse  # lse stays padded (sq_pad) for the bwd kernels
    out = result
    if sq_pad != sq or d_pad != d:
        out = out[:, :, :sq, :d]
    return out


def _bwd_dq_kernel(
    kv_len_ref, q_off_ref,
    q_ref,  # (1, 1, BQ, D)
    k_ref,  # (1, 1, Skv, D)
    v_ref,  # (1, 1, Skv, D)
    do_ref,  # (1, 1, BQ, D)
    lse_ref,  # (1, 1, BQ, 8) column layout
    delta_ref,  # (1, 1, BQ, 8)
    dq_ref,  # (1, 1, BQ, D)
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
    q_off = q_off_ref[b]

    q = q_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, 0:1]  # (BQ, 1) f32
    delta = delta_ref[0, 0][:, 0:1]
    row_ids = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )

    def body(j, acc):
        k_blk = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        v_blk = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        col_ids = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = col_ids < kv_len
        if causal:
            mask = jnp.logical_and(mask, col_ids <= row_ids + q_off)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * sm_scale
        return acc + jax.lax.dot_general(
            ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(
        0, skv // block_k, body, jnp.zeros((block_q, d), jnp.float32)
    )
    dq_ref[0, 0] = acc.astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    kv_len_ref, q_off_ref,
    q_ref,  # (1, 1, Sq, D) full
    k_ref,  # (1, 1, BK, D) block
    v_ref,  # (1, 1, BK, D) block
    do_ref,  # (1, 1, Sq, D) full
    lse_ref,  # (1, 1, 8, Sq) full, row layout
    delta_ref,  # (1, 1, 8, Sq) full
    dk_ref,  # (1, 1, BK, D)
    dv_ref,  # (1, 1, BK, D)
    *,
    block_q: int,
    sm_scale: float,
    causal: bool,
):
    b = pl.program_id(0)
    ki = pl.program_id(2)
    sq = q_ref.shape[2]
    block_k, d = k_ref.shape[2], k_ref.shape[3]
    kv_len = kv_len_ref[b]
    q_off = q_off_ref[b]

    k_blk = k_ref[0, 0]
    v_blk = v_ref[0, 0]
    col_ids = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_k, block_q), 0
    )

    def body(i, carry):
        dk_acc, dv_acc = carry
        q_blk = q_ref[0, 0, pl.ds(i * block_q, block_q), :]
        do_blk = do_ref[0, 0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, 0, 0:1, pl.ds(i * block_q, block_q)]  # (1, BQ)
        delta = delta_ref[0, 0, 0:1, pl.ds(i * block_q, block_q)]
        # transposed scores: rows = k positions, cols = q positions
        st = jax.lax.dot_general(
            k_blk, q_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        row_ids = i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, block_q), 1
        )
        mask = col_ids < kv_len
        if causal:
            mask = jnp.logical_and(mask, col_ids <= row_ids + q_off)
        pt = jnp.where(mask, jnp.exp(st - lse), 0.0)
        dv_acc = dv_acc + jax.lax.dot_general(
            pt.astype(do_blk.dtype), do_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dpt = jax.lax.dot_general(
            v_blk, do_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dst = pt * (dpt - delta) * sm_scale
        dk_acc = dk_acc + jax.lax.dot_general(
            dst.astype(q_blk.dtype), q_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk_acc, dv_acc

    zeros = jnp.zeros((block_k, d), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, sq // block_q, body, (zeros, zeros))
    dk_ref[0, 0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv_acc.astype(dv_ref.dtype)


def _bwd_dq_kernel_stream(
    kv_len_ref, q_off_ref,
    q_ref,  # (1, 1, BQ, D)
    k_ref,  # (1, 1, BK, D) — streamed per kv grid step
    v_ref,  # (1, 1, BK, D)
    do_ref,  # (1, 1, BQ, D)
    lse_ref,  # (1, 1, BQ, 8) column layout
    delta_ref,  # (1, 1, BQ, 8)
    dq_ref,  # (1, 1, BQ, D) — written at the last kv step
    acc_ref,  # VMEM scratch (BQ, D) f32
    *,
    n_kv: int,
    sm_scale: float,
    causal: bool,
):
    """Long-sequence dQ: grid (B, H, n_q, n_kv), kv innermost, K/V streamed
    from HBM with the dQ accumulator carried in VMEM scratch."""
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ji = pl.program_id(3)
    block_q, d = q_ref.shape[2], q_ref.shape[3]
    block_k = k_ref.shape[2]
    kv_len = kv_len_ref[b]
    q_off = q_off_ref[b]

    @pl.when(ji == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    run = ji * block_k < kv_len
    if causal:
        run = jnp.logical_and(
            run, ji * block_k <= (qi + 1) * block_q - 1 + q_off
        )

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, 0:1]  # (BQ, 1) f32
        delta = delta_ref[0, 0][:, 0:1]
        k_blk = k_ref[0, 0]
        v_blk = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        col_ids = ji * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = col_ids < kv_len
        if causal:
            row_ids = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            mask = jnp.logical_and(mask, col_ids <= row_ids + q_off)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * sm_scale
        acc_ref[...] = acc_ref[...] + jax.lax.dot_general(
            ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ji == n_kv - 1)
    def _write():
        dq_ref[0, 0] = acc_ref[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel_stream(
    kv_len_ref, q_off_ref,
    q_ref,  # (1, 1, BQ, D) — streamed per q grid step
    k_ref,  # (1, 1, BK, D)
    v_ref,  # (1, 1, BK, D)
    do_ref,  # (1, 1, BQ, D) — streamed
    lse_ref,  # (1, 1, 8, BQ) row layout — streamed
    delta_ref,  # (1, 1, 8, BQ) — streamed
    dk_ref,  # (1, 1, BK, D) — written at the last q step
    dv_ref,  # (1, 1, BK, D)
    dk_acc_ref,  # VMEM scratch (BK, D) f32
    dv_acc_ref,  # VMEM scratch (BK, D) f32
    *,
    n_q: int,
    sm_scale: float,
    causal: bool,
):
    """Long-sequence dK/dV: grid (B, H, n_kv, n_q), q innermost, Q/dO/lse/
    delta streamed from HBM with dK/dV accumulators in VMEM scratch."""
    b = pl.program_id(0)
    ki = pl.program_id(2)
    qi = pl.program_id(3)
    block_k, d = k_ref.shape[2], k_ref.shape[3]
    block_q = q_ref.shape[2]
    kv_len = kv_len_ref[b]
    q_off = q_off_ref[b]

    @pl.when(qi == 0)
    def _init():
        dk_acc_ref[...] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[...] = jnp.zeros_like(dv_acc_ref)

    # causal skip: this kv block sees no queries when even the LAST row of
    # the q block sits above the diagonal for the block's first column
    run = ki * block_k < kv_len
    if causal:
        run = jnp.logical_and(
            run, ki * block_k <= (qi + 1) * block_q - 1 + q_off
        )

    @pl.when(run)
    def _compute():
        k_blk = k_ref[0, 0]
        v_blk = v_ref[0, 0]
        q_blk = q_ref[0, 0]
        do_blk = do_ref[0, 0]
        lse = lse_ref[0, 0, 0:1, :]  # (1, BQ)
        delta = delta_ref[0, 0, 0:1, :]
        st = jax.lax.dot_general(
            k_blk, q_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        col_ids = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, block_q), 0
        )
        mask = col_ids < kv_len
        if causal:
            row_ids = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_k, block_q), 1
            )
            mask = jnp.logical_and(mask, col_ids <= row_ids + q_off)
        pt = jnp.where(mask, jnp.exp(st - lse), 0.0)
        dv_acc_ref[...] = dv_acc_ref[...] + jax.lax.dot_general(
            pt.astype(do_blk.dtype), do_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dpt = jax.lax.dot_general(
            v_blk, do_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dst = pt * (dpt - delta) * sm_scale
        dk_acc_ref[...] = dk_acc_ref[...] + jax.lax.dot_general(
            dst.astype(q_blk.dtype), q_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qi == n_q - 1)
    def _write():
        dk_ref[0, 0] = dk_acc_ref[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc_ref[...].astype(dv_ref.dtype)


def _flash_backward(
    q, k, v, o, lse, do, kv_lens, q_off,
    *, causal, sm_scale, block_q, block_k, interpret,
):
    # the bwd kernels keep the whole (BQ, SKV) score block live with no
    # chunking, so a fwd-sized q block (2176+) would blow VMEM; cap at 512
    # (lse is re-padded below when the fwd used a different sq_pad)
    block_q = min(block_q, 512)
    batch, heads, sq, d = q.shape
    skv = k.shape[2]
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_k)
    d_pad = d if d in (64, 128) or d % 128 == 0 else _round_up(d, 128)

    # long sequences: stream the resident side (K/V for dQ, Q/dO for dK/dV)
    # through a fourth grid axis instead of holding it whole in VMEM
    if _FORCE_STREAM is None:
        stream_dq = _needs_stream(
            skv_pad, d_pad, block_q, block_k, q.dtype.itemsize
        )
        stream_dkv = _needs_stream(
            sq_pad, d_pad, block_q, block_k, q.dtype.itemsize
        )
    else:
        stream_dq = stream_dkv = _FORCE_STREAM
    if stream_dq or stream_dkv:
        block_k = min(block_k, STREAM_BLOCK_K)
        skv_pad = _round_up(skv, block_k)

    def pad_q(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)))

    def pad_k(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, skv_pad - skv), (0, d_pad - d)))

    # lse arrives from the forward padded at the FWD's sq_pad, which can
    # differ from ours (fwd and bwd use different q-block sizes): re-pad to
    # this kernel's grid, +BIG on padding rows so exp(s - lse) == 0 there
    if lse.shape[2] != sq_pad:
        lse = lse[:, :, :sq_pad, :]
        if lse.shape[2] < sq_pad:
            lse = jnp.pad(
                lse,
                ((0, 0), (0, 0), (0, sq_pad - lse.shape[2]), (0, 0)),
                constant_values=-NEG_INF,
            )

    # delta = rowsum(do * o): tiny elementwise pass stays in XLA; lse arrives
    # from the forward in column layout (B, H, sq_pad, 8)
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_pad - sq)))
    delta_cols = jnp.broadcast_to(
        delta[..., None], (batch, heads, sq_pad, 8)
    )
    delta_rows = jnp.transpose(delta_cols, (0, 1, 3, 2))
    lse_rows = jnp.transpose(lse, (0, 1, 3, 2))
    q_p, do_p = pad_q(q), pad_q(do)
    k_p, v_p = pad_k(k), pad_k(v)
    kv_lens = jnp.minimum(kv_lens.astype(jnp.int32), skv)

    qspec = pl.BlockSpec((1, 1, block_q, d_pad), lambda b, h, i, *_: (b, h, i, 0))
    qfull = pl.BlockSpec((1, 1, sq_pad, d_pad), lambda b, h, i, *_: (b, h, 0, 0))
    kfull = pl.BlockSpec((1, 1, skv_pad, d_pad), lambda b, h, i, *_: (b, h, 0, 0))
    kspec = pl.BlockSpec((1, 1, block_k, d_pad), lambda b, h, j, *_: (b, h, j, 0))
    colq = pl.BlockSpec((1, 1, block_q, 8), lambda b, h, i, *_: (b, h, i, 0))
    rowfull = pl.BlockSpec((1, 1, 8, sq_pad), lambda b, h, i, *_: (b, h, 0, 0))

    n_q, n_kv = sq_pad // block_q, skv_pad // block_k
    if stream_dq:
        kvstream = pl.BlockSpec(
            (1, 1, block_k, d_pad), lambda b, h, i, j, *_: (b, h, j, 0)
        )
        dq = pl.pallas_call(
            functools.partial(
                _bwd_dq_kernel_stream, n_kv=n_kv, sm_scale=sm_scale,
                causal=causal,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(batch, heads, n_q, n_kv),
                in_specs=[qspec, kvstream, kvstream, qspec, colq, colq],
                out_specs=qspec,
                scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct(
                (batch, heads, sq_pad, d_pad), q.dtype
            ),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "parallel", "parallel", "parallel", "arbitrary",
                ),
            ),
        )(kv_lens, q_off, q_p, k_p, v_p, do_p, lse, delta_cols)
    else:
        dq = pl.pallas_call(
            functools.partial(
                _bwd_dq_kernel, block_k=block_k, sm_scale=sm_scale,
                causal=causal,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(batch, heads, sq_pad // block_q),
                in_specs=[qspec, kfull, kfull, qspec, colq, colq],
                out_specs=qspec,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (batch, heads, sq_pad, d_pad), q.dtype
            ),
            interpret=interpret,
        )(kv_lens, q_off, q_p, k_p, v_p, do_p, lse, delta_cols)

    if stream_dkv:
        qstream = pl.BlockSpec(
            (1, 1, block_q, d_pad), lambda b, h, j, i, *_: (b, h, i, 0)
        )
        rowq = pl.BlockSpec(
            (1, 1, 8, block_q), lambda b, h, j, i, *_: (b, h, 0, i)
        )
        dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_dkv_kernel_stream, n_q=n_q, sm_scale=sm_scale,
                causal=causal,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(batch, heads, n_kv, n_q),
                in_specs=[qstream, kspec, kspec, qstream, rowq, rowq],
                out_specs=[kspec, kspec],
                scratch_shapes=[
                    pltpu.VMEM((block_k, d_pad), jnp.float32),
                    pltpu.VMEM((block_k, d_pad), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((batch, heads, skv_pad, d_pad), k.dtype),
                jax.ShapeDtypeStruct((batch, heads, skv_pad, d_pad), v.dtype),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "parallel", "parallel", "parallel", "arbitrary",
                ),
            ),
        )(kv_lens, q_off, q_p, k_p, v_p, do_p, lse_rows, delta_rows)
    else:
        dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_dkv_kernel, block_q=block_q, sm_scale=sm_scale,
                causal=causal,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(batch, heads, skv_pad // block_k),
                in_specs=[qfull, kspec, kspec, qfull, rowfull, rowfull],
                out_specs=[kspec, kspec],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((batch, heads, skv_pad, d_pad), k.dtype),
                jax.ShapeDtypeStruct((batch, heads, skv_pad, d_pad), v.dtype),
            ],
            interpret=interpret,
        )(kv_lens, q_off, q_p, k_p, v_p, do_p, lse_rows, delta_rows)

    dq = dq[:, :, :sq, :d]
    dk = dk[:, :, :skv, :d]
    dv = dv[:, :, :skv, :d]
    return dq, dk, dv


def _xla_attention(q, k, v, kv_lens, q_off, *, causal, sm_scale):
    """Reference attention used for the recompute backward (and CPU path).

    `q_off` is a (B,) per-row causal query offset (0 for plain causal)."""
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
        mask = jnp.logical_and(
            mask, col <= row + q_off[:, None, None, None]
        )
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10)
)
def _flash_attention_core(
    q, k, v, kv_lens, q_off, causal, sm_scale, block_q, block_k, interpret,
    use_pallas_bwd,
):
    return _flash_forward(
        q,
        k,
        v,
        kv_lens,
        q_off,
        causal=causal,
        sm_scale=sm_scale,
        block_q=block_q,
        block_k=block_k,
        interpret=interpret,
    )


def _core_fwd(
    q, k, v, kv_lens, q_off, causal, sm_scale, block_q, block_k, interpret,
    use_pallas_bwd,
):
    if use_pallas_bwd:
        out, lse = _flash_forward(
            q, k, v, kv_lens, q_off, causal=causal,
            sm_scale=sm_scale, block_q=block_q, block_k=block_k,
            interpret=interpret, with_lse=True,
        )
        return out, (q, k, v, kv_lens, q_off, out, lse)
    out = _flash_attention_core(
        q, k, v, kv_lens, q_off, causal, sm_scale, block_q, block_k,
        interpret, use_pallas_bwd,
    )
    return out, (q, k, v, kv_lens, q_off, None, None)


def _core_bwd(
    causal, sm_scale, block_q, block_k, interpret, use_pallas_bwd,
    res, g,
):
    q, k, v, kv_lens, q_off, o, lse = res
    if use_pallas_bwd:
        dq, dk, dv = _flash_backward(
            q, k, v, o, lse, g, kv_lens, q_off,
            causal=causal, sm_scale=sm_scale,
            block_q=block_q, block_k=block_k, interpret=interpret,
        )
        return dq, dk, dv, None, None

    # Recompute-based fallback: grads of the mathematically-identical XLA
    # attention. O(S^2) HBM only inside backward, like jax.remat.
    def f(q, k, v):
        return _xla_attention(
            q, k, v, kv_lens, q_off, causal=causal, sm_scale=sm_scale
        )

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_lens: Optional[jax.Array] = None,
    causal: bool = False,
    q_offset=0,
    sm_scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
    use_pallas_bwd: bool = True,
) -> jax.Array:
    """Flash attention over (batch, heads, seq, head_dim) arrays.

    Args:
      q: (B, H, Sq, D) queries.
      k, v: (B, Hkv, Skv, D); Hkv must equal H (expand GQA beforehand or use
        `hsenet_tpu.ops.attention.multi_head_attention`).
      kv_lens: optional (B,) valid KV lengths (padding mask). Defaults to Skv.
      causal: lower-triangular masking, offset by `q_offset` (for prefill
        where queries start at position q_offset in the KV sequence).
      q_offset: int or (B,) int array — per-row causal query offset, e.g.
        the per-row cache lengths for chunked prefill into a non-empty cache.
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
    q_off = jnp.broadcast_to(
        jnp.asarray(q_offset, jnp.int32), (batch,)
    )
    block_q = min(block_q, _round_up(q.shape[2], 128))
    block_k = min(block_k, _round_up(skv, 128))
    return _flash_attention_core(
        q, k, v, kv_lens, q_off, causal, sm_scale, block_q, block_k,
        interpret, use_pallas_bwd,
    )
