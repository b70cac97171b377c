"""Pallas int8 weight-only matvec (standalone-matmul serving primitive).

Decode is HBM-bandwidth-bound: each token reads every live weight once
(SURVEY.md §3.4 — the reference's per-token Phi-4 forward under HF generate,
there backed by bitsandbytes int8 CUDA kernels). This kernel streams the
int8 weight in (K, block_n) tiles through VMEM with the convert fused into
the MXU feed.

Measured placement guidance (BENCH.md, v5e two-point timing):
  * STANDALONE (1, K) @ int8 (K, N): kernel 640-712 GB/s vs XLA 349-366
    GB/s — 1.9x. Use it for isolated dequant matvecs outside scans.
  * INSIDE `lax.scan` over stacked (L, K, N) weights (the decode stack):
    XLA fuses the scan slice into its dots and pipelines prefetches across
    iterations at ~698 GB/s — equal to the kernel's ceiling — while an
    opaque pallas_call forces the 100 MB/layer slice to MATERIALIZE,
    regressing decode 161 -> 116 tok/s. The scanned decoder therefore
    keeps the plain XLA expression (models/lora.py).

Only the tiny-M regime is eligible (M = batch*seq rows): prefill/training
matmuls are MXU-bound and XLA tiles them well, so `quant_matvec_int8`
dispatches to the kernel only when M <= MAX_KERNEL_ROWS and shapes divide
cleanly; otherwise it falls back to the XLA expression. The fallback is
also the gradient path — the kernel itself is forward-only.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Largest per-block int8 tile in bytes (double-buffered by the pipeline;
# 2 x 4 MB leaves headroom in 16 MB VMEM next to the activation row).
_MAX_BLOCK_BYTES = 4 * 1024 * 1024
# Rows above this are compute-shaped work — let XLA tile them.
MAX_KERNEL_ROWS = 8


def _kernel(x_ref, w_ref, s_ref, o_ref):
    acc = jnp.dot(
        x_ref[...],
        w_ref[...].astype(x_ref.dtype),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (acc * s_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _matvec_int8_pallas(x, wq, scale, block_n: int, interpret: bool):
    k, n = wq.shape
    m = x.shape[0]
    return pl.pallas_call(
        _kernel,
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0)),
            pl.BlockSpec((k, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
    )(x, wq, scale.reshape(1, n))


def _pick_block_n(k: int, n: int) -> Optional[int]:
    for bn in (512, 256, 128):
        if n % bn == 0 and k * bn <= _MAX_BLOCK_BYTES:
            return bn
    return None


def quant_matvec_int8(
    x: jax.Array,  # (..., K) activations
    wq: jax.Array,  # (K, N) int8
    scale: jax.Array,  # (N,) per-output-channel scales
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """(..., K) @ int8 (K, N) * scale -> (..., N), Pallas-backed when the
    row count is decode-small, XLA otherwise. Shapes are static, so the
    dispatch is a trace-time decision — under `lax.scan` decode every step
    takes the kernel; prefill/training take XLA."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    m = 1
    for s in lead:
        m *= s
    bn = _pick_block_n(k, wq.shape[1])
    if m <= MAX_KERNEL_ROWS and bn is not None:
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        y = _matvec_int8_pallas(
            x.reshape(m, k), wq, scale.astype(jnp.float32), bn, interpret
        )
        return y.reshape(*lead, wq.shape[1])
    return jnp.dot(x, wq.astype(x.dtype)) * scale.astype(x.dtype)
