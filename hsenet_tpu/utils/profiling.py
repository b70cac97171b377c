"""Profiling + timing harness (the reference has none — SURVEY.md §5).

Provides: jax.profiler trace context for TensorBoard-viewable device
profiles, a `block_until_ready` timing helper with warmup, and simple
FLOPs/MFU accounting for the encode path.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str = "/tmp/hsenet_trace"):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def time_fn(
    fn: Callable,
    *args,
    warmup: int = 2,
    iters: int = 5,
    **kwargs,
) -> Dict[str, float]:
    """Best/mean wall-clock of a jitted fn with device sync."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return {
        "best_s": min(times),
        "mean_s": sum(times) / len(times),
        "iters": iters,
    }


def transformer_flops(
    batch: int, seq: int, hidden: int, mlp: int, layers: int,
    extra_matmul_flops: float = 0.0,
) -> float:
    """Forward FLOPs of a standard pre-LN transformer stack (2*MACs)."""
    per_layer = (
        4 * seq * hidden * hidden * 2  # qkv + out projections
        + 2 * seq * seq * hidden * 2  # attention score + weighted sum
        + 2 * seq * hidden * mlp * 2  # mlp
    )
    return batch * (layers * per_layer + extra_matmul_flops)


def vit3d_encode_flops(batch: int, cfg) -> float:
    """Per-forward FLOPs of one ViT3D tower (patch embed + blocks)."""
    seq = cfg.seq_len
    patch_embed = cfg.num_patches * cfg.patch_dim * cfg.hidden_size * 2
    return transformer_flops(
        batch, seq, cfg.hidden_size, cfg.mlp_dim, cfg.num_layers,
        extra_matmul_flops=patch_embed,
    )


def mfu(flops: float, seconds: float, peak_flops: float = 197e12) -> float:
    """Model FLOPs utilisation vs peak (default: TPU v5e bf16 197 TFLOP/s)."""
    return flops / seconds / peak_flops
