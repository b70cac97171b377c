"""Hierarchical 3D Swin Transformer encoder (flax, TPU-first).

Behavioral contract from the reference's vendored SAM encoder variant
`segment_anything_volumetric/modeling/image_encoder_swin.py` (Swin v1 per
Liu et al.):
  * windowed MHSA with a learned relative-position-bias table indexed by a
    static relative-coordinate map (`WindowAttention`, :106-213),
  * blocks alternate no-shift / half-window shift; shifted blocks add the
    region mask built from the 3x3x3 slice partition with -100.0 on
    cross-region pairs (`compute_mask`, :442-478),
  * pre-LN blocks, GELU MLP at mlp_ratio 4 (`SwinTransformerBlock`, :215-379),
  * PatchMerging concatenates the 8 voxel-neighbours and reduces 8C -> 2C
    with a bias-free Linear after LN (:381-440).

Deviations (documented): the reference appends PatchMerging after EVERY
stage — including the last — which contradicts its own
`num_features = embed_dim * 2**(n_stages-1)` (:673, dead code there, never
registered in `sam_model_registry`, build_sam.py:46-48). Here the merge runs
*between* stages (classic Swin), so the final grid/channels match
`SwinConfig.grid`/`out_dim`. Stochastic depth (drop_path, default 0.0 in the
reference) is omitted.

TPU design: window partition/reverse are static reshape+transpose (einops)
feeding one batched (B*nW, n, n) attention per block; the relative-position
index and shift masks are numpy constants baked at trace time; shifts are
`jnp.roll`; every shape is static so XLA tiles the QKV/MLP matmuls onto the
MXU without dynamic padding.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange
from flax import linen as nn

from hsenet_tpu.configs import SwinConfig
from hsenet_tpu.models.layers import MlpBlock

Dtype = Any


def _effective_window(dims, window, shift):
    """Reference `get_window_size` (:80-103): clamp the window to each axis
    and zero the shift on axes the window already covers."""
    w, s = list(window), list(shift)
    for i in range(3):
        if dims[i] <= window[i]:
            w[i] = dims[i]
            s[i] = 0
    return tuple(w), tuple(s)


def window_partition(x: jax.Array, window: Sequence[int]) -> jax.Array:
    """(B, D, H, W, C) -> (B*nW, wd*wh*ww, C); static reshape/transpose."""
    return rearrange(
        x,
        "b (nd wd) (nh wh) (nw ww) c -> (b nd nh nw) (wd wh ww) c",
        wd=window[0], wh=window[1], ww=window[2],
    )


def window_reverse(
    windows: jax.Array, window: Sequence[int], dims: Sequence[int]
) -> jax.Array:
    """Inverse of `window_partition` for spatial dims (D, H, W)."""
    d, h, w = dims
    return rearrange(
        windows,
        "(b nd nh nw) (wd wh ww) c -> b (nd wd) (nh wh) (nw ww) c",
        nd=d // window[0], nh=h // window[1], nw=w // window[2],
        wd=window[0], wh=window[1], ww=window[2],
    )


def relative_position_index(
    window: Sequence[int], table_window: Optional[Sequence[int]] = None
) -> np.ndarray:
    """Static (n, n) index into the bias table (reference :141-161).

    `table_window` is the CONFIGURED window the bias table was allocated
    for; `window` may be the runtime-clamped effective window (small
    volumes). Offsets/strides come from `table_window` so the same
    fixed-size table serves every clamping — matching the reference's
    fixed table + index-slice scheme, which keeps checkpoints restorable
    across volume sizes (clamped offsets stay in range)."""
    tw = tuple(table_window) if table_window is not None else tuple(window)
    coords = np.stack(
        np.meshgrid(*[np.arange(w) for w in window], indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (3, n, n)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += tw[0] - 1
    rel[:, :, 1] += tw[1] - 1
    rel[:, :, 2] += tw[2] - 1
    rel[:, :, 0] *= (2 * tw[1] - 1) * (2 * tw[2] - 1)
    rel[:, :, 1] *= 2 * tw[2] - 1
    return rel.sum(-1)


def shift_attention_mask(
    dims: Sequence[int], window: Sequence[int], shift: Sequence[int]
) -> np.ndarray:
    """Static (nW, n, n) additive mask for shifted windows (reference
    `compute_mask` :442-478): -100.0 between voxels from different
    pre-shift regions, 0 within a region."""
    d, h, w = dims
    region = np.zeros((1, d, h, w, 1), np.float32)
    cnt = 0
    for ds in (
        slice(-window[0]), slice(-window[0], -shift[0]),
        slice(-shift[0], None),
    ):
        for hs in (
            slice(-window[1]), slice(-window[1], -shift[1]),
            slice(-shift[1], None),
        ):
            for ws in (
                slice(-window[2]), slice(-window[2], -shift[2]),
                slice(-shift[2], None),
            ):
                region[:, ds, hs, ws, :] = cnt
                cnt += 1
    rw = region.reshape(
        1, d // window[0], window[0], h // window[1], window[1],
        w // window[2], window[2], 1,
    )
    rw = rw.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        -1, window[0] * window[1] * window[2]
    )
    diff = rw[:, None, :] - rw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention3D(nn.Module):
    """Windowed MHSA with relative position bias (reference :106-213)."""

    dim: int
    num_heads: int
    window: Tuple[int, int, int]
    qkv_bias: bool = True
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    # configured (unclamped) window the bias table is allocated for; the
    # effective `window` may be clamped to small volumes at runtime, but the
    # table keeps its configured shape so checkpoints restore at any size
    table_window: Optional[Tuple[int, int, int]] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: Optional[np.ndarray] = None,
        *, deterministic: bool = True,
    ) -> jax.Array:
        bw, n, c = x.shape
        head_dim = self.dim // self.num_heads
        tw = self.table_window or self.window
        table_size = (
            (2 * tw[0] - 1) * (2 * tw[1] - 1) * (2 * tw[2] - 1)
        )
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            (table_size, self.num_heads),
            jnp.float32,
        )
        qkv = nn.Dense(
            3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv"
        )(x)
        q, k, v = rearrange(
            qkv, "b n (three h d) -> three b h n d", three=3, h=self.num_heads
        )
        scores = jnp.einsum(
            "bhnd,bhmd->bhnm", q * (head_dim ** -0.5), k,
            preferred_element_type=jnp.float32,
        )
        idx = relative_position_index(self.window, tw)  # static numpy (n, n)
        scores = scores + bias_table[idx].transpose(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            scores = scores.reshape(
                bw // nw, nw, self.num_heads, n, n
            ) + jnp.asarray(mask)[None, :, None]
            scores = scores.reshape(bw, self.num_heads, n, n)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout_rate)(
            probs, deterministic=deterministic
        )
        out = jnp.einsum("bhnm,bhmd->bhnd", probs.astype(v.dtype), v)
        out = rearrange(out, "b h n d -> b n (h d)")
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)


class SwinBlock3D(nn.Module):
    """Pre-LN Swin block; shifted when `shift` is nonzero (reference
    :215-379). Padding to window multiples is static (`jnp.pad` + crop)."""

    dim: int
    num_heads: int
    window: Tuple[int, int, int]
    shifted: bool
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    gelu_approx: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True):
        b, d, h, w, c = x.shape
        base_shift = tuple(i // 2 for i in self.window) if self.shifted else (
            0, 0, 0,
        )
        window, shift = _effective_window((d, h, w), self.window, base_shift)
        pads = tuple(
            (0, (window[i] - (d, h, w)[i] % window[i]) % window[i])
            for i in range(3)
        )
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        y = jnp.pad(y, ((0, 0), *pads, (0, 0)))
        dims_p = tuple(y.shape[1:4])
        if any(shift):
            y = jnp.roll(y, tuple(-s for s in shift), axis=(1, 2, 3))
            mask = shift_attention_mask(dims_p, window, shift)
        else:
            mask = None
        y = window_partition(y, window)
        y = WindowAttention3D(
            self.dim, self.num_heads, window, qkv_bias=self.qkv_bias,
            dropout_rate=self.dropout_rate, dtype=self.dtype,
            table_window=self.window, name="attn",
        )(y, mask, deterministic=deterministic)
        y = window_reverse(y, window, dims_p)
        if any(shift):
            y = jnp.roll(y, shift, axis=(1, 2, 3))
        y = y[:, :d, :h, :w]
        x = x + y
        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        y = MlpBlock(
            int(self.dim * self.mlp_ratio), self.dim,
            dropout_rate=self.dropout_rate, dtype=self.dtype,
            gelu_approx=self.gelu_approx, name="mlp",
        )(y, deterministic=deterministic)
        return x + y


class PatchMerging3D(nn.Module):
    """Concat 2x2x2 neighbours, LN, bias-free 8C -> 2C (reference :381-440)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = rearrange(
            x, "b (d pd) (h ph) (w pw) c -> b d h w (pd ph pw c)",
            pd=2, ph=2, pw=2,
        )
        y = nn.LayerNorm(dtype=jnp.float32, name="norm")(y)
        return nn.Dense(
            2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction"
        )(y)


class SwinTransformer3D(nn.Module):
    """Patch embed -> stages of Swin blocks with PatchMerging between them.

    Input (B, C, D, H, W) channel-first volumes (matching the other
    encoders' call convention); output (B, D', H', W', out_dim) feature grid
    per `SwinConfig.grid`/`out_dim`.
    """

    config: SwinConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, volume: jax.Array, *, deterministic: bool = True):
        cfg = self.config
        p0, p1, p2 = cfg.patch_size
        x = rearrange(
            volume, "b c (d p0) (h p1) (w p2) -> b d h w (p0 p1 p2 c)",
            p0=p0, p1=p1, p2=p2,
        ).astype(self.dtype)
        x = nn.Dense(cfg.embed_dim, dtype=self.dtype, name="patch_embed")(x)
        if cfg.patch_norm:
            x = nn.LayerNorm(dtype=jnp.float32, name="patch_norm")(x)
        x = nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)

        dim = cfg.embed_dim
        for stage, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
            if stage > 0:
                x = PatchMerging3D(
                    dim, dtype=self.dtype, name=f"merge{stage}"
                )(x)
                dim *= 2
            for i in range(depth):
                x = SwinBlock3D(
                    dim, heads, cfg.window_size, shifted=(i % 2 == 1),
                    mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
                    dropout_rate=cfg.dropout_rate, dtype=self.dtype,
                    gelu_approx=cfg.gelu_approx,
                    name=f"stage{stage}_block{i}",
                )(x, deterministic=deterministic)
        return x
