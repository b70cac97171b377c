"""Fused on-device CT preprocessing.

The reference runs this offline as an 8-GPU script farm writing .npy files
(`Data/data_processing/CT-RATE/*.py`, SURVEY.md §2.1). Here it is ONE jitted
static-shape program per volume:

  reference chain (nii_to_3D:41-124):
    HU = slope*raw + inter -> clamp[-1000, 200] -> trilinear resample to
    (1.5, 0.75, 0.75) mm -> min-max normalize -> CropForeground(>0) ->
    Resize (32,256,256) bilinear
  fused here:
    HU window -> min-max normalize -> foreground bbox (>0) -> ONE
    `jax.image.scale_and_translate` from the bbox straight to (32,256,256).

The spacing resample + final resize compose into a single linear resampling
(the intermediate grid only changes interpolation smoothing, not geometry),
so the fused path does one interpolation where the reference does two —
device-resident, static shapes, no host round-trips. Two modes:

  * `preprocess_volume` — the fast fused single-resample default.
  * `preprocess_volume_faithful` — the reference's exact two-interpolation
    chain on device (spacing resample to an intermediate grid computed on
    host from the voxel spacing, then crop-foreground + trilinear resize),
    for checkpoint-parity evals where input perturbation matters.

`reference_preprocess` below is the faithful two-step numpy chain, the
parity oracle for both.

The 2D-slice path (CT-RATE_nii_to_2D_slices.py:183-242): clamp [-1000,1000]
-> /1000 -> spacing resample -> 32 evenly-spaced z-slices (trilinear
z-upsample when depth<32) -> per-slice min-max. `extract_slices` reproduces
it on device, emitting BiomedCLIP-ready (32, 224, 224, 3) tensors.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hsenet_tpu.configs import PreprocessConfig

# open_clip BiomedCLIP normalization (OpenAI CLIP stats)
_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _foreground_bbox(mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """mask (D,H,W) bool -> (lo, hi) int32[3], MONAI CropForeground(>0)."""
    los, his = [], []
    for axis in range(3):
        axes = tuple(a for a in range(3) if a != axis)
        any_line = jnp.any(mask, axis=axes)
        n = any_line.shape[0]
        idx = jnp.arange(n)
        lo = jnp.min(jnp.where(any_line, idx, n))
        hi = jnp.max(jnp.where(any_line, idx, -1)) + 1
        # empty mask -> full extent
        lo = jnp.where(hi <= lo, 0, lo)
        hi = jnp.where(hi <= 0, n, hi)
        los.append(lo)
        his.append(hi)
    return jnp.stack(los).astype(jnp.int32), jnp.stack(his).astype(jnp.int32)


def _linear_resize_axis(vol, axis, n_out, lo, hi):
    """align_corners=False linear resample of one axis onto [lo, hi).

    `lo`/`hi` may be traced scalars (foreground bbox) — this is the
    crop-then-resize of the reference done as one gather+lerp, sampling
    clamped to the bbox so no out-of-crop values leak in.
    """
    extent = (hi - lo).astype(jnp.float32)
    coords = (
        lo.astype(jnp.float32)
        + (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * extent / n_out
        - 0.5
    )
    low = jnp.floor(coords)
    frac = coords - low
    low = low.astype(jnp.int32)
    i0 = jnp.clip(low, lo, hi - 1)
    i1 = jnp.clip(low + 1, lo, hi - 1)
    a = jnp.take(vol, i0, axis=axis)
    b = jnp.take(vol, i1, axis=axis)
    shape = [1] * vol.ndim
    shape[axis] = n_out
    frac = frac.reshape(shape)
    return a * (1.0 - frac) + b * frac


def trilinear_resize(vol: jax.Array, out_shape, blo=None, bhi=None):
    """Separable align_corners=False trilinear resize (F.interpolate
    semantics). With `blo`/`bhi` (traced int32[3]) the source region is that
    bbox: crop + resize as one op."""
    for axis in range(3):
        lo = jnp.int32(0) if blo is None else blo[axis]
        hi = jnp.int32(vol.shape[axis]) if bhi is None else bhi[axis]
        if blo is None and vol.shape[axis] == out_shape[axis]:
            continue  # matches the reference's skip-if-equal
        vol = _linear_resize_axis(vol, axis, out_shape[axis], lo, hi)
    return vol


def spacing_resample_shape(
    shape, spacing_zyx, config: PreprocessConfig = PreprocessConfig()
):
    """Host helper: intermediate grid of the reference's spacing resample
    (nii_to_3D resize_array, :24-38). Op order matters: the reference
    computes the per-axis factor first, then truncates shape*factor —
    e.g. 40 voxels at 1.2mm -> int(40 * (1.2/0.75)) == 63, not 64."""
    factors = [
        spacing_zyx[i] / config.target_spacing[i] for i in range(3)
    ]
    return tuple(max(1, int(shape[i] * factors[i])) for i in range(3))


@functools.partial(jax.jit, static_argnames=("config", "intermediate_shape"))
def preprocess_volume_faithful(
    raw: jax.Array,  # (D, H, W) raw stored values
    slope: jax.Array,
    intercept: jax.Array,
    intermediate_shape: Tuple[int, int, int],
    config: PreprocessConfig = PreprocessConfig(),
) -> jax.Array:
    """Reference-exact two-interpolation chain on device -> (1,32,256,256).

    `intermediate_shape` is the spacing-resample grid, computed on host via
    `spacing_resample_shape(raw.shape, spacing_zyx)` so the jitted program
    stays static-shape. Chain (nii_to_3D:41-124): HU -> clamp -> trilinear
    resample to target spacing -> min-max -> CropForeground(>0) -> trilinear
    resize to target_shape (the crop+resize run as one fused gather).
    """
    hu = slope * raw.astype(jnp.float32) + intercept
    hu = jnp.clip(hu, config.hu_min, config.hu_max)
    hu = trilinear_resize(hu, intermediate_shape)
    lo = jnp.min(hu)
    hi = jnp.max(hu)
    vol = (hu - lo) / jnp.maximum(hi - lo, 1e-8)
    # CropForeground(>0), with an epsilon: after interpolation, background
    # voxels are the minimum only up to f32 rounding (XLA fusion reassociates
    # the lerp), so a strict >0 would see the whole volume as foreground
    blo, bhi = _foreground_bbox(vol > 1e-6)
    out = trilinear_resize(vol, config.target_shape, blo, bhi)
    return jnp.clip(out, 0.0, 1.0)[None]


@functools.partial(jax.jit, static_argnames=("config", "antialias"))
def preprocess_volume(
    raw: jax.Array,  # (D, H, W) raw stored values
    slope: jax.Array,
    intercept: jax.Array,
    config: PreprocessConfig = PreprocessConfig(),
    antialias: bool = False,
) -> jax.Array:
    """-> (1, 32, 256, 256) float32 in [0, 1]."""
    hu = slope * raw.astype(jnp.float32) + intercept
    hu = jnp.clip(hu, config.hu_min, config.hu_max)
    lo = jnp.min(hu)
    hi = jnp.max(hu)
    vol = (hu - lo) / jnp.maximum(hi - lo, 1e-8)

    blo, bhi = _foreground_bbox(vol > 0)
    out_shape = config.target_shape
    extent = (bhi - blo).astype(jnp.float32)
    scale = jnp.array(out_shape, jnp.float32) / extent
    # scale_and_translate maps input pixel-center i to output coord
    # o = scale*i + translation; aligning bbox edges [blo-0.5, bhi-0.5) with
    # output edges [-0.5, out-0.5) gives t = -blo*s + (s-1)/2
    # (align_corners=False semantics, like the reference's F.interpolate).
    translation = -blo.astype(jnp.float32) * scale + 0.5 * (scale - 1.0)
    out = jax.image.scale_and_translate(
        vol,
        out_shape,
        (0, 1, 2),
        scale,
        translation,
        method="linear",
        antialias=antialias,
    )
    return jnp.clip(out, 0.0, 1.0)[None]


def _slices_from_hu(raw, slope, intercept, config, intermediate_shape):
    """Shared HU/resample/slice-selection head of the 2D path -> (n, H, W)
    in [0, 1] after per-slice min-max."""
    hu = slope * raw.astype(jnp.float32) + intercept
    hu = jnp.clip(hu, config.slice_hu_min, config.slice_hu_max) / jnp.abs(
        jnp.float32(config.slice_hu_max)
    )
    if intermediate_shape is not None:
        hu = trilinear_resize(hu, intermediate_shape)
    d = hu.shape[0]
    n = config.num_slices
    if d >= n:
        # 32 evenly spaced slices (reference :204-214: linspace + index)
        zs = jnp.linspace(0, d - 1, n).astype(jnp.int32)
        slices = hu[zs]  # (n, H, W)
    else:
        # depth < 32: trilinear z-upsample, align_corners=False
        # (reference :216-221 F.interpolate mode='trilinear')
        slices = trilinear_resize(hu, (n,) + hu.shape[1:])
    # per-slice min-max (reference :231-236 normalises each slice to 0..255)
    mn = slices.min(axis=(1, 2), keepdims=True)
    mx = slices.max(axis=(1, 2), keepdims=True)
    return (slices - mn) / jnp.maximum(mx - mn, 1e-8)


def _clip_normalize(gray: jax.Array) -> jax.Array:
    """(..., H, W) in [0,1] -> (..., H, W, 3) CLIP-normalised."""
    rgb = jnp.repeat(gray[..., None], 3, axis=-1)
    mean = jnp.asarray(_CLIP_MEAN)
    std = jnp.asarray(_CLIP_STD)
    return (rgb - mean) / std


@functools.partial(
    jax.jit, static_argnames=("config", "intermediate_shape", "faithful")
)
def extract_slices(
    raw: jax.Array,  # (D, H, W)
    slope: jax.Array,
    intercept: jax.Array,
    config: PreprocessConfig = PreprocessConfig(),
    intermediate_shape: Optional[Tuple[int, int, int]] = None,
    faithful: bool = False,
) -> jax.Array:
    """-> (num_slices, S, S, 3) float32, CLIP-normalised, for the 2D trunk.

    Pass `intermediate_shape` (from `spacing_resample_shape`) to reproduce
    the reference's spacing resample before slice selection
    (CT-RATE_nii_to_2D_slices.py:189-196); otherwise slices are picked on
    the raw z grid (fast default; xy geometry is absorbed by the final
    resize to `slice_size`).

    `faithful=True` reproduces the reference's offline image chain — the
    one every released stage-2/VLM checkpoint's precomputed (32, 768)
    features went through (CT-RATE_nii_to_2D_slices.py:230-242 +
    CT-RATE_2D_to_npy_file.py:49-98 open_clip preprocessing):
      per-slice [0,255] quantization with torch's truncating uint8 cast
      -> -90° (clockwise) rotation (PIL rotate(-90, expand=True))
      -> antialiased BICUBIC resize to 224 (+ the post-resize uint8
         quantization PIL/ToTensor applies) -> CLIP normalize.
    Residual vs the reference bytes: PIL's resample uses 8-bit fixed-point
    filter coefficients (<= ~0.5 gray level off an exact bicubic) and the
    saved JPEGs are quality-95 lossy — both below the JPEG noise floor
    already baked into the reference's own features. For byte-exact
    offline regeneration use `cli/preprocess_ct --slice-jpeg-roundtrip`,
    which routes the uint8 slices from `extract_slices_uint8` through a
    real PIL JPEG encode/decode + PIL resize on host.
    """
    slices = _slices_from_hu(raw, slope, intercept, config, intermediate_shape)
    n, s = config.num_slices, config.slice_size
    if not faithful:
        slices = jax.image.resize(slices, (n, s, s), method="linear")
        return _clip_normalize(slices)

    # [0,1] -> 0..255 with torch's `.to(torch.uint8)` TRUNCATION
    # (nii_to_2D_slices.py:71: (x*255).to(uint8)), round-tripped
    u8 = jnp.clip(jnp.floor(slices * 255.0), 0, 255)
    # PIL rotate(-90, expand=True) == np.rot90(a, k=-1): (n, H, W)->(n, W, H)
    u8 = jnp.rot90(u8, k=-1, axes=(1, 2))
    x = u8 / 255.0
    # open_clip preprocess: Resize(224, BICUBIC, antialiased) + CenterCrop.
    h, w = x.shape[1], x.shape[2]
    if h == w:
        x = jax.image.resize(x, (n, s, s), method="cubic", antialias=True)
    else:
        # shorter side -> 224, then center crop (torchvision semantics)
        if h < w:
            nh, nw = s, int(round(w * s / h))
        else:
            nh, nw = int(round(h * s / w)), s
        x = jax.image.resize(x, (n, nh, nw), method="cubic", antialias=True)
        top, left = (nh - s) // 2, (nw - s) // 2
        x = x[:, top : top + s, left : left + s]
    # the resized PIL image is still uint8 before ToTensor divides by 255
    x = jnp.clip(jnp.round(x * 255.0), 0, 255) / 255.0
    return _clip_normalize(x)


@functools.partial(
    jax.jit, static_argnames=("config", "intermediate_shape")
)
def extract_slices_uint8(
    raw: jax.Array,
    slope: jax.Array,
    intercept: jax.Array,
    config: PreprocessConfig = PreprocessConfig(),
    intermediate_shape: Optional[Tuple[int, int, int]] = None,
) -> jax.Array:
    """-> (num_slices, W, H) uint8: the reference's rotated full-resolution
    slices exactly as PIL saw them before the JPEG save
    (CT-RATE_nii_to_2D_slices.py:230-242). Device does the volume-scale
    work; the host-side JPEG/resize tail (cli/preprocess_ct
    --slice-jpeg-roundtrip) finishes the byte-exact offline chain."""
    slices = _slices_from_hu(raw, slope, intercept, config, intermediate_shape)
    u8 = jnp.clip(jnp.floor(slices * 255.0), 0, 255)
    return jnp.rot90(u8, k=-1, axes=(1, 2)).astype(jnp.uint8)


def preprocess_batch(raws, slopes, intercepts, config=PreprocessConfig()):
    """vmapped fused preprocessing for a stacked batch of same-shape raws."""
    f = jax.vmap(lambda r, s, i: preprocess_volume(r, s, i, config))
    return f(raws, slopes, intercepts)


# ---------------------------------------------------------------------------
# Reference-faithful host implementation (parity oracle for tests)
# ---------------------------------------------------------------------------


def _trilinear_resize_np(vol: np.ndarray, out_shape) -> np.ndarray:
    """align_corners=False trilinear, matching F.interpolate semantics."""
    in_shape = vol.shape
    out = vol
    for axis in range(3):
        n_in, n_out = in_shape[axis], out_shape[axis]
        if n_in == n_out:
            continue
        coords = (np.arange(n_out) + 0.5) * n_in / n_out - 0.5
        lo = np.floor(coords).astype(int)
        frac = coords - lo
        lo0 = np.clip(lo, 0, n_in - 1)
        lo1 = np.clip(lo + 1, 0, n_in - 1)
        a = np.take(out, lo0, axis=axis)
        b = np.take(out, lo1, axis=axis)
        shape = [1, 1, 1]
        shape[axis] = n_out
        frac = frac.reshape(shape)
        out = a * (1 - frac) + b * frac
    return out


def _nearest_resize_np(vol: np.ndarray, out_shape) -> np.ndarray:
    """Nearest-neighbor resize (F.interpolate mode='nearest' semantics:
    src index = floor(dst * n_in / n_out))."""
    out = vol
    for axis in range(3):
        n_in, n_out = out.shape[axis], out_shape[axis]
        if n_in == n_out:
            continue
        idx = np.floor(np.arange(n_out) * n_in / n_out).astype(int)
        out = np.take(out, np.clip(idx, 0, n_in - 1), axis=axis)
    return out


def _area_resize_np(vol: np.ndarray, out_shape) -> np.ndarray:
    """'area' resize (F.interpolate mode='area' == adaptive average
    pooling; separable per axis with floor/ceil window boundaries)."""
    out = vol
    for axis in range(3):
        n_in, n_out = out.shape[axis], out_shape[axis]
        if n_in == n_out:
            continue
        starts = np.floor(np.arange(n_out) * n_in / n_out).astype(int)
        ends = np.ceil((np.arange(n_out) + 1) * n_in / n_out).astype(int)
        moved = np.moveaxis(out, axis, 0)
        pooled = np.stack(
            [moved[s:e].mean(axis=0) for s, e in zip(starts, ends)]
        )
        out = np.moveaxis(pooled, 0, axis)
    return out


def reference_preprocess(
    raw: np.ndarray,
    slope: float,
    intercept: float,
    spacing_zyx: Tuple[float, float, float],
    config: PreprocessConfig = PreprocessConfig(),
    final_resize_mode: str = "trilinear",
) -> np.ndarray:
    """The literal reference chain (two interpolations) on host, for parity
    tests against the fused device path.

    `final_resize_mode` exists because the reference's own script cannot
    run as written: its final resize is MONAI
    `Resize(spatial_size=[32,256,256], mode="bilinear")`
    (CT-RATE_nii_to_3D_volume_npy_file.py:121-124), and as pinned
    (monai==1.3.0, torch 2.x) `F.interpolate` on 5-D input with
    mode="bilinear" RAISES ("bilinear mode needs 4D input") — so whatever
    the authors actually executed resolved "bilinear" some other way.
    "trilinear" (the default, and what the device path implements) is the
    natural resolution: linear interpolation is separable, so per-slice
    bilinear + linear along depth IS trilinear. The realistic alternates
    an author could have landed on are "area" (adaptive mean pooling) and
    "nearest" — selectable here so the A100-day one-volume diff
    (PARITY.md §2a) is a config flip, not a rewrite."""
    hu = np.clip(slope * raw.astype(np.float64) + intercept,
                 config.hu_min, config.hu_max)
    # resample to target spacing (nii_to_3D:24-38)
    factors = [
        spacing_zyx[i] / config.target_spacing[i] for i in range(3)
    ]
    new_shape = [max(1, int(hu.shape[i] * factors[i])) for i in range(3)]
    hu = _trilinear_resize_np(hu, new_shape)
    lo, hi = hu.min(), hu.max()
    vol = (hu - lo) / max(hi - lo, 1e-8)
    # CropForeground(>0)
    mask = vol > 0
    slices = []
    for axis in range(3):
        axes = tuple(a for a in range(3) if a != axis)
        line = mask.any(axis=axes)
        nz = np.nonzero(line)[0]
        if len(nz) == 0:
            slices.append(slice(0, vol.shape[axis]))
        else:
            slices.append(slice(int(nz[0]), int(nz[-1]) + 1))
    vol = vol[tuple(slices)]
    resize = {
        "trilinear": _trilinear_resize_np,
        "area": _area_resize_np,
        "nearest": _nearest_resize_np,
    }
    if final_resize_mode not in resize:
        raise ValueError(
            f"final_resize_mode {final_resize_mode!r} not in "
            f"{sorted(resize)}"
        )
    vol = resize[final_resize_mode](vol, config.target_shape)
    return np.clip(vol, 0.0, 1.0)[None].astype(np.float32)


def slices_jpeg_roundtrip_host(
    u8_slices: np.ndarray,  # (n, H, W) uint8 from extract_slices_uint8
    config: PreprocessConfig = PreprocessConfig(),
    jpeg_quality: int = 95,
) -> np.ndarray:
    """Finish the reference's offline 2D chain byte-exactly on host.

    PIL JPEG quality-95 encode/decode (nii_to_2D_slices.py:242), RGB
    convert + BICUBIC shorter-side resize + center crop (the open_clip
    BiomedCLIP preprocess, CT-RATE_2D_to_npy_file.py:74-80), /255, CLIP
    normalize -> (n, S, S, 3) float32. Requires Pillow; this is the
    offline-regeneration path (32 tiny images per volume — the volume-scale
    work already ran on device), used by `cli/preprocess_ct
    --slice-jpeg-roundtrip` when features must match reference-era npys
    bit-for-bit through the same codecs.
    """
    import io

    from PIL import Image

    s = config.slice_size
    out = []
    for sl in np.asarray(u8_slices):
        img = Image.fromarray(sl)  # mode L, like the reference's save
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=jpeg_quality)
        img2 = Image.open(io.BytesIO(buf.getvalue())).convert("RGB")
        w, h = img2.size
        if w == h:
            nw = nh = s
        elif w < h:
            nw, nh = s, int(round(h * s / w))
        else:
            nw, nh = int(round(w * s / h)), s
        img2 = img2.resize((nw, nh), Image.BICUBIC)
        left, top = (nw - s) // 2, (nh - s) // 2
        img2 = img2.crop((left, top, left + s, top + s))
        out.append(np.asarray(img2, np.float32) / 255.0)
    x = np.stack(out)
    mean = np.asarray(_CLIP_MEAN, np.float32)
    std = np.asarray(_CLIP_STD, np.float32)
    return ((x - mean) / std).astype(np.float32)
