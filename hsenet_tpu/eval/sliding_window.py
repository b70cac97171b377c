"""Sliding-window volumetric inference for SegVol.

The reference wraps SAM-style predictors around fixed ROIs
(`segment_anything_volumetric/predictor.py`); clinical volumes are larger
than the (32,256,256) ROI, so production segmentation tiles the volume.
This is the TPU-friendly equivalent of MONAI's sliding_window_inference:
static ROI shape (one compiled program), precomputed window offsets on host,
gaussian-free uniform blending with an overlap counter.
"""

from __future__ import annotations

import itertools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def window_offsets(
    image_shape: Sequence[int], roi: Sequence[int], overlap: float = 0.25
) -> np.ndarray:
    """Host-side (N, 3) window start offsets covering the volume."""
    starts = []
    for dim, r in zip(image_shape, roi):
        if dim <= r:
            starts.append([0])
            continue
        step = max(1, int(r * (1 - overlap)))
        s = list(range(0, dim - r, step)) + [dim - r]
        starts.append(sorted(set(s)))
    return np.array(list(itertools.product(*starts)), np.int32)


def sliding_window_segment(
    predict_roi: Callable[[jax.Array], jax.Array],
    volume: jax.Array,  # (1, D, H, W) or (C, D, H, W)
    roi: Tuple[int, int, int],
    overlap: float = 0.25,
) -> jax.Array:
    """Tile `volume`, run `predict_roi` ((1, C, *roi) -> (1, 1, *roi)
    logits) per window, uniform-blend overlaps. Returns (1, D, H, W)."""
    c = volume.shape[0]
    spatial = volume.shape[1:]
    offsets = window_offsets(spatial, roi)

    logits = jnp.zeros((1, *spatial), jnp.float32)
    counts = jnp.zeros(spatial, jnp.float32)
    ones = jnp.ones(roi, jnp.float32)

    @jax.jit
    def run_window(volume, logits, counts, off):
        patch = jax.lax.dynamic_slice(
            volume, (0, off[0], off[1], off[2]), (c, *roi)
        )
        out = predict_roi(patch[None])[0, 0].astype(jnp.float32)
        logits = jax.lax.dynamic_update_slice(
            logits,
            jax.lax.dynamic_slice(
                logits, (0, off[0], off[1], off[2]), (1, *roi)
            )
            + out[None],
            (0, off[0], off[1], off[2]),
        )
        counts = jax.lax.dynamic_update_slice(
            counts,
            jax.lax.dynamic_slice(counts, tuple(off), roi) + ones,
            tuple(off),
        )
        return logits, counts

    for off in offsets:
        logits, counts = run_window(volume, logits, counts, jnp.asarray(off))
    return logits / jnp.maximum(counts, 1.0)[None]


def make_segvol_predictor(
    model, params, text_encoder: Optional[Callable] = None
):
    """SegVol ROI predictor factory: returns predict(volume, text_embedding,
    boxes) with the image embedding computed once per window (the reference
    predictor caches embeddings the same way, predictor.py)."""

    @jax.jit
    def predict(volume, text_embedding=None, boxes=None):
        return model.apply(
            params, volume, text_embedding, boxes
        )

    return predict


class ResizeTransform3D:
    """Volume + prompt coordinate transforms between an arbitrary original
    frame and the model's fixed (D, H, W) frame.

    The reference's `ResizeLongestSide` analog
    (segment_anything_volumetric/utils/transforms.py:16-103 +
    predictor.py:31-90): SAM's 2D encoder takes square inputs so one
    longest-side scale plus padding suffices; SegVol's ROI is anisotropic
    and FIXED-size (e.g. (32,256,256)), so each axis resizes independently
    and no padding is needed. Prompt coordinates for the prompt encoder are
    normalized to [0, 1] per axis (models/segvol.py PromptEncoder3D), and a
    structure's fractional position is invariant under per-axis resize —
    so mapping original-frame VOXEL prompts into the model frame is a
    per-axis divide by the original extent.
    """

    def __init__(self, target_size: Tuple[int, int, int]):
        self.target_size = tuple(int(s) for s in target_size)
        self._resize = jax.jit(
            lambda v: jax.image.resize(
                v, (*v.shape[:2], *self.target_size), method="trilinear"
            )
        )

    def apply_volume(self, volume: jax.Array) -> jax.Array:
        """(B, C, D, H, W) at any resolution -> model resolution
        (on-device trilinear; reference apply_image_torch)."""
        if tuple(volume.shape[2:]) == self.target_size:
            return volume
        return self._resize(volume)

    def apply_coords(self, coords, original_size) -> np.ndarray:
        """Voxel (z, y, x) coords in the original frame -> normalized
        [0, 1] model-frame coords (reference apply_coords)."""
        coords = np.asarray(coords, np.float32)
        scale = np.asarray(original_size, np.float32)
        return coords / scale

    def apply_boxes(self, boxes, original_size) -> np.ndarray:
        """Voxel (z1, y1, x1, z2, y2, x2) boxes -> normalized model frame
        (reference apply_boxes: corner-wise apply_coords)."""
        boxes = np.asarray(boxes, np.float32)
        shaped = self.apply_coords(
            boxes.reshape(*boxes.shape[:-1], 2, 3), original_size
        )
        return shaped.reshape(*boxes.shape[:-1], 6)


class SegVolPredictor:
    """Cached-embedding prompt loop — the reference `SamPredictor` API
    (predictor.py:17-262: set_image once, then many predict() calls reuse
    the embedding; reset_image/get_image_embedding included).

    The expensive image encoder runs once per volume; each prompt pays only
    the prompt-encoder + mask-decoder + upsample (one jitted program per
    prompt-kind combination).

    `set_image` accepts volumes at ANY resolution: non-native sizes are
    resampled on device to the model frame (`ResizeTransform3D`), masks
    come back at the ORIGINAL resolution (the decoder's trilinear upsample
    targets the stored original shape), and voxel-frame prompts are mapped
    with `boxes_voxel=` / `points_voxel=` — the reference predictor's
    transform flow (predictor.py:31-90 set_image/predict).
    """

    def __init__(self, model, params):
        from hsenet_tpu.models.segvol import SegVol

        self._model = model
        self._params = params
        self.transform = ResizeTransform3D(model.vision.image_size)
        self._encode = jax.jit(
            lambda p, v: model.apply(p, v, method=SegVol.encode_image)
        )
        self._decode = jax.jit(
            lambda p, feats, shape, text, boxes, points, multi: model.apply(
                p, feats, shape,
                text_embedding=text, boxes=boxes, points=points,
                multimask_output=multi, method=SegVol.decode,
            ),
            static_argnums=(2, 6),
        )
        self._features = None
        self._out_shape = None

    def set_image(self, volume: jax.Array) -> None:
        """(B, 1, D, H, W) at any resolution: resample to the model frame
        if needed, encode, and cache the feature grid. Masks from
        `predict` come back at the volume's ORIGINAL resolution."""
        self._out_shape = tuple(int(s) for s in volume.shape[2:])
        volume = self.transform.apply_volume(volume)
        self._features = self._encode(self._params, volume)

    @property
    def is_image_set(self) -> bool:
        return self._features is not None

    def get_image_embedding(self) -> jax.Array:
        if self._features is None:
            raise RuntimeError("set_image first (predictor.py:245-257)")
        return self._features

    def reset_image(self) -> None:
        self._features = None
        self._out_shape = None

    def predict(
        self,
        text_embedding: Optional[jax.Array] = None,
        boxes: Optional[jax.Array] = None,
        points=None,
        multimask_output: bool = False,
        boxes_voxel=None,
        points_voxel=None,
    ) -> jax.Array:
        """Mask logits at the cached volume's ORIGINAL resolution.

        `boxes`/`points` are normalized [0,1] model-frame prompts;
        `boxes_voxel`/`points_voxel` take original-frame voxel coordinates
        instead and are mapped via `self.transform` (reference
        predictor.py:56-90 apply_boxes/apply_coords flow)."""
        if self._features is None:
            raise RuntimeError("set_image first (predictor.py:102-105)")
        if boxes_voxel is not None:
            assert boxes is None, "pass boxes or boxes_voxel, not both"
            boxes = jnp.asarray(
                self.transform.apply_boxes(boxes_voxel, self._out_shape)
            )
        if points_voxel is not None:
            assert points is None, "pass points or points_voxel, not both"
            coords, labels = points_voxel
            points = (
                jnp.asarray(
                    self.transform.apply_coords(coords, self._out_shape)
                ),
                jnp.asarray(labels),
            )
        return self._decode(
            self._params, self._features, self._out_shape,
            text_embedding, boxes, points, multimask_output,
        )


def _mask_box_3d(mask: "np.ndarray"):
    """Tight (z1, y1, x1, z2, y2, x2) voxel box of a boolean mask, or None
    for an all-background mask (callers skip such proposals)."""
    idx = np.argwhere(mask)
    if idx.size == 0:
        return None
    lo = idx.min(axis=0)
    hi = idx.max(axis=0) + 1
    return np.concatenate([lo, hi])


def _box_iou_3d_np(a: "np.ndarray", b: "np.ndarray") -> float:
    lo = np.maximum(a[:3], b[:3])
    hi = np.minimum(a[3:], b[3:])
    inter = float(np.prod(np.maximum(hi - lo, 0)))
    va = float(np.prod(a[3:] - a[:3]))
    vb = float(np.prod(b[3:] - b[:3]))
    return inter / max(va + vb - inter, 1e-9)


def nms_proposals(proposals, iou_thresh: float = 0.7, score_key="stability"):
    """Greedy 3D box NMS over AMG proposals (reference AMG dedups with
    torchvision `batched_nms` at box_nms_thresh=0.7,
    automatic_mask_generator.py:9,44). Host-side numpy — proposal counts
    are tiny next to the decoder work."""
    ranked = sorted(proposals, key=lambda p: -p[score_key])
    kept = []
    for p in ranked:
        box = p.get("box")
        if box is None:
            box = p["box"] = _mask_box_3d(p["mask"])
        if box is None:
            continue  # empty mask: nothing to keep or suppress against
        if all(_box_iou_3d_np(box, k["box"]) < iou_thresh for k in kept):
            kept.append(p)
    return kept


def automatic_mask_generation(
    model,
    params,
    volume: jax.Array,  # (1, 1, D, H, W) at model ROI size
    points_per_side: int = 4,
    pred_iou_thresh: float = 0.5,
    stability_thresh: float = 0.0,
    box_nms_thresh: Optional[float] = 0.7,
):
    """Grid-point-prompted mask proposals (the reference vendors SAM's
    `automatic_mask_generator.py` unused; this is the volumetric analog):
    prompt the decoder with a (points_per_side)^3 grid of positive points,
    keep masks whose predicted IoU clears the threshold, then greedy box
    NMS at `box_nms_thresh` (None disables, matching no-dedup mode).

    Returns a list of {mask (D,H,W) bool, stability, point (3,), box} dicts.
    """
    d, h, w = volume.shape[2:]
    lin = lambda n, dim: (np.arange(n) + 0.5) / n  # noqa: E731
    zs, ys, xs = lin(points_per_side, d), lin(points_per_side, h), lin(points_per_side, w)
    grid = np.stack(np.meshgrid(zs, ys, xs, indexing="ij"), -1).reshape(-1, 3)

    @jax.jit
    def predict_point(point):
        coords = point[None, None, :]  # (1, 1, 3)
        labels = jnp.ones((1, 1), jnp.int32)
        logits = model.apply(
            params, volume, None, None, (coords, labels)
        )
        return logits[0, 0]

    proposals = []
    for p in grid:
        logits = np.asarray(predict_point(jnp.asarray(p, jnp.float32)))
        probs = 1.0 / (1.0 + np.exp(-logits))
        mask = probs > 0.5
        if mask.sum() == 0:
            continue
        # stability: high-confidence core vs mask extent
        core = probs > 0.7
        stability = core.sum() / max(mask.sum(), 1)
        if stability < stability_thresh:
            continue
        proposals.append(
            {"mask": mask, "stability": float(stability), "point": p}
        )
    if box_nms_thresh is not None:
        proposals = nms_proposals(proposals, box_nms_thresh)
    return proposals
