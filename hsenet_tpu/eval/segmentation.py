"""Segmentation + grounding (REC) evaluation.

The reference evaluates segmentation through its benchmark scripts with dice
on SegVol outputs and REC through IoU of boxes parsed from generated text
(`Bench/utils.py` extract_box_from_text + calculate_iou). Harnesses here:

  * `dice_score` / `evaluate_segmentation`: thresholded soft-dice over a
    loader of {image, seg, text prompt} batches.
  * `evaluate_rec`: generate box answers, parse `<bx_start>[..]<bx_end>`,
    report mean IoU and accuracy@{0.25, 0.5}.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax.numpy as jnp
import numpy as np

from hsenet_tpu.utils.boxes import box_iou_3d, extract_box_from_text


def dice_score(pred_mask: np.ndarray, target: np.ndarray,
               smooth: float = 1e-6) -> float:
    p = pred_mask.astype(bool).ravel()
    t = target.astype(bool).ravel()
    inter = np.logical_and(p, t).sum()
    denom = p.sum() + t.sum()
    return float((2 * inter + smooth) / (denom + smooth))


def evaluate_segmentation(
    segment_fn: Callable,  # (volume (B,1,D,H,W), text_emb (B,C)) -> logits
    text_embed_fn: Callable,  # list[str] -> (B, C)
    loader: Iterable[dict],
    threshold: float = 0.5,
    max_samples: Optional[int] = None,
):
    """Mean dice over a loader of seg QA batches (SegQADataset format)."""
    scores = []
    for batch in loader:
        prompts = [
            t.replace("[SEG]", "").strip() for t in batch["question"]
        ] if "question" in batch else [""] * len(batch["image"])
        text_emb = text_embed_fn(prompts)
        logits = np.asarray(
            segment_fn(jnp.asarray(batch["image"]), jnp.asarray(text_emb))
        )
        probs = 1.0 / (1.0 + np.exp(-logits))
        for i in range(len(probs)):
            scores.append(
                dice_score(probs[i, 0] > threshold, batch["seg"][i, 0])
            )
            if max_samples and len(scores) >= max_samples:
                break
        if max_samples and len(scores) >= max_samples:
            break
    return {"dice": float(np.mean(scores)) if scores else 0.0,
            "num_samples": len(scores)}


def evaluate_rec(
    generate_fn: Callable,
    params,
    loader: Iterable[dict],
    tokenizer,
    iou_thresholds=(0.25, 0.5),
    max_samples: Optional[int] = None,
    reference_compatible: bool = False,
):
    """Referring-expression comprehension: IoU of generated vs gold boxes
    (PosRECDataset batches carry the gold `box`).

    ``reference_compatible=True`` scores with the reference's
    bounding-extent IoU formula (Bench/utils.py:38-54) so acc@{.25,.5}
    is directly comparable to numbers from the reference harness."""
    ious, parsed = [], 0
    n = 0
    for batch in loader:
        kv_lens = batch["attention_mask"].sum(-1).astype(np.int32)
        slices = batch.get("image_2d")
        out_ids = np.asarray(
            generate_fn(
                params,
                jnp.asarray(batch["input_ids"]),
                jnp.asarray(kv_lens),
                jnp.asarray(batch["image"]),
                None if slices is None else jnp.asarray(slices),
            )
        )
        golds = batch.get("box")
        for i in range(len(out_ids)):
            if golds is None or golds[i] is None:
                # absent-target rows carry no gold box (PosRECDataset "no"
                # answers; collate drops the key when any row lacks it) —
                # nothing to score IoU against
                continue
            text = tokenizer.decode(out_ids[i], skip_special_tokens=True)
            pred = extract_box_from_text(text)
            gold = np.asarray(golds[i])
            if pred is not None:
                parsed += 1
                ious.append(
                    box_iou_3d(
                        pred, gold,
                        reference_compatible=reference_compatible,
                    )
                )
            else:
                ious.append(0.0)
            n += 1
            if max_samples and n >= max_samples:
                break
        if max_samples and n >= max_samples:
            break
    ious = np.asarray(ious) if ious else np.zeros(1)
    out = {
        "mean_iou": float(ious.mean()),
        "parse_rate": parsed / max(n, 1),
        "num_samples": n,
    }
    for t in iou_thresholds:
        out[f"acc@{t}"] = float((ious >= t).mean())
    return out
