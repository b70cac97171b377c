"""Image-text retrieval evaluation.

Reference harnesses `image_text_retrieval_stage{1,2}.py`:
  * I2T / T2I recall@{5,10,50,100}: encode all volumes and reports, argsort
    the similarity matrix, check the ground-truth index in top-k
    (stage1:96-106). The reference encodes one pair at a time on 1 GPU; here
    encoding is batched and jitted, and the similarity/top-k runs as one
    matmul on device.
  * volume-volume retrieval scored by pathology-label overlap of top-k
    neighbors (stage1:186-231): given a binary label matrix, the score of a
    neighbor is |labels_i AND labels_j| / |labels_i OR labels_j| averaged
    over the top-k.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def recall_at_k(
    image_features: np.ndarray,  # (N, D) L2-normalised
    text_features: np.ndarray,  # (N, D)
    ks: Sequence[int] = (5, 10, 50, 100),
) -> Dict[str, float]:
    sim = np.asarray(
        jnp.einsum("id,jd->ij", jnp.asarray(image_features), jnp.asarray(text_features))
    )
    n = sim.shape[0]
    gt = np.arange(n)
    out = {}
    # I2T: rank texts for each image
    order_i2t = np.argsort(-sim, axis=1)
    ranks_i2t = np.argmax(order_i2t == gt[:, None], axis=1)
    # T2I: rank images for each text
    order_t2i = np.argsort(-sim.T, axis=1)
    ranks_t2i = np.argmax(order_t2i == gt[:, None], axis=1)
    for k in ks:
        out[f"i2t_r@{k}"] = float(np.mean(ranks_i2t < k))
        out[f"t2i_r@{k}"] = float(np.mean(ranks_t2i < k))
    return out


def volume_volume_label_overlap(
    image_features: np.ndarray,  # (N, D)
    labels: np.ndarray,  # (N, L) binary pathology labels
    ks: Sequence[int] = (1, 5, 10, 50),
) -> Dict[str, float]:
    sim = image_features @ image_features.T
    np.fill_diagonal(sim, -np.inf)
    order = np.argsort(-sim, axis=1)
    labels = labels.astype(bool)
    out = {}
    for k in ks:
        scores = []
        for i in range(len(labels)):
            nbrs = order[i, :k]
            inter = (labels[i] & labels[nbrs]).sum(axis=1)
            union = (labels[i] | labels[nbrs]).sum(axis=1)
            overlap = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
            scores.append(overlap.mean())
        out[f"i2i_overlap@{k}"] = float(np.mean(scores))
    return out


def encode_corpus(
    encode_image_batch: Callable[[np.ndarray, Optional[np.ndarray]], np.ndarray],
    encode_text_batch: Callable[[np.ndarray, np.ndarray], np.ndarray],
    loader: Iterable[dict],
):
    """Run the (jitted) encoders over a loader; returns stacked features."""
    img_feats, txt_feats = [], []
    for batch in loader:
        img_feats.append(
            np.asarray(
                encode_image_batch(batch["image"], batch.get("image_2d"))
            )
        )
        txt_feats.append(
            np.asarray(
                encode_text_batch(batch["input_ids"], batch["attention_mask"])
            )
        )
    return np.concatenate(img_feats), np.concatenate(txt_feats)


def make_clip_retrieval_eval_fn(model, ks=(5, 10, 50, 100)):
    """`eval_fn(params, loader) -> metrics` with the encoders jitted ONCE.

    Params is a jit ARGUMENT (not a closure capture), so repeated
    in-training evals (the trainer's `on_eval` hook, fired every
    `--eval-every` steps like the reference's 4%-of-steps evaluate,
    train_CLIP_stage1.py:116-131) reuse the compiled programs instead of
    paying a fresh XLA compile per eval."""
    from hsenet_tpu.models.clip import CLIPModel

    @jax.jit
    def enc_img(params, volume, slices=None):
        return model.apply(
            params, volume, slices, method=CLIPModel.encode_image
        )

    @jax.jit
    def enc_txt(params, ids, mask):
        feats, _ = model.apply(
            params, ids, mask, method=CLIPModel.encode_text
        )
        return feats

    def eval_fn(params, loader):
        def enc_img_batch(volume, slices):
            if model.config.vision.slice_guided:
                return enc_img(params, jnp.asarray(volume), jnp.asarray(slices))
            return enc_img(params, jnp.asarray(volume))

        def enc_txt_batch(ids, mask):
            return enc_txt(params, jnp.asarray(ids), jnp.asarray(mask))

        img, txt = encode_corpus(enc_img_batch, enc_txt_batch, loader)
        return recall_at_k(img, txt, ks)

    return eval_fn


def clip_retrieval_eval(model, params, loader, ks=(5, 10, 50, 100)):
    """End-to-end retrieval eval for a `CLIPModel` + params over a loader.

    One-shot convenience wrapper; repeated callers (in-training eval
    hooks) should hold a `make_clip_retrieval_eval_fn` instead."""
    return make_clip_retrieval_eval_fn(model, ks)(params, loader)
