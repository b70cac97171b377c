"""Medical Report Generation (MRG) evaluation harness.

Mirrors `Bench/eval/eval_HSENet_CT_Rate_MRG.py`: batched greedy generation
(reference: batch 14, max_new 512), per-sample BLEU/ROUGE/METEOR (+ optional
BERTScore), rows + running means streamed to CSV (:408-467). Works for
CT-RATE and BIMCV-R alike — the dataset manifest is the only difference
(the reference duplicates the whole script per corpus).
"""

from __future__ import annotations

import csv
import os
from typing import Callable, Iterable, Optional

import jax.numpy as jnp
import numpy as np

from hsenet_tpu.eval.metrics import RunningMeans, nlg_metrics
from hsenet_tpu.eval.ratescore import (
    active_scorer_name,
    compute_ratescore,
    entity_f1,
    ratescore_available,
)

CSV_FIELDS = [
    "index",
    "question",
    "answer",
    "prediction",
    "bleu1",
    "bleu2",
    "bleu3",
    "bleu4",
    "rouge_l",
    "meteor",
    # ratescore-style column: the official RaTEScore when installed, else
    # the in-repo negation-aware entity-F1 fallback (eval/ratescore.py) —
    # populated either way
    "entity_f1",
]


def evaluate_mrg(
    generate_fn: Callable,  # (params, input_ids, kv_lens, volume, slices) -> ids
    params,
    loader: Iterable[dict],
    tokenizer,
    csv_path: Optional[str] = None,
    bert_embed_fn: Optional[Callable] = None,
    max_samples: Optional[int] = None,
):
    """Returns dict of mean metrics; streams per-sample rows to csv_path."""
    running = RunningMeans()
    rows_written = 0
    writer = None
    f = None
    predictions, references = [], []
    if csv_path:
        os.makedirs(os.path.dirname(csv_path) or ".", exist_ok=True)
        f = open(csv_path, "w", newline="")
        writer = csv.DictWriter(
            f, fieldnames=CSV_FIELDS + [f"mean_{k}" for k in CSV_FIELDS[4:]]
        )
        writer.writeheader()
    try:
        for batch in loader:
            kv_lens = batch["attention_mask"].sum(-1).astype(np.int32)
            out_ids = np.asarray(
                generate_fn(
                    params,
                    jnp.asarray(batch["input_ids"]),
                    jnp.asarray(kv_lens),
                    jnp.asarray(batch["image"]),
                    jnp.asarray(batch["image_2d"])
                    if batch.get("image_2d") is not None
                    else None,
                )
            )
            for i in range(len(out_ids)):
                pred = tokenizer.decode(out_ids[i], skip_special_tokens=True)
                ref = batch["answer"][i]
                row = nlg_metrics(pred, ref)
                row["entity_f1"] = entity_f1(pred, ref)
                means = running.update(row)
                predictions.append(pred)
                references.append(ref)
                if writer:
                    writer.writerow(
                        {
                            "index": rows_written,
                            "question": batch.get("question", [""] * len(out_ids))[i],
                            "answer": ref,
                            "prediction": pred,
                            **{k: f"{v:.6f}" for k, v in row.items()},
                            **{
                                f"mean_{k}": f"{v:.6f}"
                                for k, v in means.items()
                            },
                        }
                    )
                rows_written += 1
                if max_samples and rows_written >= max_samples:
                    raise StopIteration
    except StopIteration:
        pass
    finally:
        if f:
            f.close()

    result = running.means()
    if bert_embed_fn is not None and predictions:
        from hsenet_tpu.eval.metrics import bert_score

        bs = bert_score(predictions, references, bert_embed_fn)
        result["bertscore_f1"] = float(bs["f1"].mean())
    if predictions:
        if ratescore_available():
            scores = compute_ratescore(predictions, references)
            result["ratescore_mean"] = float(np.mean(scores))
        else:
            # the fallback IS the per-row entity_f1 column — reuse its
            # running mean instead of re-extracting the whole corpus
            result["ratescore_mean"] = result["entity_f1"]
        result["ratescore_scorer"] = active_scorer_name()
    result["num_samples"] = rows_written
    return result
