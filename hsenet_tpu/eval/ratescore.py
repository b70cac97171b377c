"""RaTEScore hook (reference `Bench/eval/compute_RateScore.py:24-40`).

RaTEScore requires its external NER + entity-similarity models (the
`RaTEScore` pip package downloads them at runtime); this environment is
offline, so the hook degrades gracefully: if the package and weights are
present it scores prediction/reference pairs, otherwise it reports
unavailability instead of crashing the eval pipeline.
"""

from __future__ import annotations

import csv
from typing import Dict, List, Optional, Sequence


def ratescore_available() -> bool:
    try:
        import RaTEScore  # noqa: F401

        return True
    except Exception:
        return False


def compute_ratescore(
    predictions: Sequence[str], references: Sequence[str]
) -> Optional[List[float]]:
    """Per-sample RaTEScore, or None when the scorer isn't installed."""
    if not ratescore_available():
        return None
    from RaTEScore import RaTEScore as _RaTEScore

    scorer = _RaTEScore()
    return list(scorer.compute_score(list(predictions), list(references)))


def score_eval_csv(csv_path: str) -> Optional[Dict[str, float]]:
    """Post-hoc scoring over an MRG eval CSV (reference reads the CSV the
    same way, compute_RateScore.py:24-40)."""
    preds, refs = [], []
    with open(csv_path) as f:
        for row in csv.DictReader(f):
            preds.append(row["prediction"])
            refs.append(row["answer"])
    scores = compute_ratescore(preds, refs)
    if scores is None:
        return None
    return {
        "ratescore_mean": sum(scores) / max(len(scores), 1),
        "num_samples": len(scores),
    }
