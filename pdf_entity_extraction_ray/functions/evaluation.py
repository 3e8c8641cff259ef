"""Evaluation protocol — the reference's labeled-data harness re-expressed
(src/ollama_entity_extraction/check_performance.py:51-91):

* gold = alias groups (one real-world entity per group);
* each predicted canonical name claims the FIRST unclaimed gold group that
  contains it (J2 one-to-one semi-join, :63-77);
* found / false-positive / not-found -> precision, recall, accuracy (G5,
  :78-91).

Plus set-level P/R for mentions and triples (the north_rule >= 0.95 gate).
"""

from __future__ import annotations


def match_names_to_groups(
    predicted: list[str], gold_groups: list[list[str]]
) -> tuple[int, int, int]:
    """(found, false_positives, not_found) under first-unclaimed-group
    claiming, in predicted order (check_performance.py:63-77)."""
    claimed = [False] * len(gold_groups)
    found = 0
    false_positives = 0
    for name in predicted:
        hit = None
        for gi, group in enumerate(gold_groups):
            if not claimed[gi] and name in group:
                hit = gi
                break
        if hit is None:
            false_positives += 1
        else:
            claimed[hit] = True
            found += 1
    not_found = sum(1 for c in claimed if not c)
    return found, false_positives, not_found


def name_metrics(predicted: list[str], gold_groups: list[list[str]]) -> dict:
    """precision / recall / accuracy exactly as printed by the reference
    (check_performance.py:78-91)."""
    found, fps, not_found = match_names_to_groups(predicted, gold_groups)
    n_gold = len(gold_groups)
    return {
        "found": found,
        "false_positives": fps,
        "not_found": not_found,
        "precision": found / (found + fps) if (found + fps) else 0.0,
        "recall": found / n_gold if n_gold else 0.0,
        "accuracy": found / (n_gold + fps) if (n_gold + fps) else 0.0,
    }


def set_pr(predicted: set, gold: set) -> dict:
    """Set-level precision/recall/F1 (mention and triple gates)."""
    tp = len(predicted & gold)
    precision = tp / len(predicted) if predicted else 0.0
    recall = tp / len(gold) if gold else 0.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return {"tp": tp, "precision": precision, "recall": recall, "f1": f1}
