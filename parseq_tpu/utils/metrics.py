"""Evaluation metrics (reference base.py:112-143 semantics)."""

from __future__ import annotations


def edit_distance(a: str, b: str) -> int:
    """Levenshtein distance (insert/delete/substitute, unit costs) — the same
    metric as nltk.edit_distance used by the reference (base.py:21,138)."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def ned(pred: str, gt: str) -> float:
    """ICDAR 2019 normalized edit distance term (summed per sample)."""
    denom = max(len(pred), len(gt))
    return edit_distance(pred, gt) / denom if denom else 0.0
