"""Scalar text functions mirrored from the reference.

* :func:`levenshtein` — DP edit distance, semantics of
  ``/root/reference/Image_Preprocessing_Optimization/CustomFunctions.py:19-38``.
* :func:`zero_one_loss` — fraction of expected terms matched by predictions
  within tolerance; ``tol`` absolute (int) or length-proportional (float,
  ``≤ int(tol*len(pred))``); predictions of ≤3 chars require exact match
  (``CustomFunctions.py:40-79``).
* :func:`conf_bucket` — confidence→highlight bucket: conf≥80 → 2 (green),
  40≤conf<80 → 1 (blue), else 0 (red)
  (/root/reference/StudiOCR/DocWindow.py:221-227).
* :func:`fuzzy_match` — the fuzzy term-lookup rule used by search.
"""

from __future__ import annotations


def levenshtein(s1: str, s2: str) -> int:
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2)))
        prev = cur
    return prev[-1]


def fuzzy_match(pred: str, expected: str, tol: int | float) -> bool:
    """One predicted term matches an expected term — the reference's rule:
    short predictions (≤3 chars) must match exactly; otherwise edit distance
    ≤ tol (absolute int) or ≤ int(tol*len(pred)) (proportional float)."""
    if len(pred) <= 3:
        return pred == expected
    limit = int(tol * len(pred)) if isinstance(tol, float) else int(tol)
    return levenshtein(pred, expected) <= limit


def zero_one_hits(expected: list[str], predicted: list[str], tol: int | float = 0) -> int:
    """Count of expected terms matched by ≥1 prediction within tolerance —
    the integer numerator of :func:`zero_one_loss` (exposed so corpus-level
    sweeps can micro-average with exact integer sums).

    An exact prediction always satisfies every tol ≥ 0, so equality is
    checked first against a set (O(1)); the O(|pred|·len²) levenshtein scan
    runs only for unmatched terms at tol > 0 — at tol == 0 it is skipped
    entirely (lev ≤ 0 ⟺ equality)."""
    pset = set(predicted)
    tol_zero = not isinstance(tol, float) and int(tol) <= 0
    preds_uniq = None
    hit = 0
    for e in expected:
        if e in pset:
            hit += 1
        elif not tol_zero:
            if preds_uniq is None:
                preds_uniq = list(pset)
            if any(fuzzy_match(p, e, tol) for p in preds_uniq):
                hit += 1
    return hit


def zero_one_loss(expected: list[str], predicted: list[str], tol: int | float = 0) -> float:
    """Fraction of expected terms matched by ≥1 prediction within tolerance."""
    if not expected:
        return 1.0
    return zero_one_hits(expected, predicted, tol) / len(expected)


def conf_bucket(conf: int) -> int:
    if conf >= 80:
        return 2
    if conf >= 40:
        return 1
    return 0
