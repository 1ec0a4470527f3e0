"""Masked ROC computation + verification statistics.

Reference semantics reproduced exactly:

- ``utilities/ROC_precompute.py:19-40``: only the strict upper triangle of
  the 7771x7771 score matrix is scored.  Mask codes: 1 = genuine
  (impersonation), 2 = genuine (obfuscation), 3 = imposter (impersonation),
  4 = imposter (obfuscation).  ROC case 1 uses {1}/{3}, case 2 {2}/{4},
  case 3 (overall) {1,2}/{3,4}.
- ``utilities/ROC_precompute.py:48-66``: TPR/FPR per threshold with
  ``score >= threshold`` accept semantics.
- ``utilities/getStats.py:9-25``: AUC (trapezoid over the swept curve),
  EER = FPR at argmin |FNR - FPR|, GAR@FAR via nearest swept FPR.
- ``utilities/histogram.py:14-36``: genuine/imposter score histograms.

The reference sweeps thresholds with a double Python loop over every score;
here one sort + ``searchsorted`` per class gives the whole curve.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# Mask codes (ROC_precompute.py:24-37).
GENUINE_IMPERSONATION = 1
GENUINE_OBFUSCATION = 2
IMPOSTER_IMPERSONATION = 3
IMPOSTER_OBFUSCATION = 4

# Case-code -> human label (create_figure_3.m's three reported cases);
# the single authoritative mapping — tools import it rather than
# re-declaring.
CASE_NAMES = {1: "impersonation", 2: "obfuscation", 3: "overall"}

_CASES = {
    1: ((GENUINE_IMPERSONATION,), (IMPOSTER_IMPERSONATION,)),
    2: ((GENUINE_OBFUSCATION,), (IMPOSTER_OBFUSCATION,)),
    3: ((GENUINE_IMPERSONATION, GENUINE_OBFUSCATION),
        (IMPOSTER_IMPERSONATION, IMPOSTER_OBFUSCATION)),
}


def masked_scores(
    scores: np.ndarray, mask: np.ndarray, case: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Split a score matrix into genuine/imposter arrays by mask code.

    Only strict upper-triangle entries participate
    (ROC_precompute.py:21-23).  ``case``: 1 = impersonation,
    2 = obfuscation, 3 = overall.
    """
    if case not in _CASES:
        raise ValueError("roc_case must be 1, 2 or 3")
    gen_codes, imp_codes = _CASES[case]
    scores = np.asarray(scores)
    mask = np.asarray(mask)
    upper = np.triu(np.ones_like(mask, dtype=bool), k=1)
    gen = np.isin(mask, gen_codes) & upper
    imp = np.isin(mask, imp_codes) & upper
    return scores[gen], scores[imp]


def threshold_sweep(
    genuine: jnp.ndarray,
    imposter: jnp.ndarray,
    thresholds: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """TPR/FPR at each threshold (ROC_precompute.py:48-66 semantics:
    accept when ``score >= threshold``).

    Sort + searchsorted: O((n + t) log n) instead of the reference's
    O(n * t) double loop.
    """
    genuine = jnp.sort(jnp.asarray(genuine, jnp.float32))
    imposter = jnp.sort(jnp.asarray(imposter, jnp.float32))
    thresholds = jnp.asarray(thresholds, jnp.float32)
    # Count of scores >= t == n - first index where score >= t.
    tp = genuine.shape[0] - jnp.searchsorted(genuine, thresholds, side="left")
    fp = imposter.shape[0] - jnp.searchsorted(imposter, thresholds,
                                              side="left")
    tpr = tp / jnp.maximum(genuine.shape[0], 1)
    fpr = fp / jnp.maximum(imposter.shape[0], 1)
    return tpr, fpr


class EvalStats(NamedTuple):
    auc: float
    eer: float
    gar_at_1pct_far: float
    gar_at_01pct_far: float


def gar_at_far(tpr: np.ndarray, fpr: np.ndarray, far: float) -> float:
    """GAR at the swept point whose FAR is nearest ``far``
    (getStats.find_nearest, getStats.py:5-7, 18-25)."""
    idx = int(np.argmin(np.abs(np.asarray(fpr) - far)))
    return float(np.asarray(tpr)[idx])


def roc_stats(tpr: np.ndarray, fpr: np.ndarray) -> EvalStats:
    """AUC / EER / GAR@{1%, 0.1%}FAR from a swept curve (getStats.py:9-25)."""
    tpr = np.asarray(tpr, np.float64)
    fpr = np.asarray(fpr, np.float64)
    fnr = 1.0 - tpr
    eer = float(fpr[np.nanargmin(np.abs(fnr - fpr))])
    # Lexicographic (fpr, then tpr) ordering keeps vertical jumps of the
    # step curve zero-width so trapezoid integration uses the attained TPR
    # at each FPR (sklearn.metrics.auc needs the same monotone ordering).
    order = np.lexsort((tpr, fpr))
    auc = float(np.trapezoid(tpr[order], fpr[order]))
    return EvalStats(
        auc=auc,
        eer=eer,
        gar_at_1pct_far=gar_at_far(tpr, fpr, 0.010),
        gar_at_01pct_far=gar_at_far(tpr, fpr, 0.0010),
    )


def roc_from_scores(
    scores: np.ndarray,
    mask: np.ndarray,
    case: int = 3,
    thresholds: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, EvalStats]:
    """The whole ROC_precompute + getStats chain in one call."""
    genuine, imposter = masked_scores(scores, mask, case)
    if thresholds is None:
        thresholds = np.linspace(0.0, 1.0, 10001)
    tpr, fpr = threshold_sweep(genuine, imposter, thresholds)
    tpr, fpr = np.asarray(tpr), np.asarray(fpr)
    return tpr, fpr, roc_stats(tpr, fpr)


def score_histograms(
    genuine: np.ndarray, imposter: np.ndarray, bins: int = 100
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Genuine/imposter histograms over [0, 1] (utilities/histogram.py)."""
    edges = np.linspace(0.0, 1.0, bins + 1)
    hg, _ = np.histogram(np.asarray(genuine), bins=edges)
    hi, _ = np.histogram(np.asarray(imposter), bins=edges)
    return hg, hi, edges
