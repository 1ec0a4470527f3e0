"""Evaluation engine: masked ROC, AUC/EER/GAR@FAR, identification.

Reference chain (SURVEY.md section 3.5): ``generatePredictions.py`` ->
``generateMatrixDFW.py`` -> ``ROC_precompute.py`` -> ``getStats.py`` /
``ROC.py`` — five host scripts chained through text files, with the score
matrix built row-by-row and the threshold sweep as nested Python loops.

Here the matrix comes from the fused pairwise engine
(``alink_tpu.ops.pairwise``) and everything downstream is one device pass:

- ``roc``            — upper-triangle mask split (codes 1-4, three ROC
  cases), vectorised threshold sweep, AUC/EER/GAR@FAR;
- ``identification`` — Multi-PIE gallery top-1 (ALINK_MTP.py:271-289);
- ``histogram``      — genuine/imposter score histograms
  (utilities/histogram.py).
"""

from alink_tpu.evaluation.roc import (  # noqa: F401
    CASE_NAMES,
    EvalStats,
    gar_at_far,
    masked_scores,
    roc_from_scores,
    roc_stats,
    score_histograms,
    threshold_sweep,
)
from alink_tpu.evaluation.identification import gallery_top1  # noqa: F401
