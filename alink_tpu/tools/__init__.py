"""Evaluation + data-prep CLI tools (the reference's ``utilities/`` layer).

Reference chain (``utilities/README.md``, SURVEY.md section 3.5):

    generatePredictions.py -> generateMatrixDFW.py -> ROC_precompute.py
    -> getStats.py  (+ ROC.py / ROC_all.py / histogram.py plots)

and the Multi-PIE staging scripts (``process.py``, ``bisect_into_paths.py``,
``generate_image_dirs.py``, ``readyData.sh``).  Each tool here keeps the
reference's file contract (npy/txt artifacts chained between steps) while
the compute inside is the batched/fused framework path:

- ``evaluate``             — the WHOLE chain in one command (features ->
  matrix -> masked ROC -> stats), no intermediate files required.
- ``generate_predictions`` — batch-featurize the test list (the reference
  loops images one at a time through ``process([img])``).
- ``generate_matrix``      — the all-pairs score matrix in one fused pass
  (the reference predicts 7,771 rows one by one).
- ``roc_precompute``       — mask split + vectorised threshold sweep.
- ``get_stats``            — AUC / EER / GAR@FAR report.
- ``plots``                — ROC overlays + genuine/imposter histograms.
- ``mtp_staging``          — the Multi-PIE directory staging pipeline.
"""
