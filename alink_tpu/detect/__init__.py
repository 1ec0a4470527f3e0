"""Face detection + alignment pipeline (MTCNN cascade, TPU-native).

Reference: ``code/mtcnn_detector.py`` (3-stage P/R/O-Net cascade with image
pyramid, NMS, box regression, 5-landmark alignment) and
``code/face_preprocess.py`` (ArcFace template warp), driven by
``code/face_model.py`` (detect -> align -> embed).

TPU-first re-architecture (SURVEY.md section 7, hard part (a)): the
reference's dynamic shapes — variable pyramid depth, data-dependent box
counts, boolean-indexed NMS survivors — become a **fixed pyramid scale set**
(static given the input resolution) and **fixed per-stage candidate
budgets** with validity masks, so the whole cascade is one jit'd program.

- ``cascade``    — the detector (``detect_faces``) and aligner
  (``align_faces``), vmapped over image batches;
- ``face_model`` — the ``FaceModel`` parity API (get_input / get_feature)
  over the cascade + ArcFace embedder.
"""

from alink_tpu.detect.cascade import (  # noqa: F401
    CascadeConfig,
    Detections,
    MTCNNParams,
    align_faces,
    detect_faces,
    detect_faces_limited,
    init_cascade_params,
    pyramid_scales,
)
from alink_tpu.detect.face_model import FaceModel  # noqa: F401
