"""alink_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the A-LINK framework.

A-LINK / A2-LINK (BTAS 2019, IEEE T-BIOM 2020) is a teacher-student
active-learning framework for disguised-face verification.  The reference
implementation (iamgroot42/A-LINK) is a single-GPU Keras/TF1/MXNet codebase;
this package re-designs every component as batched, device-resident,
mesh-shardable computation:

- ``alink_tpu.models``    — flax models: siamese verification heads, SmallRes
  twin tower, VGGFace-ResNet50 (2048-d), ArcFace LResNet100E-II (512-d),
  MTCNN P/R/O/L-Nets (reference: code/siamese.py, code/face_model.py,
  code/mtcnn_detector.py).
- ``alink_tpu.ops``       — batched kernels: noise bank (Gaussian/salt-pepper/
  Poisson/speckle/Perlin), differential evolution, one-pixel + FGSM attacks,
  fixed-budget NMS, Umeyama similarity transform, affine warp, the fused
  pairwise siamese scoring engine (reference: code/noise.py, code/attack.py,
  code/differential_evolution.py, code/helper.py, code/face_preprocess.py,
  utilities/generateMatrixDFW.py).
- ``alink_tpu.data``      — DFW / Multi-PIE manifest readers and pair
  samplers as index-space computations (reference: code/readDFW.py,
  code/readMTP.py).
- ``alink_tpu.active``    — committee (vmapped stacked params), disparity
  selection, the A-LINK loop, classical AL baselines (reference:
  code/committee.py, code/ALINK.py, code/uncertainty.py, code/learners.py).
- ``alink_tpu.detect``    — MTCNN detect->align pipeline with a fixed image
  pyramid and fixed candidate budgets (reference: code/mtcnn_detector.py).
- ``alink_tpu.train``     — jit'd class-weighted training steps, Adadelta,
  early-stop/plateau-LR semantics, orbax checkpointing (reference:
  code/siamese.py:44-112).
- ``alink_tpu.evaluation``— sharded all-pairs score matrix, masked ROC,
  AUC/EER/GAR@FAR, top-1 identification (reference: utilities/*).
- ``alink_tpu.parallel``  — device-mesh construction and sharding helpers;
  DP over the batch/pair-pool axis, committee parallelism over the ensemble
  axis (the reference has no parallelism at all; SURVEY.md section 2.4).
"""

__version__ = "0.1.0"

from alink_tpu.config import (  # noqa: F401
    ALinkConfig,
    MTPConfig,
    ExistingALConfig,
)
