"""Batched compute kernels (XLA + Pallas) for the A-LINK stack.

Every op here replaces a per-image / per-pair Python loop or a native
library call in the reference (SURVEY.md section 2.3):

- ``noise``     — the A2-LINK noise bank (code/noise.py) as pure batched
  ``jax.random`` functions.
- ``image``     — bilinear resize + inverse-map affine warp
  (cv2.resize / cv2.warpAffine call sites).
- ``umeyama``   — closed-form 2-D similarity transform estimation
  (skimage SimilarityTransform / mtcnn_detector.find_tfrom_between_shapes).
- ``nms``       — fixed-budget masked non-max suppression (code/helper.py:8-67).
- ``boxes``     — P-Net box decode, calibration, squaring, padded crop
  (code/helper.py:92-129, code/mtcnn_detector.py:72-175).
- ``de``        — pure-JAX batched differential evolution
  (code/differential_evolution.py).
- ``attack``    — one-pixel DE attack + FGSM (code/attack.py).
- ``pairwise``  — the fused all-pairs siamese scoring engine
  (utilities/generateMatrixDFW.py's 7771^2 loop as blocked matmuls).
- ``augment``   — stateless paired rotation/shear/shift augmentation
  (code/helpers.py:114-141).
"""

from alink_tpu.ops import (  # noqa: F401
    attack,
    augment,
    boxes,
    de,
    image,
    nms,
    noise,
    pairwise,
    umeyama,
)
