"""Closed-form 2-D similarity-transform estimation (Umeyama).

Replaces two reference code paths (SURVEY.md section 2.3):

- ``skimage.transform.SimilarityTransform.estimate`` used for ArcFace
  5-landmark alignment (face_preprocess.py:71-73), and
- ``MtcnnDetector.find_tfrom_between_shapes`` (mtcnn_detector.py:537-589),
  a hand-rolled Umeyama via 2x2 SVD.

Both compute the least-squares similarity (rotation + uniform scale +
translation) mapping ``src`` points onto ``dst`` points.  The closed form
(Umeyama 1991):

    mu_s, mu_d  = means;  cov = (dst - mu_d)^T (src - mu_s) / n
    U, D, Vt    = svd(cov);  S = diag(1, sign(det(U) det(Vt)))
    R = U S Vt;  c = trace(diag(D) S) / var(src);  t = mu_d - c R mu_s

Everything is 2x2, fully vectorised, and vmappable over faces (the
reference loops per face, mtcnn_detector.py:606-656).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def umeyama(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Similarity transform M (2x3) with ``dst ~= src @ R^T * c + t``.

    ``src``/``dst``: (K, 2) point sets in (x, y).  Returns the forward
    2x3 matrix usable with ``ops.image.affine_warp``.
    """
    n = src.shape[0]
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    src_c = src - mu_s
    dst_c = dst - mu_d
    # These are 2x2/Kx2 contractions of pixel *coordinates*: keep them off
    # the default TPU matmul path, whose bf16 operand mantissas would
    # perturb the fitted transform by ~0.4% (≈half-pixel warp error).
    hi = jax.lax.Precision.HIGHEST
    cov = jnp.einsum("ki,kj->ij", dst_c, src_c, precision=hi) / n  # (2, 2)
    var_s = jnp.sum(src_c**2) / n

    U, D, Vt = jnp.linalg.svd(cov)
    sign = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    S = jnp.array([1.0, 1.0]) * jnp.array([1.0, 0.0]) + jnp.array(
        [0.0, 1.0]
    ) * sign  # diag entries (1, sign)
    R = jnp.einsum("ij,jk->ik", U * S[None, :], Vt, precision=hi)
    scale = jnp.sum(D * S) / jnp.maximum(var_s, 1e-12)
    t = mu_d - scale * jnp.einsum("ij,j->i", R, mu_s, precision=hi)
    return jnp.concatenate([scale * R, t[:, None]], axis=1)  # (2, 3)


umeyama_batch = jax.vmap(umeyama)


# Canonical ArcFace 5-point template (face_preprocess.py:61-66); for
# 112x112 output the x coordinates shift by +8 (face_preprocess.py:67-68).
ARCFACE_TEMPLATE_112x96 = jnp.array(
    [
        [30.2946, 51.6963],
        [65.5318, 51.5014],
        [48.0252, 71.7366],
        [33.5493, 92.3655],
        [62.7299, 92.2041],
    ],
    dtype=jnp.float32,
)


def arcface_template(image_size: tuple[int, int]) -> jnp.ndarray:
    """Template for (h, w) in {(112, 112), (112, 96)} (face_preprocess.py:56-68)."""
    h, w = image_size
    if h != 112 or w not in (112, 96):
        raise ValueError("ArcFace alignment expects 112x112 or 112x96 output")
    tpl = ARCFACE_TEMPLATE_112x96
    if w == 112:
        tpl = tpl + jnp.array([8.0, 0.0])
    return tpl


# Mean-face template used by extract_image_chips (mtcnn_detector.py:618-619),
# in [0, 1] face-chip coordinates.
MEAN_FACE_SHAPE = jnp.array(
    [
        [0.224152, 0.2119465],
        [0.75610125, 0.2119465],
        [0.490127, 0.628106],
        [0.254149, 0.780233],
        [0.726104, 0.780233],
    ],
    dtype=jnp.float32,
)
