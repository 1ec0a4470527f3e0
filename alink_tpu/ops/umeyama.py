"""Closed-form 2-D similarity-transform estimation (Umeyama).

Replaces two reference code paths (SURVEY.md section 2.3):

- ``skimage.transform.SimilarityTransform.estimate`` used for ArcFace
  5-landmark alignment (face_preprocess.py:71-73), and
- ``MtcnnDetector.find_tfrom_between_shapes`` (mtcnn_detector.py:537-589),
  a hand-rolled Umeyama via 2x2 SVD.

Both compute the least-squares similarity (rotation + uniform scale +
translation) mapping ``src`` points onto ``dst`` points.  Umeyama 1991's
SVD recipe

    cov = (dst - mu_d)^T (src - mu_s) / n;  U, D, Vt = svd(cov)
    S = diag(1, sign(det U det Vt));  R = U S Vt
    c = trace(diag(D) S) / var(src);  t = mu_d - c R mu_s

optimises over PROPER rotations (the S matrix bars reflections), and in
2-D that optimum has an SVD-free closed form: scaled proper rotations
``cR = [[a, -b], [b, a]]`` are exactly multiplication by the complex
number ``a + ib``, so the least-squares fit is one complex regression

    a + ib = sum_k d_k conj(s_k) / sum_k |s_k|^2      (centred points)

(t as above).  The rotation angle equals the phase of ``sum d conj(s)``
= the polar/trace-maximising rotation U diag(1, sign) Vt, and the
modulus equals (d1 +/- d2)/var — identical to Umeyama's c, including
the reflective (det cov < 0) case.  This form is pure elementwise
arithmetic: no SVD (XLA lowers jnp.linalg.svd on TPU to an iterative
while-loop — measured ~0.8 ms for a 64-face batch of these 2x2s, vs
microseconds for the closed form), no matmuls (so pixel *coordinates*
never touch bf16 MXU operands), and it vmaps over faces (the reference
loops per face, mtcnn_detector.py:606-656).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def umeyama(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Similarity transform M (2x3) with ``dst ~= src @ R^T * c + t``.

    ``src``/``dst``: (K, 2) point sets in (x, y).  Returns the forward
    2x3 matrix usable with ``ops.image.affine_warp``.
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    src_c = src - mu_s
    dst_c = dst - mu_d
    # Complex regression for the scaled proper rotation (see module
    # docstring) — all elementwise f32, so pixel *coordinates* never
    # touch the TPU's default-bf16 matmul path.
    a = jnp.sum(dst_c[:, 0] * src_c[:, 0] + dst_c[:, 1] * src_c[:, 1])
    b = jnp.sum(dst_c[:, 1] * src_c[:, 0] - dst_c[:, 0] * src_c[:, 1])
    denom = jnp.maximum(jnp.sum(src_c**2), 1e-12)
    a = a / denom
    b = b / denom
    cR = jnp.stack([jnp.stack([a, -b]), jnp.stack([b, a])])
    t = mu_d - jnp.stack([a * mu_s[0] - b * mu_s[1],
                          b * mu_s[0] + a * mu_s[1]])
    return jnp.concatenate([cR, t[:, None]], axis=1)  # (2, 3)


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
