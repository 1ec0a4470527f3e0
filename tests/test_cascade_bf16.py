"""Oracle coverage for the TPU bf16 crop/tower numeric path, on CPU.

On TPU the cascade's stage-2/3 crops run with
``compute_dtype=out_dtype=bfloat16`` (``_crop_dtype``), a path no
differential test exercised before (ADVICE r4): every parity test ran
on CPU where the dtype resolves to f32.  ``CascadeConfig.crop_dtype``
now forces the dtype, so this file runs the EXACT bf16 program on the
CPU backend against the f32 program and bounds the drift.

Error budget (stated): the mtcnn centering is folded into the crop's
f32 accumulator before any bf16 cast (crop_and_resize offset/scale), so
the cast error on crop values is <2^-8 of the [-1, 1] range; the bf16
einsum taps add <=2^-8 relative.  Through the conv towers this stays a
sub-1% perturbation of the logits; scores are compared at 2e-2 and the
decoded landmark coordinates at 0.5 px for jointly-valid detections.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu.detect.cascade import (CascadeConfig, detect_faces,
                                      init_cascade_params)
from alink_tpu.ops.image import crop_and_resize

import jax


def _cfg(crop_dtype):
    return CascadeConfig.typical(crop_dtype=crop_dtype)


def test_bf16_cascade_matches_f32_within_budget(rng):
    params = init_cascade_params(rng, with_lnet=False)
    k1, _ = jax.random.split(rng)
    images = jax.random.uniform(k1, (2, 64, 64, 3), minval=0.0,
                                maxval=255.0)
    f32 = detect_faces(params, images, _cfg("float32"))
    bf16 = detect_faces(params, images, _cfg("bfloat16"))

    both = np.asarray(f32.valid) & np.asarray(bf16.valid)
    # The same detections must survive modulo threshold-marginal flips:
    # demand the masks agree on at least the f32 detections minus one.
    n_f32 = int(np.asarray(f32.valid).sum())
    assert int(both.sum()) >= max(0, n_f32 - 1)
    if both.any():
        np.testing.assert_allclose(
            np.asarray(bf16.scores)[both], np.asarray(f32.scores)[both],
            atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(bf16.landmarks)[both], np.asarray(f32.landmarks)[both],
            atol=0.5)
        np.testing.assert_allclose(
            np.asarray(bf16.boxes)[both], np.asarray(f32.boxes)[both],
            atol=1.0)


def test_crop_offset_scale_fold_matches_post_preprocess(rng):
    """(crop - 127.5) * 0.0078125 folded in f32 == applied after, in f32."""
    img = jax.random.uniform(rng, (32, 32, 3), minval=0.0, maxval=255.0)
    boxes = jnp.array([[2.0, 3.0, 25.0, 26.0], [-4.0, -4.0, 40.0, 40.0]])
    plain = crop_and_resize(img, boxes, (24, 24))
    folded = crop_and_resize(img, boxes, (24, 24),
                             offset=127.5, scale=0.0078125)
    np.testing.assert_allclose(np.asarray(folded),
                               (np.asarray(plain) - 127.5) * 0.0078125,
                               rtol=1e-6, atol=1e-6)


def test_bf16_fold_beats_unfolded_quantisation(rng):
    """The motivating numeric fact: centering BEFORE the bf16 cast keeps
    mid-gray crop values exact to <0.01 pixel LSB, while casting the raw
    value first loses up to 0.5."""
    img = jnp.full((16, 16, 3), 128.3, jnp.float32)
    boxes = jnp.array([[0.0, 0.0, 15.0, 15.0]])
    exact = (crop_and_resize(img, boxes, (8, 8)) - 127.5) * 0.0078125
    folded_bf16 = crop_and_resize(
        img, boxes, (8, 8), out_dtype=jnp.bfloat16,
        offset=127.5, scale=0.0078125).astype(jnp.float32)
    unfolded_bf16 = (crop_and_resize(
        img, boxes, (8, 8), out_dtype=jnp.bfloat16).astype(jnp.float32)
        - 127.5) * 0.0078125
    err_folded = float(jnp.max(jnp.abs(folded_bf16 - exact)))
    err_unfolded = float(jnp.max(jnp.abs(unfolded_bf16 - exact)))
    # In pixel-LSB units (1 LSB = 0.0078125 of the scaled range):
    assert err_folded / 0.0078125 < 0.02
    assert err_folded < err_unfolded


def test_uint8_image_folded_crop_stays_float(rng):
    """Integer inputs + the centering fold must NOT cast back to the
    integer dtype: the folded values live in [-1, 1] and a uint8 cast
    would collapse them to {0, 1} (round-5 advisor finding — regression
    guard for the fix in ops.image._crop_epilogue)."""
    imgf = jax.random.uniform(rng, (32, 32, 3), minval=0.0, maxval=255.0)
    imgu = jnp.round(imgf).astype(jnp.uint8)
    boxes = jnp.array([[2.0, 3.0, 25.0, 26.0]])
    folded_u8 = crop_and_resize(imgu, boxes, (24, 24),
                                offset=127.5, scale=0.0078125)
    assert jnp.issubdtype(folded_u8.dtype, jnp.floating)
    folded_f = crop_and_resize(imgu.astype(jnp.float32), boxes, (24, 24),
                               offset=127.5, scale=0.0078125)
    np.testing.assert_allclose(np.asarray(folded_u8), np.asarray(folded_f),
                               rtol=1e-6, atol=1e-6)


def test_uint8_images_through_cascade_match_float(rng):
    """End-to-end: a uint8 batch through detect_faces equals the same
    pixels as f32 — the path the round-5 crop-fold bug silently broke
    (uint8 crops collapsed to {0, 1} before the towers on CPU)."""
    params = init_cascade_params(rng, with_lnet=False)
    k1, _ = jax.random.split(rng)
    imgu = jax.random.randint(k1, (2, 64, 64, 3), 0, 256, jnp.int32
                              ).astype(jnp.uint8)
    cfg = CascadeConfig.typical()
    du = detect_faces(params, imgu, cfg)
    df = detect_faces(params, imgu.astype(jnp.float32), cfg)
    np.testing.assert_array_equal(np.asarray(du.valid), np.asarray(df.valid))
    np.testing.assert_allclose(np.asarray(du.scores), np.asarray(df.scores),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(du.boxes), np.asarray(df.boxes),
                               rtol=1e-4, atol=1e-3)
