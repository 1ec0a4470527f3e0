"""MTCNN box arithmetic as fixed-budget masked computation.

Replaces the dynamic-shape NumPy box plumbing of the reference
(code/helper.py:92-129, code/mtcnn_detector.py:72-175) with shape-static
equivalents: every stage carries a fixed candidate budget ``K`` plus a
validity mask instead of variably-sized arrays (SURVEY.md section 7, hard
part (a)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

STRIDE = 2  # helper.py:109
CELLSIZE = 12  # helper.py:110


def generate_bbox(
    prob_map: jnp.ndarray,
    reg_map: jnp.ndarray,
    scale: float,
    threshold: float,
    budget: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode P-Net outputs into a fixed budget of candidate boxes.

    Reference: code/helper.py:92-129 — for every cell with score >
    threshold, the box is ``round((stride * index + 1[(+cellsize)]) / scale)``
    and the 4-d regression is carried alongside.

    Args:
        prob_map: (h, w) face-probability map (class-1 channel).
        reg_map: (h, w, 4) box regression.
        scale: pyramid scale of this level.
        threshold: detection threshold (helper.py:112).
        budget: number of candidates to keep (top scores; masked if fewer).

    Returns:
        boxes (budget, 4), scores (budget,), regs (budget, 4),
        valid (budget,) — all shape-static.
    """
    h, w = prob_map.shape
    flat = prob_map.reshape(-1)
    k = min(budget, h * w)
    scores, idx = jax.lax.top_k(flat, k)
    if k < budget:
        pad = budget - k
        scores = jnp.concatenate([scores, jnp.full((pad,), -jnp.inf)])
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    rows = (idx // w).astype(jnp.float32)
    cols = (idx % w).astype(jnp.float32)
    valid = scores > threshold
    x1 = jnp.round((STRIDE * cols + 1) / scale)
    y1 = jnp.round((STRIDE * rows + 1) / scale)
    x2 = jnp.round((STRIDE * cols + 1 + CELLSIZE) / scale)
    y2 = jnp.round((STRIDE * rows + 1 + CELLSIZE) / scale)
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    regs = reg_map.reshape(-1, 4)[idx]
    return boxes, jnp.where(valid, scores, 0.0), regs, valid


def calibrate_box(boxes: jnp.ndarray, reg: jnp.ndarray) -> jnp.ndarray:
    """Apply regression offsets scaled by box size (mtcnn_detector.py:96-119).

    ``boxes``: (K, 4).  The identical arithmetic serves the first-stage
    refinement too (``refine_with_reg`` is an alias)."""
    w = (boxes[:, 2] - boxes[:, 0] + 1.0)[:, None]
    h = (boxes[:, 3] - boxes[:, 1] + 1.0)[:, None]
    return boxes + jnp.concatenate([w, h, w, h], axis=1) * reg


def convert_to_square(boxes: jnp.ndarray) -> jnp.ndarray:
    """Expand boxes to squares about their centers (mtcnn_detector.py:72-94)."""
    h = boxes[:, 3] - boxes[:, 1] + 1.0
    w = boxes[:, 2] - boxes[:, 0] + 1.0
    side = jnp.maximum(h, w)
    x1 = boxes[:, 0] + w * 0.5 - side * 0.5
    y1 = boxes[:, 1] + h * 0.5 - side * 0.5
    return jnp.stack([x1, y1, x1 + side - 1.0, y1 + side - 1.0], axis=-1)


def clip_to_image(boxes: jnp.ndarray, w: int, h: int) -> jnp.ndarray:
    """Clamp box corners to the image: ``pad``'s in-place coordinate
    mutation (mtcnn_detector.py:122-175 assigns through views of
    ``total_boxes``, so after each pad() call the carried boxes are
    clipped for everything downstream — threshold/NMS/calibrate of the
    next stage — while the *crop geometry* keeps the unclipped extent
    via tmpw/tmph computed before the mutation)."""
    return jnp.stack([
        jnp.maximum(boxes[:, 0], 0.0),
        jnp.maximum(boxes[:, 1], 0.0),
        jnp.minimum(boxes[:, 2], w - 1.0),
        jnp.minimum(boxes[:, 3], h - 1.0),
    ], axis=-1)


def refine_with_reg(boxes: jnp.ndarray, reg5678: jnp.ndarray) -> jnp.ndarray:
    """First-stage refinement (mtcnn_detector.py:381-390): box + reg * size
    — the same arithmetic as R/O-Net calibration, one implementation."""
    return calibrate_box(boxes, reg5678)


def select_topk(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    budget: int,
    *extras: jnp.ndarray,
):
    """Compact a masked candidate set into a fixed budget by score — the
    shape-static analogue of boolean indexing.  A budget larger than the
    candidate count pads with invalid slots."""
    neg = jnp.finfo(scores.dtype).min
    k = scores.shape[-1]
    if budget > k:
        pad = budget - k
        boxes = jnp.concatenate([boxes, jnp.zeros((pad, 4), boxes.dtype)])
        scores = jnp.concatenate([scores, jnp.full((pad,), neg, scores.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
        extras = tuple(
            jnp.concatenate([e, jnp.zeros((pad,) + e.shape[1:], e.dtype)])
            for e in extras
        )
    masked = jnp.where(valid, scores, neg)
    top_scores, idx = jax.lax.top_k(masked, budget)
    new_valid = top_scores > neg
    out_extras = tuple(e[idx] for e in extras)
    return (boxes[idx], jnp.where(new_valid, top_scores, 0.0), new_valid) + out_extras
