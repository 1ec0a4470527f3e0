"""Fixed-budget MTCNN cascade + 5-landmark alignment.

Reference: ``code/mtcnn_detector.py:307-513`` (detect_face) and
``:591-658`` (extract_image_chips).  Semantics preserved per stage:

1. **Pyramid + P-Net** (mtcnn_detector.py:337-394): scales
   ``12/minsize * factor^i`` while the scaled short side >= 12
   (factor 0.709); per scale, P-Net probabilities are decoded to boxes with
   stride 2 / cell 12 (helper.py:92-129) above threshold[0], NMS 0.5 per
   scale, then global NMS 0.7, first-stage regression refinement
   (mtcnn_detector.py:381-390) and squaring.
2. **R-Net** (mtcnn_detector.py:401-430): 24x24 crops, threshold[1],
   NMS 0.7, calibration, squaring.
3. **O-Net** (mtcnn_detector.py:435-470): 48x48 crops, threshold[2],
   landmarks decoded from the *pre-calibration* squares
   (mtcnn_detector.py:457-464), then calibration and NMS 0.7 'Min'.
4. **Alignment** (mtcnn_detector.py:591-658 / face_preprocess.py:46-111):
   Umeyama similarity transform from the 5 landmarks to the canonical
   ArcFace template, batched affine warp to 112x112.

TPU-first: the pyramid scale set is computed statically from the input
resolution; every stage carries a fixed candidate budget + validity mask
(no dynamic shapes anywhere); the whole cascade jits as one program and
vmaps over the image batch.  The reference's commented-out multiprocessing
pyramid fan-out (mtcnn_detector.py:61,360-364) is moot — all scales run
back-to-back on device in one launch.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from alink_tpu.models import preprocess
from alink_tpu.models.mtcnn import LNet, ONet, PNet, RNet
from alink_tpu.ops.boxes import (
    calibrate_box,
    clip_to_image,
    convert_to_square,
    generate_bbox,
    refine_with_reg,
    select_topk,
)
from alink_tpu.ops.image import (affine_warp_batch, affine_warp_batch_pallas,
                                 crop_and_resize, crop_and_resize_gather,
                                 resize)
from alink_tpu.ops.nms import nms, nms_batch
from alink_tpu.ops.umeyama import arcface_template, umeyama


@dataclasses.dataclass(frozen=True)
class CascadeConfig:
    """Cascade knobs (reference ctor defaults, mtcnn_detector.py:20-50).

    The reference has no candidate caps (dynamic shapes); here every
    stage carries a fixed budget and keeps its top-scoring candidates —
    identical results whenever the budget covers the candidate count,
    lowest-scoring surplus dropped otherwise.  Crop/tower/NMS cost
    scales with the budgets (measured: halving stage1/stage2 budgets
    saves 2.5/2.8 ms per 64 images, BENCHMARKS.md), so pick a profile
    for the workload: ``typical()`` for portrait-style imagery with a
    handful of faces (stage-1 NMS on such images leaves tens of
    candidates — see the MTCNN paper's FDDB/WIDER statistics; sized with
    ~3x headroom over that), ``worst_case()`` to keep the round-1
    lossless budgets for dense crowd scenes.
    """

    min_size: int = 20          # minsize (mtcnn_detector.py:337)
    factor: float = 0.709       # pyramid factor (:347)
    thresholds: tuple[float, float, float] = (0.6, 0.7, 0.8)  # (:28)
    stage1_scale_budget: int = 128   # candidates decoded per pyramid level
    stage1_budget: int = 256         # after global NMS
    stage2_budget: int = 128
    stage3_budget: int = 64
    accurate_landmark: bool = False  # L-Net refine (mtcnn_detector.py:478)
    output_size: tuple[int, int] = (112, 112)
    # Crop/tower intermediate dtype: "auto" = bf16 on TPU, f32 elsewhere;
    # "bfloat16"/"float32" force it (forcing bf16 on CPU is how the TPU
    # numeric path gets oracle coverage — tests/test_cascade_bf16.py).
    crop_dtype: str = "auto"
    # Aggregate cross-image candidate budgets (the ``crowd()`` profile).
    # 0 = off (per-image budgets only, the lossless contract).  Nonzero:
    # stage 2/3 crops+towers run on the top-``stage*_total`` candidates
    # BY SCORE POOLED ACROSS THE BATCH — LOSSY BY CONTRACT (see crowd()).
    stage2_total: int = 0
    stage3_total: int = 0

    @staticmethod
    def typical(**overrides) -> "CascadeConfig":
        """Budgets profiled for few-face imagery (the DFW/MTP use case:
        one pre-cropped face per image, filling >=25% of the frame —
        hence min_size 40: the reference's 20 would spend over half the
        pyramid searching for faces smaller than the workload ever
        contains)."""
        kw = dict(min_size=40, stage1_scale_budget=32, stage1_budget=32,
                  stage2_budget=8, stage3_budget=4)
        kw.update(overrides)
        return CascadeConfig(**kw)

    @staticmethod
    def worst_case(**overrides) -> "CascadeConfig":
        """Lossless budgets for dense scenes (many faces per image)."""
        kw = dict(stage1_scale_budget=128, stage1_budget=256,
                  stage2_budget=128, stage3_budget=64)
        kw.update(overrides)
        return CascadeConfig(**kw)

    @staticmethod
    def crowd(**overrides) -> "CascadeConfig":
        """Aggregate cross-image budgets for dense crowd batches —
        LOSSY BY CONTRACT, unlike ``worst_case()``'s lossless one.

        ``worst_case`` pays per-image worst-case budgets on EVERY image:
        a 64-image batch runs 16,384 R-Net and 8,192 O-Net crops even
        when the batch's real candidate mass sits in a few crowded
        frames.  This profile pools stage-2/3 budgets across the batch
        instead: the top ``stage2_total``/``stage3_total`` candidates by
        score (across all images) get crops+towers; each image is then
        capped at ``stage2_budget``/``stage3_budget`` survivors (the
        scatter cap).  Two documented loss modes: (1) a batch whose
        total candidate mass exceeds the pooled budget drops its
        globally lowest-scoring candidates; (2) a single image denser
        than the per-image cap keeps only its top-cap survivors — the
        same cap ``worst_case`` has.  Within budget, results are
        identical to the lossless path (oracle-tested,
        tests/test_crowd.py).

        Defaults price the pooled budgets at 1/4 (stage 2) and 1/2
        (stage 3) of worst_case's per-image totals for a 64-image batch;
        scale ``stage2_total``/``stage3_total`` with the deployment's
        batch size and crowd density.
        """
        kw = dict(stage1_scale_budget=128, stage1_budget=256,
                  stage2_budget=128, stage3_budget=64,
                  stage2_total=4096, stage3_total=4096)
        kw.update(overrides)
        return CascadeConfig(**kw)


class MTCNNParams(NamedTuple):
    pnet: dict
    rnet: dict
    onet: dict
    lnet: dict | None = None


class Detections(NamedTuple):
    """Padded per-image detections."""

    boxes: jnp.ndarray      # (N, K, 4) [x1, y1, x2, y2]
    scores: jnp.ndarray     # (N, K)
    landmarks: jnp.ndarray  # (N, K, 5, 2) in (x, y)
    valid: jnp.ndarray      # (N, K) bool


_PNET = PNet()
_RNET = RNet()
_ONET = ONet()
_LNET = LNet()


# MTCNN mean-face template in box-relative coordinates
# (mtcnn_detector.py:618-619, mean_face_shape_{x,y} + the 0.5 shift of
# :627-630): a trained O-Net predicts landmarks near this prior.
_MEAN_FACE = (0.224152, 0.75610125, 0.490127, 0.254149, 0.726104,
              0.2119465, 0.2119465, 0.628106, 0.780233, 0.780233)


def init_cascade_params(key: jax.Array,
                        with_lnet: bool = True) -> MTCNNParams:
    """Random-init cascade params (pretrained weights load via orbax).

    The O-Net landmark head is seeded at the mean-face prior (tiny
    kernel + ``_MEAN_FACE`` bias): with fully random weights the
    landmark output is ~N(0, 1) garbage, whose Umeyama fit degenerates
    into extreme-scale transforms — every alignment-warp tile then
    rides the exact full-height fallback, a path real faces never
    take.  Seeding the head keeps random-weight pipelines (tests,
    benchmarks) on the production geometry; converted real checkpoints
    overwrite it entirely.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    onet = _ONET.init(k3, jnp.zeros((1, 48, 48, 3)))
    lmk_head = onet["params"]["Dense_3"]
    onet = dict(onet)
    onet["params"] = dict(onet["params"])
    onet["params"]["Dense_3"] = {
        "kernel": lmk_head["kernel"] * 0.01,
        "bias": jnp.asarray(_MEAN_FACE, lmk_head["bias"].dtype),
    }
    return MTCNNParams(
        pnet=_PNET.init(k1, jnp.zeros((1, 12, 12, 3))),
        rnet=_RNET.init(k2, jnp.zeros((1, 24, 24, 3))),
        onet=onet,
        lnet=_LNET.init(k4, jnp.zeros((1, 24, 24, 15))) if with_lnet
        else None,
    )


def pyramid_scales(h: int, w: int, min_size: int, factor: float
                   ) -> list[float]:
    """Static pyramid scale list (mtcnn_detector.py:337-347): scales
    12/minsize * factor^i while the scaled short side stays strictly
    above 12 (the reference's ``while minl > MIN_DET_SIZE``)."""
    minl = min(h, w)
    base = 12.0 / min_size
    scales = []
    m = minl * base
    scale = base
    while m > 12.0:
        scales.append(scale)
        scale *= factor
        m *= factor
    return scales


def _stage1(params, img, cfg: CascadeConfig, h: int, w: int):
    """Pyramid P-Net pass -> (boxes, scores, valid) in a fixed budget."""
    scales = pyramid_scales(h, w, cfg.min_size, cfg.factor)
    boxes_l, scores_l, regs_l, valid_l = [], [], [], []
    for scale in scales:
        # Ceil dims: helper.py:148-149 (int(math.ceil(side * scale))).
        sh, sw = int(math.ceil(h * scale)), int(math.ceil(w * scale))
        if sh < 12 or sw < 12:
            continue
        scaled = resize(img, (sh, sw))
        prob, reg = _PNET.apply(params.pnet,
                                preprocess.mtcnn(scaled)[None])
        b, s, r, v = generate_bbox(
            prob[0, ..., 1], reg[0], scale, cfg.thresholds[0],
            cfg.stage1_scale_budget,
        )
        boxes_l.append(b)
        scores_l.append(s)
        regs_l.append(r)
        valid_l.append(v)
    if not boxes_l:
        # Image's min side <= cfg.min_size: the pyramid is empty and the
        # reference returns no detections (detect_face's `while minl >
        # MIN_DET_SIZE` plus its early None return) — produce an
        # all-invalid budget instead of crashing on an empty stack.
        k = cfg.stage1_budget
        return (jnp.zeros((k, 4)), jnp.zeros((k,)), jnp.zeros((k,), bool))
    # Per-scale NMS 0.5 (helper.py:161-164): all pyramid levels share one
    # candidate budget, so the whole pyramid suppresses as ONE vmapped
    # call instead of a sequential loop per level.
    stacked_valid = jnp.stack(valid_l)
    keep = nms_batch(jnp.stack(boxes_l), jnp.stack(scores_l),
                     stacked_valid, 0.5)
    boxes = jnp.concatenate(boxes_l)
    scores = jnp.concatenate(scores_l)
    regs = jnp.concatenate(regs_l)
    valid = (stacked_valid & keep).reshape(-1)
    # Global NMS 0.7 Union (mtcnn_detector.py:378).
    valid = valid & nms(boxes, scores, valid, 0.7)
    # First-stage regression + squaring (mtcnn_detector.py:381-394).
    boxes = refine_with_reg(boxes, regs)
    boxes = convert_to_square(boxes)
    boxes = jnp.round(boxes)
    # Stage-boundary fence: keep the next stage's crop einsum out of
    # this stage's decode/NMS schedule (same measured economics as the
    # tower fences — the crop batch in-fusion cost ~3x its standalone).
    return jax.lax.optimization_barrier(
        select_topk(boxes, scores, valid, cfg.stage1_budget))


def _crop_dtype(cfg: CascadeConfig):
    """Crop intermediate dtype: bf16 on TPU (the crops feed bf16 conv
    towers anyway; the mtcnn centering is folded into the crop's f32
    accumulator BEFORE the cast, so the bf16 values live in [-1, 1]
    with ~2^-9 spacing — <0.01 pixel LSB of cast error), full f32
    elsewhere.  Evaluated at trace time so the CPU test backend stays
    fast/exact; ``cfg.crop_dtype`` overrides for differential tests."""
    if cfg.crop_dtype == "auto":
        return jnp.bfloat16 if jax.default_backend() == "tpu" else None
    if cfg.crop_dtype in ("float32", "none"):
        return None
    return jnp.dtype(cfg.crop_dtype)


def _fenced_tower(net, params, crops):
    """Run a refine-net tower behind fusion fences.

    Measured (round 4, dense budgets): the R/O-Net towers standalone
    cost 3.4/8.2 ms per 64 images, but 8.5/11.0 ms *inside* the fused
    cascade program — letting XLA fuse the crop einsums and the
    downstream NMS/select glue into the tower's conv/pool schedule
    costs more than the fusion saves (same economics as the
    align→embed fence in FaceModel._best_chips).  Barriers on the
    tower's inputs and outputs keep its schedule clean.  The crops
    stay in the tower compute dtype end-to-end (the f32 round trip of
    the crop batch is skipped, out_dtype in crop_and_resize) and
    arrive ALREADY mtcnn-preprocessed — the (x - 127.5) * 0.0078125
    centering is folded into the crop's f32 accumulator upstream of
    any bf16 cast (see crop_and_resize's offset/scale).
    """
    crops = jax.lax.optimization_barrier(crops)
    out = net.apply(params, crops)
    return jax.lax.optimization_barrier(out)


def _stage2_tail(boxes, scores, valid, reg, cfg: CascadeConfig):
    """Per-image post-tower stage 2: threshold, NMS, calibrate, square
    (mtcnn_detector.py:418-428).  ``boxes`` are the clipped squares;
    ``scores`` the R-Net face probabilities."""
    valid = valid & (scores > cfg.thresholds[1])  # (:418)
    valid = valid & nms(boxes, scores, valid, 0.7)  # (:424)
    boxes = calibrate_box(boxes, reg)  # (:426)
    boxes = convert_to_square(boxes)   # (:428)
    boxes = jnp.round(boxes)
    # Stage-boundary fence (see _stage1's return).
    return jax.lax.optimization_barrier(
        select_topk(boxes, scores, valid, cfg.stage2_budget))


def _stage2(params, img, boxes, valid, cfg: CascadeConfig):
    # Incoming stage-1 scores are never used: the tail ranks and
    # thresholds on R-Net's own probabilities (mtcnn_detector.py:418),
    # so the signature doesn't take them.
    # Crop geometry keeps the unclipped extent (pad()'s tmpw/tmph are
    # computed before its in-place clamp, mtcnn_detector.py:148-151);
    # everything downstream sees the clipped boxes (see clip_to_image).
    crops = crop_and_resize(img, boxes, (24, 24),
                            compute_dtype=_crop_dtype(cfg),
                            out_dtype=_crop_dtype(cfg),
                            offset=127.5, scale=0.0078125)
    boxes = clip_to_image(boxes, img.shape[1], img.shape[0])
    prob, reg = _fenced_tower(_RNET, params.rnet, crops)
    return _stage2_tail(boxes, prob[:, 1], valid, reg, cfg)


def _stage3_tail(boxes, scores, valid, reg, lmk, cfg: CascadeConfig):
    """Per-image post-tower stage 3: threshold, landmark decode from the
    pre-calibration squares, calibrate, Min-mode NMS
    (mtcnn_detector.py:451-468)."""
    valid = valid & (scores > cfg.thresholds[2])  # (:451)
    # Landmarks decode from the pre-calibration squares
    # (mtcnn_detector.py:457-464): x = x1 + lx * w, y = y1 + ly * h.
    bw = (boxes[:, 2] - boxes[:, 0] + 1.0)[:, None]
    bh = (boxes[:, 3] - boxes[:, 1] + 1.0)[:, None]
    lx = boxes[:, 0:1] + lmk[:, 0:5] * bw
    ly = boxes[:, 1:2] + lmk[:, 5:10] * bh
    landmarks = jnp.stack([lx, ly], axis=-1)  # (K, 5, 2)
    boxes = calibrate_box(boxes, reg)  # (:466)
    valid = valid & nms(boxes, scores, valid, 0.7, mode="min")  # (:468)
    boxes, scores, valid, landmarks = select_topk(
        boxes, scores, valid, cfg.stage3_budget, landmarks
    )
    return boxes, scores, valid, landmarks


def _stage3(params, img, boxes, scores, valid, cfg: CascadeConfig):
    crops = crop_and_resize(img, boxes, (48, 48),
                            compute_dtype=_crop_dtype(cfg),
                            out_dtype=_crop_dtype(cfg),
                            offset=127.5, scale=0.0078125)
    # pad()'s in-place clamp again: landmark decode and calibration both
    # read the clipped squares (mtcnn_detector.py:441, 457-466).
    boxes = clip_to_image(boxes, img.shape[1], img.shape[0])
    prob, reg, lmk = _fenced_tower(_ONET, params.onet, crops)
    return _stage3_tail(boxes, prob[:, 1], valid, reg, lmk, cfg)


def _pool_by_score(scores_flat, valid_flat, n, k, total):
    """Top-``total`` candidates by score across the flat (n*k) batch.

    Returns (flat_idx, img_id, valid), all (total,), sorted by
    (image, -score): jax.lax.top_k emits descending scores and
    jnp.argsort is stable, so a sort on img_id alone preserves the
    score order within each image — exactly the order the scatter's
    per-image slot ranking needs, and the order that makes the crop
    gather's image rows HBM-contiguous runs.  Invalid slots sort last
    (img_id pinned to n).
    """
    masked = jnp.where(valid_flat, scores_flat, -jnp.inf)
    top, idx = jax.lax.top_k(masked, total)
    tvalid = top > -jnp.inf
    img_id = jnp.where(tvalid, idx // k, n)
    order = jnp.argsort(img_id)
    return idx[order], img_id[order], tvalid[order]


def _scatter_per_image(img_id, tvalid, n, cap, *arrays):
    """Scatter pooled candidates back into per-image (n, cap) slots.

    Candidates arrive sorted by (image, -score) with ``img_id`` in
    [0, n] (n = invalid); each image's valid candidates fill slots
    0..cap-1 in score order, surplus beyond ``cap`` is dropped (the
    crowd profile's documented per-image cap).  Returns (arrays
    scattered to (n, cap, ...), valid mask (n, cap)).
    """
    # Rank among the image's VALID candidates: a segment cumsum — dead
    # (below-threshold) candidates must not burn cap slots.
    cumv = jnp.cumsum(tvalid.astype(jnp.int32))
    padded = jnp.concatenate([jnp.zeros(1, jnp.int32), cumv])
    first = jnp.searchsorted(img_id, jnp.arange(n))     # (n,)
    base = padded[first]                                # valid before image
    iid = jnp.clip(img_id, 0, n - 1)
    slot = cumv - 1 - base[iid]
    keep = tvalid & (slot < cap) & (img_id < n)
    sl = jnp.where(keep, slot, cap)                     # overflow column
    outs = []
    for a in arrays:
        o = jnp.zeros((n, cap + 1) + a.shape[1:], a.dtype)
        outs.append(o.at[iid, sl].set(a)[:, :cap])
    vmask = jnp.zeros((n, cap + 1), bool).at[iid, sl].set(keep)[:, :cap]
    return tuple(outs), vmask


def _detect_faces_crowd(params, images, cfg: CascadeConfig):
    """Aggregate-budget cascade (the ``crowd()`` profile).

    Stage 1 runs per-image exactly as the lossless path (its cost is
    per-image by construction — the pyramid reads every pixel).  Stages
    2 and 3 pool: the top-``stage*_total`` candidates by score across
    the whole batch get crops (``crop_and_resize_gather``) and ONE
    tower pass, then scatter back to per-image slots where the
    reference's per-image tail (threshold/NMS/calibrate, which MUST be
    per-image — boxes of different images never suppress each other)
    runs vmapped as usual.  Reference bar: the per-image Python loop of
    mtcnn_detector.py:401-470, which has no batch dimension at all.
    """
    h, w = images.shape[1], images.shape[2]
    n = images.shape[0]
    cdt = _crop_dtype(cfg)

    b1, s1, v1 = jax.vmap(
        lambda im: _stage1(params, im, cfg, h, w))(images)

    # ---- stage 2, pooled --------------------------------------------
    k1 = b1.shape[1]
    t2 = min(cfg.stage2_total or n * k1, n * k1)
    idx2, iid2, tv2 = _pool_by_score(
        s1.reshape(-1), v1.reshape(-1), n, k1, t2)
    bx2 = b1.reshape(-1, 4)[idx2]
    crops2 = crop_and_resize_gather(images, bx2, iid2, (24, 24),
                                    compute_dtype=cdt, out_dtype=cdt,
                                    offset=127.5, scale=0.0078125)
    bx2 = clip_to_image(bx2, w, h)
    prob2, reg2 = _fenced_tower(_RNET, params.rnet, crops2)
    sc2 = prob2[:, 1]
    tv2 = tv2 & (sc2 > cfg.thresholds[1])
    # Scatter cap = stage1_budget (the lossless path's pre-NMS width):
    # the per-image stage2_budget applies AFTER NMS (select_topk in the
    # tail), exactly as the lossless path — capping before NMS would
    # change which survivors the suppression leaves.
    (sb, ss, sr), sv = _scatter_per_image(
        iid2, tv2, n, cfg.stage1_budget, bx2, sc2, reg2)
    b2, s2, v2 = jax.vmap(
        lambda b, s, v, r: _stage2_tail(b, s, v, r, cfg))(sb, ss, sv, sr)

    # ---- stage 3, pooled --------------------------------------------
    k2 = b2.shape[1]
    t3 = min(cfg.stage3_total or n * k2, n * k2)
    idx3, iid3, tv3 = _pool_by_score(
        s2.reshape(-1), v2.reshape(-1), n, k2, t3)
    bx3 = b2.reshape(-1, 4)[idx3]
    crops3 = crop_and_resize_gather(images, bx3, iid3, (48, 48),
                                    compute_dtype=cdt, out_dtype=cdt,
                                    offset=127.5, scale=0.0078125)
    bx3 = clip_to_image(bx3, w, h)
    prob3, reg3, lmk3 = _fenced_tower(_ONET, params.onet, crops3)
    sc3 = prob3[:, 1]
    tv3 = tv3 & (sc3 > cfg.thresholds[2])
    (tb, ts, tr, tl), tv = _scatter_per_image(
        iid3, tv3, n, cfg.stage2_budget, bx3, sc3, reg3, lmk3)
    boxes, scores, valid, landmarks = jax.vmap(
        lambda b, s, v, r, l: _stage3_tail(b, s, v, r, l, cfg))(
        tb, ts, tv, tr, tl)

    if cfg.accurate_landmark:
        if params.lnet is None:
            raise ValueError("accurate_landmark requires lnet params")
        landmarks = jax.vmap(
            lambda im, b, l: _refine_landmarks(params, im, b, l))(
            images, boxes, landmarks)
    return Detections(boxes=boxes, scores=scores, landmarks=landmarks,
                      valid=valid)


def _refine_landmarks(params, img, boxes, landmarks):
    """L-Net landmark refinement (mtcnn_detector.py:478-511).

    Per face: a patch of width ``round(0.25 * max(w, h))`` (made even) is
    cropped around each of the 5 landmarks, resized to 24x24 and stacked
    channel-wise (15 channels); L-Net's (dx, dy) in [0, 1] patch coords
    replace the landmark, with large movements (|offset - 0.5| > 0.35)
    clamped back to the patch centre.
    """
    patchw = jnp.maximum(boxes[:, 2] - boxes[:, 0] + 1.0,
                         boxes[:, 3] - boxes[:, 1] + 1.0)
    patchw = jnp.round(patchw * 0.25)
    patchw = jnp.where(patchw % 2 == 1, patchw + 1, patchw)  # make even

    # (K, 5) top-left corners of the landmark patches.
    x0 = jnp.round(landmarks[..., 0] - 0.5 * patchw[:, None])
    y0 = jnp.round(landmarks[..., 1] - 0.5 * patchw[:, None])
    patch_boxes = jnp.stack(
        [x0, y0, x0 + patchw[:, None] - 1.0, y0 + patchw[:, None] - 1.0],
        axis=-1,
    )  # (K, 5, 4)
    crops = crop_and_resize(img, patch_boxes.reshape(-1, 4), (24, 24))
    crops = crops.reshape(patch_boxes.shape[0], 5, 24, 24, 3)
    stacked = jnp.concatenate(
        [crops[:, i] for i in range(5)], axis=-1)  # (K, 24, 24, 15)
    offsets = _LNET.apply(params.lnet, preprocess.mtcnn(stacked))  # (K, 5, 2)
    # Reference resets the WHOLE (dx, dy) row to the patch centre when
    # EITHER coordinate moves too far: tmp_index[0] of a 2-D np.where is
    # row indices (mtcnn_detector.py:504-505) — not an elementwise clamp.
    bad = jnp.any(jnp.abs(offsets - 0.5) > 0.35, axis=-1, keepdims=True)
    offsets = jnp.where(bad, 0.5, offsets)
    rx = x0 + offsets[..., 0] * patchw[:, None]
    ry = y0 + offsets[..., 1] * patchw[:, None]
    # points.astype(np.int32) (mtcnn_detector.py:511): truncate toward
    # zero, keeping float dtype for the downstream alignment math.
    return jnp.trunc(jnp.stack([rx, ry], axis=-1))


@partial(jax.jit, static_argnames=("cfg",))
def detect_faces(
    params: MTCNNParams,
    images: jnp.ndarray,
    cfg: CascadeConfig = CascadeConfig(),
) -> Detections:
    """Run the full cascade over an (N, H, W, 3) raw-RGB batch."""
    if cfg.stage2_total or cfg.stage3_total:
        return _detect_faces_crowd(params, images, cfg)
    h, w = images.shape[1], images.shape[2]

    def single(img):
        b, s, v = _stage1(params, img, cfg, h, w)
        b, s, v = _stage2(params, img, b, v, cfg)
        b, s, v, lmk = _stage3(params, img, b, s, v, cfg)
        if cfg.accurate_landmark:
            if params.lnet is None:
                raise ValueError("accurate_landmark requires lnet params")
            lmk = _refine_landmarks(params, img, b, lmk)
        return b, s, v, lmk

    boxes, scores, valid, landmarks = jax.vmap(single)(images)
    return Detections(boxes=boxes, scores=scores, landmarks=landmarks,
                      valid=valid)


@partial(jax.jit, static_argnames=("cfg",))
def detect_faces_limited(
    params: MTCNNParams,
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: CascadeConfig = CascadeConfig(),
) -> Detections:
    """Refine known candidate boxes without the P-Net pyramid.

    Reference: ``detect_face_limited`` (mtcnn_detector.py:192-305) — when a
    rough face box is already available (e.g. dataset bboxes,
    face_image records, or the reference's whole-image box at :195) the
    cascade starts at R-Net.  ``boxes``: (N, K, 4) with (N, K) validity.

    Parity note: the reference crops R-Net inputs from the RAW given
    box — no squaring before stage 2 (:199-206; squaring first happens
    inside the R-Net stage at :224) — so none happens here either.
    """
    def single(img, b, v):
        b2, s2, v2 = _stage2(params, img, b, v, cfg)
        b3, s3, v3, lmk = _stage3(params, img, b2, s2, v2, cfg)
        # The limited path refines landmarks too (mtcnn_detector.py:264
        # sits inside detect_face_limited), same as the full cascade.
        if cfg.accurate_landmark:
            if params.lnet is None:
                raise ValueError("accurate_landmark requires lnet params")
            lmk = _refine_landmarks(params, img, b3, lmk)
        return b3, s3, v3, lmk

    bb, ss, vv, lmk = jax.vmap(single)(images, boxes, valid)
    return Detections(boxes=bb, scores=ss, landmarks=lmk, valid=vv)


@partial(jax.jit, static_argnames=("cfg",))
def profile_cascade(
    params: MTCNNParams,
    images: jnp.ndarray,
    cfg: CascadeConfig = CascadeConfig(),
) -> dict:
    """Per-image candidate counts at each cascade point.

    For budget calibration (``tools/calibrate_budgets.py``): run with
    generous budgets and the deployment's real thresholds on a workload
    sample, then size ``CascadeConfig`` budgets off the returned
    distributions.  Keys:

    - ``scale_raw_max``: (N,) the LARGEST per-pyramid-level count of
      P-Net cells above threshold — computed straight off the
      probability map, so it is exact regardless of
      ``stage1_scale_budget``; sizes that budget.
    - ``stage1``/``stage2``/``stage3``: (N,) surviving candidates after
      each stage under ``cfg``'s budgets (a count equal to the budget
      means the budget may have truncated — raise it and re-profile).

    The raw-count pass re-runs the P-Net pyramid that ``_stage1`` also
    runs (~2x stage-1 device time) — accepted: this is an offline
    calibration tool over a few hundred sample images, and threading
    precomputed probability maps through ``_stage1`` would complicate
    the hot path for the benefit of a tool.
    """
    h, w = images.shape[1], images.shape[2]
    scales = [s for s in pyramid_scales(h, w, cfg.min_size, cfg.factor)
              if int(math.ceil(h * s)) >= 12 and int(math.ceil(w * s)) >= 12]

    def single(img):
        raw = []
        for scale in scales:
            sh, sw = int(math.ceil(h * scale)), int(math.ceil(w * scale))
            prob, _ = _PNET.apply(params.pnet,
                                  preprocess.mtcnn(resize(img, (sh, sw)))[None])
            raw.append(jnp.sum(prob[0, ..., 1] > cfg.thresholds[0]))
        scale_raw_max = (jnp.max(jnp.stack(raw)) if raw
                         else jnp.zeros((), jnp.int32))
        b, s, v = _stage1(params, img, cfg, h, w)
        c1 = jnp.sum(v)
        b, s, v = _stage2(params, img, b, v, cfg)
        c2 = jnp.sum(v)
        _, _, v, _ = _stage3(params, img, b, s, v, cfg)
        return scale_raw_max, c1, c2, jnp.sum(v)

    raw, c1, c2, c3 = jax.vmap(single)(images)
    return {"scale_raw_max": raw, "stage1": c1, "stage2": c2, "stage3": c3}


@partial(jax.jit, static_argnames=("output_size", "fence"))
def align_faces(
    images: jnp.ndarray,
    landmarks: jnp.ndarray,
    output_size: tuple[int, int] = (112, 112),
    fence: bool = True,
) -> jnp.ndarray:
    """Warp each detected face to the canonical ArcFace template.

    Reference: face_preprocess.preprocess (face_preprocess.py:46-111) /
    extract_image_chips (mtcnn_detector.py:591-658).  ``images``:
    (N, H, W, 3); ``landmarks``: (N, K, 5, 2) -> chips (N, K, oh, ow, 3).
    """
    template = arcface_template(output_size)
    n, k = landmarks.shape[0], landmarks.shape[1]
    Ms = jax.vmap(lambda l: umeyama(l, template))(
        landmarks.reshape(n * k, 5, 2))
    imgs = jnp.broadcast_to(
        images[:, None], (n, k) + images.shape[1:]).reshape(
        (n * k,) + images.shape[1:])
    # Fence the warp inputs: the kernel's XLA-side prep (transform
    # scalars, band offsets, the image relayout) otherwise fuses into
    # the upstream cascade schedule (in-pipeline warp measured ~0.25
    # ms/64 over its standalone cost; same economics as the other
    # fences).  ``fence=False`` is for A/B measurement only.
    if fence:
        imgs, Ms = jax.lax.optimization_barrier((imgs, Ms))
    # On TPU the warp runs as a Pallas kernel (tap weights built in VMEM;
    # HBM traffic = image read + chip write); elsewhere the XLA einsum
    # formulation.  Same numerics contract (<=1 LSB on uint8-range pixels).
    if jax.default_backend() == "tpu":
        chips = affine_warp_batch_pallas(imgs, Ms, output_size)
    else:
        chips = affine_warp_batch(imgs, Ms, output_size)
    return chips.reshape((n, k) + chips.shape[1:])
