"""Full-cascade differential oracle: detect_faces vs a NumPy re-derivation
of the reference's detect_face plumbing.

The individual ops are oracle-tested elsewhere (NMS vs greedy NumPy,
decode, calibrate, crops).  This test pins the WHOLE pipeline: the
reference's ``detect_face`` (mtcnn_detector.py:307-473) re-implemented
here in plain NumPy — greedy NMS (helper.py:8-67), stride-2/cell-12 box
decode (helper.py:92-129), first-stage regression + squaring, pad()'s
in-place clipping with unclipped crop geometry (mtcnn_detector.py:122-175),
R/O-Net thresholding/calibration and pre-calibration landmark decode —
run against ``detect_faces`` on identical random weights and synthetic
images.  Any drift in stage order, thresholds, rounding, clipping or
decode conventions fails here.

Both sides share the flax tower forwards and the bilinear resize op
(their parity is covered by tests/test_torch_parity_mtcnn.py and the
cv2 goldens in tests/test_geometry.py); what differs is every line of
plumbing between them.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from alink_tpu.detect.cascade import (_ONET, _PNET, _RNET, CascadeConfig,
                                      detect_faces, init_cascade_params)
from alink_tpu.models import preprocess
from alink_tpu.ops.image import resize
import pytest

# Full e2e layer: runs in the nightly/full suite (see pytest.ini tiers).
pytestmark = pytest.mark.slow



# ---------------------------------------------------------------------------
# reference plumbing, re-implemented in NumPy
# ---------------------------------------------------------------------------

def _np_nms(dets, thresh, mode="Union"):
    """Greedy NMS exactly as helper.py:8-67 (dets: (K, 5) with score)."""
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        if mode == "Min":
            ovr = inter / np.minimum(areas[i], areas[order[1:]])
        else:
            ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][np.where(ovr <= thresh)[0]]
    return keep


def _np_generate_bbox(pmap, reg, scale, threshold):
    """helper.py:92-129."""
    stride, cellsize = 2, 12
    t_index = np.where(pmap > threshold)
    if t_index[0].size == 0:
        return np.zeros((0, 9))
    reg_sel = reg[t_index[0], t_index[1], :]  # (n, 4) [dx1, dy1, dx2, dy2]
    score = pmap[t_index[0], t_index[1]]
    bb = np.vstack([
        np.round((stride * t_index[1] + 1) / scale),
        np.round((stride * t_index[0] + 1) / scale),
        np.round((stride * t_index[1] + 1 + cellsize) / scale),
        np.round((stride * t_index[0] + 1 + cellsize) / scale),
        score,
        reg_sel.T,
    ])
    return bb.T


def _np_square(bbox):
    """mtcnn_detector.py:72-94 (score column preserved)."""
    sq = bbox.copy()
    h = bbox[:, 3] - bbox[:, 1] + 1
    w = bbox[:, 2] - bbox[:, 0] + 1
    ms = np.maximum(h, w)
    sq[:, 0] = bbox[:, 0] + w * 0.5 - ms * 0.5
    sq[:, 1] = bbox[:, 1] + h * 0.5 - ms * 0.5
    sq[:, 2] = sq[:, 0] + ms - 1
    sq[:, 3] = sq[:, 1] + ms - 1
    return sq


def _np_calibrate(bbox, reg):
    """mtcnn_detector.py:96-119 (in place, like the reference)."""
    w = (bbox[:, 2] - bbox[:, 0] + 1)[:, None]
    h = (bbox[:, 3] - bbox[:, 1] + 1)[:, None]
    bbox[:, 0:4] = bbox[:, 0:4] + np.hstack([w, h, w, h]) * reg
    return bbox


def _np_pad_crop(img, boxes, out_size):
    """pad() + per-box zero-pad crop + resize (mtcnn_detector.py:403-411).

    Mirrors the reference's de-facto behaviour: the crop geometry uses
    the UNCLIPPED box (tmpw/tmph are computed before pad's clamp), and
    ``boxes`` is mutated in place with the clamped coordinates (pad
    assigns through views of total_boxes).
    """
    h, w = img.shape[0], img.shape[1]
    crops = []
    for b in boxes:
        x1, y1, x2, y2 = b[:4]
        tmpw, tmph = int(x2 - x1 + 1), int(y2 - y1 + 1)
        tmp = np.zeros((tmph, tmpw, 3), np.float32)
        sx1, sy1 = int(max(x1, 0)), int(max(y1, 0))
        sx2, sy2 = int(min(x2, w - 1)), int(min(y2, h - 1))
        dx, dy = sx1 - int(x1), sy1 - int(y1)
        if sx2 >= sx1 and sy2 >= sy1:
            tmp[dy:dy + sy2 - sy1 + 1, dx:dx + sx2 - sx1 + 1] = \
                img[sy1:sy2 + 1, sx1:sx2 + 1]
        crops.append(np.asarray(resize(jnp.asarray(tmp), out_size)))
        # pad()'s in-place clamp of the carried boxes.
        b[0], b[1], b[2], b[3] = sx1, sy1, max(sx2, sx1 - 1), max(sy2, sy1 - 1)
    return np.stack(crops)


def _np_detect_face(img, params, cfg, thresholds=None, collect=None):
    """The reference detect_face control flow (mtcnn_detector.py:307-473),
    with the flax towers as the network forwards.  ``collect`` (optional
    dict) records each stage's raw candidate scores so the test can place
    thresholds away from any candidate (bf16 towers make borderline
    threshold decisions fp-fragile in BOTH implementations)."""
    h, w = img.shape[0], img.shape[1]
    t0, t1, t2 = thresholds if thresholds is not None else cfg.thresholds

    # ---- stage 1: pyramid + P-Net ----
    scales = []
    m = 12.0 / cfg.min_size
    minl = min(h, w) * m
    fc = 0
    while minl > 12.0:
        scales.append(m * cfg.factor ** fc)
        minl *= cfg.factor
        fc += 1

    per_scale = []
    for scale in scales:
        hs, ws = int(math.ceil(h * scale)), int(math.ceil(w * scale))
        im = np.asarray(resize(jnp.asarray(img), (hs, ws)))
        prob, reg = _PNET.apply(params.pnet,
                                preprocess.mtcnn(jnp.asarray(im))[None])
        if collect is not None:
            collect.setdefault("s1", []).append(
                np.asarray(prob)[0, :, :, 1].ravel())
        boxes = _np_generate_bbox(np.asarray(prob)[0, :, :, 1],
                                  np.asarray(reg)[0], scale, t0)
        if boxes.shape[0] == 0:
            continue
        keep = _np_nms(boxes[:, :5], 0.5, "Union")
        per_scale.append(boxes[keep])
    if not per_scale:
        return np.zeros((0, 5)), np.zeros((0, 10))
    total = np.vstack(per_scale)
    keep = _np_nms(total[:, :5], 0.7, "Union")
    total = total[keep]
    bbw = total[:, 2] - total[:, 0] + 1
    bbh = total[:, 3] - total[:, 1] + 1
    total = np.vstack([
        total[:, 0] + total[:, 5] * bbw,
        total[:, 1] + total[:, 6] * bbh,
        total[:, 2] + total[:, 7] * bbw,
        total[:, 3] + total[:, 8] * bbh,
        total[:, 4],
    ]).T
    total = _np_square(total)
    total[:, 0:4] = np.round(total[:, 0:4])

    # ---- stage 2: R-Net ----
    crops = _np_pad_crop(img, total, (24, 24))  # clips total in place
    prob, reg = _RNET.apply(params.rnet, preprocess.mtcnn(jnp.asarray(crops)))
    prob, reg = np.asarray(prob), np.asarray(reg)
    if collect is not None:
        collect["s2"] = prob[:, 1].copy()
    passed = np.where(prob[:, 1] > t1)[0]
    total = total[passed]
    if total.shape[0] == 0:
        return np.zeros((0, 5)), np.zeros((0, 10))
    total[:, 4] = prob[passed, 1]
    reg = reg[passed]
    keep = _np_nms(total, 0.7, "Union")
    total = total[keep]
    total = _np_calibrate(total, reg[keep])
    total = _np_square(total)
    total[:, 0:4] = np.round(total[:, 0:4])

    # ---- stage 3: O-Net ----
    crops = _np_pad_crop(img, total, (48, 48))  # clips total in place
    prob, reg, lmk = _ONET.apply(params.onet,
                                 preprocess.mtcnn(jnp.asarray(crops)))
    prob, reg, lmk = np.asarray(prob), np.asarray(reg), np.asarray(lmk)
    if collect is not None:
        collect["s3"] = prob[:, 1].copy()
    passed = np.where(prob[:, 1] > t2)[0]
    total = total[passed]
    if total.shape[0] == 0:
        return np.zeros((0, 5)), np.zeros((0, 10))
    total[:, 4] = prob[passed, 1]
    reg = reg[passed]
    points = lmk[passed]
    bbw = total[:, 2] - total[:, 0] + 1
    bbh = total[:, 3] - total[:, 1] + 1
    points = points.copy()
    points[:, 0:5] = total[:, 0:1] + bbw[:, None] * points[:, 0:5]
    points[:, 5:10] = total[:, 1:2] + bbh[:, None] * points[:, 5:10]
    total = _np_calibrate(total, reg)
    keep = _np_nms(total, 0.7, "Min")
    return total[keep], points[keep]


# ---------------------------------------------------------------------------
# the differential test
# ---------------------------------------------------------------------------

def _synthetic_image(seed, h, w):
    """Integer-valued pixels (the reference's stage-2 crop buffer is
    uint8, so integer values keep that cast lossless) with a bright
    blob to vary the random towers' responses spatially."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy, cx = rng.uniform(h * 0.3, h * 0.7), rng.uniform(w * 0.3, w * 0.7)
    blob = 120.0 * np.exp(-(((yy - cy) / (h * 0.2)) ** 2
                            + ((xx - cx) / (w * 0.2)) ** 2))
    return np.clip(np.round(img * 0.5 + blob[..., None]), 0, 255)


def _gap_threshold(scores, keep_lo=0.25, keep_hi=0.75):
    """A threshold in the widest gap between adjacent candidate scores,
    keeping between keep_lo and keep_hi of the candidates — both
    implementations then make identical keep/drop decisions despite
    bf16-level score differences."""
    s = np.sort(np.unique(np.asarray(scores)))[::-1]  # descending
    n = s.size
    if n == 0:
        return 0.5
    if n == 1:
        return float(s[0]) - 0.01
    i_lo = max(1, int(n * keep_lo))
    i_hi = min(max(i_lo + 1, int(n * keep_hi)), n)
    # A threshold between s[j-1] and s[j] keeps exactly j candidates.
    gaps = s[i_lo - 1:i_hi - 1] - s[i_lo:i_hi]
    j = int(np.argmax(gaps)) + i_lo
    return float((s[j - 1] + s[j]) / 2.0)


def test_cascade_matches_reference_oracle():
    params = init_cascade_params(jax.random.PRNGKey(7), with_lnet=False)
    base = CascadeConfig(
        min_size=20,
        stage1_scale_budget=256, stage1_budget=256,
        stage2_budget=128, stage3_budget=64,
    )
    for seed, (h, w) in ((0, (64, 56)), (1, (72, 64))):
        img = _synthetic_image(seed, h, w)

        # Place each stage's threshold in the widest inter-candidate
        # score gap (stage by stage, since stage n's candidates depend
        # on threshold n-1).
        c: dict = {}
        _np_detect_face(img, params, base, thresholds=(0.99, 0.99, 0.99),
                        collect=c)
        t0 = _gap_threshold(np.concatenate(c["s1"]), 0.3, 0.6)
        c = {}
        _np_detect_face(img, params, base, thresholds=(t0, 0.99, 0.99),
                        collect=c)
        t1 = _gap_threshold(c["s2"], 0.3, 0.8)
        c = {}
        _np_detect_face(img, params, base, thresholds=(t0, t1, 0.99),
                        collect=c)
        t2 = _gap_threshold(c["s3"], 0.3, 0.8)

        cfg = CascadeConfig(
            min_size=base.min_size, thresholds=(t0, t1, t2),
            stage1_scale_budget=base.stage1_scale_budget,
            stage1_budget=base.stage1_budget,
            stage2_budget=base.stage2_budget,
            stage3_budget=base.stage3_budget,
        )
        want_boxes, want_points = _np_detect_face(img, params, cfg)
        assert want_boxes.shape[0] > 0, "oracle found nothing — retune"
        assert want_boxes.shape[0] < cfg.stage3_budget, "budget saturated"

        det = detect_faces(params, jnp.asarray(img)[None], cfg)
        n_valid = int(det.valid[0].sum())
        assert n_valid == want_boxes.shape[0]

        got_boxes = np.asarray(det.boxes[0])[:n_valid]
        got_scores = np.asarray(det.scores[0])[:n_valid]
        got_lmk = np.asarray(det.landmarks[0])[:n_valid]
        want_lmk = np.stack([want_points[:, 0:5], want_points[:, 5:10]],
                            axis=-1)

        # Assignment-based comparison (scores can tie at bf16 precision,
        # making a pure sort order-fragile): every oracle detection must
        # have exactly one counterpart within tolerance.
        used = np.zeros(n_valid, bool)
        for i in range(n_valid):
            d = np.abs(got_boxes - want_boxes[i, :4]).max(axis=1)
            d = np.where(used, np.inf, d)
            j = int(np.argmin(d))
            # Tolerance scale: a bf16-level score/reg difference can
            # flip a banker's-rounding decision on a stage-2 square by
            # one pixel, which propagates ~1 px into the final
            # calibrated box and landmarks on either side.
            assert d[j] < 1.8, (
                f"oracle box {i} has no match: best diff {d[j]:.3f}\n"
                f"want {want_boxes[i]}\ngot {got_boxes[j]}")
            used[j] = True
            np.testing.assert_allclose(got_scores[j], want_boxes[i, 4],
                                       atol=0.05)
            np.testing.assert_allclose(got_lmk[j], want_lmk[i], atol=1.8)
        assert used.all()


# ---------------------------------------------------------------------------
# detect_face_limited differential oracle
# ---------------------------------------------------------------------------

def _np_detect_face_limited(img, params, boxes, t1, t2, collect=None):
    """Reference detect_face_limited, det_type=2 (mtcnn_detector.py:192-262):
    R-Net on the RAW given boxes (no squaring before stage 2), then
    threshold -> NMS -> calibrate -> square -> round -> the O-Net stage."""
    total = np.hstack([boxes.astype(np.float32),
                       np.full((boxes.shape[0], 1), 0.9, np.float32)])
    work = total.copy()
    crops = _np_pad_crop(img, work, (24, 24))  # clips work in place
    prob, reg = _RNET.apply(params.rnet, preprocess.mtcnn(jnp.asarray(crops)))
    prob, reg = np.asarray(prob), np.asarray(reg)
    if collect is not None:
        collect["s2"] = prob[:, 1].copy()
    passed = np.where(prob[:, 1] > t1)[0]
    total = work[passed]
    if total.shape[0] == 0:
        return np.zeros((0, 5)), np.zeros((0, 10))
    total[:, 4] = prob[passed, 1]
    reg = reg[passed]
    keep = _np_nms(total, 0.7, "Union")
    total = total[keep]
    total = _np_calibrate(total, reg[keep])
    total = _np_square(total)
    total[:, 0:4] = np.round(total[:, 0:4])

    crops = _np_pad_crop(img, total, (48, 48))
    prob, reg, lmk = _ONET.apply(params.onet,
                                 preprocess.mtcnn(jnp.asarray(crops)))
    prob, reg, lmk = np.asarray(prob), np.asarray(reg), np.asarray(lmk)
    if collect is not None:
        collect["s3"] = prob[:, 1].copy()
    passed = np.where(prob[:, 1] > t2)[0]
    total = total[passed]
    if total.shape[0] == 0:
        return np.zeros((0, 5)), np.zeros((0, 10))
    total[:, 4] = prob[passed, 1]
    reg = reg[passed]
    points = lmk[passed].copy()
    bbw = total[:, 2] - total[:, 0] + 1
    bbh = total[:, 3] - total[:, 1] + 1
    points[:, 0:5] = total[:, 0:1] + bbw[:, None] * points[:, 0:5]
    points[:, 5:10] = total[:, 1:2] + bbh[:, None] * points[:, 5:10]
    total = _np_calibrate(total, reg)
    keep = _np_nms(total, 0.7, "Min")
    return total[keep], points[keep]


def test_limited_cascade_matches_reference_oracle():
    """detect_faces_limited vs a NumPy re-derivation of the reference's
    detect_face_limited — incl. the whole-image box the reference
    de-facto uses (mtcnn_detector.py:195) and partially out-of-bounds
    boxes (integer-valued: the reference's pad() int-casts coords)."""
    from alink_tpu.detect import detect_faces_limited

    params = init_cascade_params(jax.random.PRNGKey(7), with_lnet=False)
    h, w = 64, 56
    img = _synthetic_image(2, h, w)
    boxes = np.array([
        [0.0, 0.0, w, h],          # the reference's whole-image box
        [4.0, 6.0, 40.0, 44.0],
        [-8.0, 10.0, 30.0, 50.0],  # partially out of bounds
        [20.0, 24.0, 70.0, 80.0],  # overflows right/bottom
    ], np.float32)

    c: dict = {}
    _np_detect_face_limited(img, params, boxes.copy(), 0.99, 0.99,
                            collect=c)
    t1 = _gap_threshold(c["s2"], 0.3, 0.9)
    c = {}
    _np_detect_face_limited(img, params, boxes.copy(), t1, 0.99, collect=c)
    t2 = _gap_threshold(c["s3"], 0.3, 0.9)

    want_boxes, want_points = _np_detect_face_limited(
        img, params, boxes.copy(), t1, t2)
    assert want_boxes.shape[0] > 0, "oracle kept nothing — retune"

    cfg = CascadeConfig(thresholds=(0.5, t1, t2),
                        stage2_budget=4, stage3_budget=4)
    det = detect_faces_limited(
        params, jnp.asarray(img)[None], jnp.asarray(boxes)[None],
        jnp.ones((1, boxes.shape[0]), bool), cfg)
    n_valid = int(det.valid[0].sum())
    assert n_valid == want_boxes.shape[0]

    got_boxes = np.asarray(det.boxes[0])[:n_valid]
    got_scores = np.asarray(det.scores[0])[:n_valid]
    got_lmk = np.asarray(det.landmarks[0])[:n_valid]
    want_lmk = np.stack([want_points[:, 0:5], want_points[:, 5:10]],
                        axis=-1)
    used = np.zeros(n_valid, bool)
    for i in range(want_boxes.shape[0]):
        d = np.abs(got_boxes - want_boxes[i, :4]).max(axis=1)
        d = np.where(used, np.inf, d)
        j = int(np.argmin(d))
        assert d[j] < 1.8, (
            f"oracle box {i} has no match: best diff {d[j]:.3f}\n"
            f"want {want_boxes[i]}\ngot {got_boxes[j]}")
        used[j] = True
        np.testing.assert_allclose(got_scores[j], want_boxes[i, 4],
                                   atol=5e-3)
        np.testing.assert_allclose(got_lmk[j], want_lmk[i], atol=1.8)
