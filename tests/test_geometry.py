"""Geometry-op tests: NMS, box decode, Umeyama, warp, crop-resize."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu.ops import boxes as boxops
from alink_tpu.ops import image as imops
from alink_tpu.ops import nms as nmsops
from alink_tpu.ops import umeyama as umops


def _greedy_nms_reference(b, s, threshold, mode):
    """Independent NumPy reimplementation of greedy NMS with the reference's
    conventions (helper.py:8-67) used as the test oracle."""
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    idxs = list(np.argsort(s))
    pick = []
    while idxs:
        i = idxs.pop()  # highest remaining score
        pick.append(i)
        rest = np.array(idxs, dtype=int)
        if rest.size == 0:
            break
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        inter = np.maximum(0, xx2 - xx1 + 1) * np.maximum(0, yy2 - yy1 + 1)
        if mode == "min":
            ov = inter / np.minimum(area[i], area[rest])
        else:
            ov = inter / (area[i] + area[rest] - inter)
        idxs = [j for j, o in zip(rest, ov) if o <= threshold]
    return sorted(pick)


@pytest.mark.parametrize("mode", ["union", "min"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nms_matches_greedy_reference(mode, seed):
    rng = np.random.default_rng(seed)
    k = 40
    xy = rng.uniform(0, 80, size=(k, 2))
    wh = rng.uniform(4, 40, size=(k, 2))
    b = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    s = rng.uniform(0, 1, size=k).astype(np.float32)
    keep = np.asarray(
        nmsops.nms(jnp.asarray(b), jnp.asarray(s), jnp.ones(k, bool), 0.5, mode=mode)
    )
    expected = _greedy_nms_reference(b, s, 0.5, mode)
    assert sorted(np.where(keep)[0].tolist()) == expected


def test_nms_deep_suppression_chain():
    """Worst case for the Jacobi fixed-point NMS: a descending-score line
    of boxes where each overlaps only its neighbours, so keep/suppress
    alternates along a long dependency chain (the regime where the
    iteration needs ~chain-depth rounds, unlike random layouts which
    converge in 2-3)."""
    k = 64
    # Box i spans [6i, 6i+10): IoU with neighbour = 4/16 = 0.25 > 0.2,
    # zero overlap beyond the immediate neighbour.
    x = 6.0 * np.arange(k)
    b = np.stack([x, np.zeros(k), x + 9.0, np.full(k, 9.0)],
                 axis=1).astype(np.float32)
    s = np.linspace(1.0, 0.1, k).astype(np.float32)  # strictly descending
    keep = np.asarray(
        nmsops.nms(jnp.asarray(b), jnp.asarray(s), jnp.ones(k, bool), 0.2))
    expected = _greedy_nms_reference(b, s, 0.2, "union")
    # Greedy on a chain keeps every other box: 0, 2, 4, ...
    assert expected == list(range(0, k, 2))
    assert sorted(np.where(keep)[0].tolist()) == expected


@pytest.mark.parametrize("mode", ["union", "min"])
@pytest.mark.parametrize("seed", [3, 4])
def test_nms_blocked_multiblock_dense(mode, seed):
    """K far above the 32-candidate block size with heavily overlapping
    boxes — stresses the blocked scan's cross-block prefix suppression
    and the in-block fixed point together."""
    rng = np.random.default_rng(seed)
    k = 224
    xy = rng.uniform(0, 60, size=(k, 2))          # dense: lots of overlap
    wh = rng.uniform(10, 50, size=(k, 2))
    b = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    s = rng.uniform(0, 1, size=k).astype(np.float32)
    valid = rng.random(k) > 0.1
    keep = np.asarray(nmsops.nms(jnp.asarray(b), jnp.asarray(s),
                                 jnp.asarray(valid), 0.6, mode=mode))
    expected = _greedy_nms_reference(b[valid], s[valid], 0.6, mode)
    vidx = np.where(valid)[0]
    assert sorted(np.where(keep)[0].tolist()) == sorted(
        vidx[expected].tolist())
    assert not keep[~valid].any()


@pytest.mark.parametrize("mode", ["union", "min"])
@pytest.mark.parametrize("k", [256, 300, 520])
def test_nms_large_budget_blocked_path(mode, k):
    """K >= 256 routes through _nms_blocked (sorted block-sequential
    elimination, ops/nms.py) — must still equal the greedy oracle,
    including at non-multiple-of-block sizes and across block
    boundaries of long suppression chains."""
    rng = np.random.default_rng(k + (mode == "min"))
    xy = rng.uniform(0, 90, size=(k, 2))
    wh = rng.uniform(8, 60, size=(k, 2))
    b = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    s = rng.uniform(0, 1, size=k).astype(np.float32)
    valid = rng.random(k) > 0.05
    keep = np.asarray(nmsops.nms(jnp.asarray(b), jnp.asarray(s),
                                 jnp.asarray(valid), 0.5, mode=mode))
    expected = _greedy_nms_reference(b[valid], s[valid], 0.5, mode)
    vidx = np.where(valid)[0]
    assert sorted(np.where(keep)[0].tolist()) == sorted(
        vidx[expected].tolist())
    assert not keep[~valid].any()


@pytest.mark.parametrize("unroll", [1, 2, 4, 9])
def test_nms_unroll_invariant(unroll):
    """The unroll knob (Jacobi sub-steps per convergence check) is a
    pure scheduling choice — exact for any value because the update is
    idempotent past the fixed point (ops/nms.py)."""
    rng = np.random.default_rng(11)
    k = 96
    xy = rng.uniform(0, 70, size=(k, 2))
    wh = rng.uniform(6, 45, size=(k, 2))
    b = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    s = rng.uniform(0, 1, size=k).astype(np.float32)
    valid = rng.random(k) > 0.1
    want = _greedy_nms_reference(b[valid], s[valid], 0.5, "union")
    keep = np.asarray(nmsops.nms(jnp.asarray(b), jnp.asarray(s),
                                 jnp.asarray(valid), 0.5, unroll=unroll))
    vidx = np.where(valid)[0]
    assert sorted(np.where(keep)[0].tolist()) == sorted(
        vidx[want].tolist())


@pytest.mark.parametrize("mode", ["union", "min"])
def test_nms_tie_break_consistent_across_paths(mode):
    """Exactly-equal scores must resolve identically on the K < 256
    Jacobi path and the K >= 256 blocked path (ADVICE r4): both prefer
    the LOWER original index, so a budget change crossing 256 cannot
    flip keep-masks on duplicate scores.  Construct heavy score ties
    over overlapping boxes, run the same candidates at K = 96 and
    padded (invalid) to K = 512, and demand identical keep-masks."""
    rng = np.random.default_rng(7)
    k = 96
    xy = rng.uniform(0, 50, size=(k, 2))
    wh = rng.uniform(10, 45, size=(k, 2))
    b = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    # Only 4 distinct score values -> many exact ties among overlaps.
    s = rng.choice([0.2, 0.4, 0.6, 0.8], size=k).astype(np.float32)
    valid = np.ones(k, bool)
    keep_small = np.asarray(nmsops.nms(jnp.asarray(b), jnp.asarray(s),
                                       jnp.asarray(valid), 0.5, mode=mode))
    pad = 512 - k
    bp = np.concatenate([b, np.zeros((pad, 4), np.float32)])
    sp = np.concatenate([s, np.zeros(pad, np.float32)])
    vp = np.concatenate([valid, np.zeros(pad, bool)])
    keep_big = np.asarray(nmsops.nms(jnp.asarray(bp), jnp.asarray(sp),
                                     jnp.asarray(vp), 0.5, mode=mode))
    np.testing.assert_array_equal(keep_small, keep_big[:k])
    assert not keep_big[k:].any()


def test_crop_and_resize_out_dtype_skips_round_trip():
    """out_dtype=bfloat16 (round 4: the crop batch feeds bf16 towers
    directly) must equal the f32 output cast to bf16 — same einsum,
    just no f32 materialisation in between."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 255, (40, 40, 3)).astype(np.float32))
    boxes = jnp.asarray([[2.0, 3.0, 25.0, 30.0], [-4.0, 0.0, 19.0, 19.0],
                         [10.0, 10.0, 39.0, 39.0]])
    f32 = imops.crop_and_resize(img, boxes, (24, 24))
    bf16 = imops.crop_and_resize(img, boxes, (24, 24),
                                 out_dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(f32.astype(jnp.bfloat16), dtype=np.float32),
        np.asarray(bf16, dtype=np.float32))


def test_nms_respects_validity_mask():
    b = jnp.array([[0, 0, 10, 10], [100, 100, 110, 110]], dtype=jnp.float32)
    s = jnp.array([0.9, 0.8])
    keep = nmsops.nms(b, s, jnp.array([True, False]), 0.5)
    assert bool(keep[0]) and not bool(keep[1])


def test_generate_bbox_decode():
    # helper.py:92-129 — stride 2, cell 12, round((2*idx+1)/scale).
    h, w = 5, 6
    prob = jnp.zeros((h, w)).at[2, 3].set(0.9).at[0, 0].set(0.7)
    reg = jnp.arange(h * w * 4, dtype=jnp.float32).reshape(h, w, 4)
    bxs, scores, regs, valid = boxops.generate_bbox(prob, reg, 0.5, 0.6, budget=8)
    assert valid.sum() == 2
    # Highest score first (top_k order).
    np.testing.assert_allclose(scores[0], 0.9)
    np.testing.assert_allclose(
        np.asarray(bxs[0]),
        [round((2 * 3 + 1) / 0.5), round((2 * 2 + 1) / 0.5),
         round((2 * 3 + 1 + 12) / 0.5), round((2 * 2 + 1 + 12) / 0.5)],
    )
    np.testing.assert_allclose(np.asarray(regs[0]), np.asarray(reg[2, 3]))


def test_calibrate_and_square():
    b = jnp.array([[0.0, 0.0, 9.0, 19.0]])
    reg = jnp.array([[0.1, 0.1, -0.1, -0.1]])
    cal = boxops.calibrate_box(b, reg)
    # w=10, h=20 -> [0+1, 0+2, 9-1, 19-2]
    np.testing.assert_allclose(np.asarray(cal[0]), [1.0, 2.0, 8.0, 17.0])
    sq = boxops.convert_to_square(b)
    w, h = 10.0, 20.0
    x1 = 0 + w * 0.5 - h * 0.5
    np.testing.assert_allclose(np.asarray(sq[0]), [x1, 0.0, x1 + 19.0, 19.0])


def test_umeyama_recovers_similarity(rng):
    # Construct a known similarity and check recovery to machine precision.
    theta, scale, t = 0.3, 1.7, np.array([5.0, -2.0])
    R = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    src = np.asarray(jax.random.normal(rng, (5, 2))) * 10
    dst = scale * src @ R.T + t
    M = np.asarray(umops.umeyama(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(M[:, :2], scale * R, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(M[:, 2], t, rtol=1e-4, atol=1e-3)


def test_umeyama_handles_reflection(rng):
    # Mirrored targets must still yield a proper rotation (det > 0),
    # matching the sign-correction branch (mtcnn_detector.py:576-581).
    src = np.asarray(jax.random.normal(rng, (5, 2)))
    dst = src.copy()
    dst[:, 0] *= -1.0
    M = np.asarray(umops.umeyama(jnp.asarray(src), jnp.asarray(dst)))
    assert np.linalg.det(M[:, :2]) > 0


def _umeyama_oracle(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Independent NumPy Umeyama (1991) via full SVD — the algorithm
    skimage.SimilarityTransform.estimate implements (and the reference
    re-derives by hand at mtcnn_detector.py:537-589).  Our production op
    uses a closed-form 2x2 trig SVD instead, so this is a genuinely
    different code path."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / src.shape[0]
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U) * np.linalg.det(Vt))
    D = np.diag([1.0, d])
    R = U @ D @ Vt
    var_s = (sc ** 2).sum() / src.shape[0]
    scale = np.trace(np.diag(S) @ D) / var_s
    t = mu_d - scale * R @ mu_s
    return np.concatenate([scale * R, t[:, None]], axis=1)


def test_umeyama_matches_full_svd_oracle():
    """Parity with the Umeyama algorithm, independently implemented.

    Runs unconditionally (skimage is absent in some environments; the
    assertion must always execute) and cross-checks against the real
    skimage when importable."""
    rng = np.random.default_rng(0)
    for _ in range(5):
        src = rng.normal(size=(5, 2)) * 20 + 50
        dst = rng.normal(size=(5, 2)) * 20 + 40
        expected = _umeyama_oracle(src, dst)
        M = np.asarray(umops.umeyama(jnp.asarray(src, dtype=jnp.float32),
                                     jnp.asarray(dst, dtype=jnp.float32)))
        np.testing.assert_allclose(M, expected, rtol=1e-3, atol=1e-3)
        try:
            import skimage.transform as skt
        except ImportError:
            continue
        tf = skt.SimilarityTransform()
        tf.estimate(src, dst)
        np.testing.assert_allclose(M, tf.params[:2, :], rtol=1e-3, atol=1e-3)


def test_umeyama_matches_skimage_golden():
    """Vendored golden transform for fixed inputs (generated with the
    full-SVD oracle, which matches skimage wherever skimage exists)."""
    src = np.array([[30.0, 40.0], [70.0, 42.0], [50.0, 60.0],
                    [35.0, 80.0], [66.0, 78.0]])
    dst = np.array([[38.29, 51.69], [73.53, 41.89], [56.02, 71.36],
                    [51.12, 87.71], [80.19, 73.87]])
    golden = _umeyama_oracle(src, dst)
    M = np.asarray(umops.umeyama(jnp.asarray(src, dtype=jnp.float32),
                                 jnp.asarray(dst, dtype=jnp.float32)))
    np.testing.assert_allclose(M, golden, rtol=1e-4, atol=1e-3)


def test_affine_warp_identity_and_shift():
    img = jnp.arange(16.0).reshape(4, 4, 1)
    ident = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = imops.affine_warp(img, ident, (4, 4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    # Shift dst = src + (1, 0): output column 0 comes from "outside" -> 0.
    shift = jnp.array([[1.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
    out = np.asarray(imops.affine_warp(img, shift, (4, 4)))
    np.testing.assert_allclose(out[:, 0, 0], 0.0)
    np.testing.assert_allclose(out[:, 1:, 0], np.asarray(img)[:, :3, 0], atol=1e-5)


def test_crop_and_resize_exact_box():
    img = jnp.arange(36.0).reshape(6, 6, 1)
    # Box covering rows/cols 2..3 inclusive, resized to its own size.
    out = imops.crop_and_resize(img, jnp.array([[2.0, 2.0, 3.0, 3.0]]), (2, 2))
    np.testing.assert_allclose(
        np.asarray(out[0, ..., 0]), np.asarray(img[2:4, 2:4, 0]), atol=1e-5
    )


def test_crop_and_resize_zero_padding_outside():
    img = jnp.ones((4, 4, 1))
    out = np.asarray(
        imops.crop_and_resize(img, jnp.array([[-4.0, -4.0, -1.0, -1.0]]), (4, 4))
    )
    np.testing.assert_allclose(out, 0.0)


def test_crop_and_resize_upscale_matches_crop_then_resize(rng):
    """Boxes SMALLER than out_size (P-Net 20 px boxes -> 24 px R-Net
    crops at min_size 20): the reference crops first and cv2.resize
    replicates the crop's border taps — it never reads image pixels
    outside the box.  Differential oracle: crop the box in NumPy, then
    resize the crop with the package's own (cv2-parity-tested) resize."""
    img = jnp.asarray(
        np.asarray(jax.random.uniform(rng, (12, 12, 3))) * 255)
    box = jnp.array([[3.0, 2.0, 7.0, 6.0]])  # 5x5 box -> 8x8 output
    ours = np.asarray(imops.crop_and_resize(img, box, (8, 8))[0])
    crop = np.asarray(img)[2:7, 3:8]
    want = np.asarray(imops.resize(jnp.asarray(crop), (8, 8)))
    np.testing.assert_allclose(ours, want, atol=1e-3)


def test_resize_matches_cv2_when_available(rng):
    cv2 = pytest.importorskip("cv2")
    img = np.asarray(jax.random.uniform(rng, (17, 13, 3))) * 255
    ours = np.asarray(imops.resize(jnp.asarray(img), (8, 9)))
    theirs = cv2.resize(img, (9, 8), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, theirs, atol=0.6)


# cv2.resize((4, 3), INTER_LINEAR) of the deterministic input below,
# captured from a real cv2 4.x run — asserts unconditionally in
# environments without cv2.
_CV2_RESIZE_GOLDEN = np.array([
    [[75.841255, 83.151245, 90.46125],
     [103.253746, 110.56376, 117.87376],
     [130.66624, 137.97624, 145.28624],
     [158.07875, 165.38875, 172.69875]],
    [[80.691246, 88.00125, 95.31125],
     [108.103745, 115.41375, 122.72375],
     [135.51625, 142.82625, 150.13625],
     [162.92874, 170.23874, 177.54874]],
    [[85.54125, 92.85126, 100.161255],
     [112.95374, 120.26375, 127.57375],
     [140.36626, 147.67625, 154.98625],
     [167.77875, 175.08875, 109.19042]]], dtype=np.float32)


def test_resize_matches_cv2_golden():
    """Vendored cv2.resize golden values — always executes."""
    img = (np.arange(7 * 5 * 3, dtype=np.float64).reshape(7, 5, 3)
           * 7.31) % 251.0
    ours = np.asarray(imops.resize(jnp.asarray(img, dtype=jnp.float32),
                                   (3, 4)))
    np.testing.assert_allclose(ours, _CV2_RESIZE_GOLDEN, atol=0.02)


def test_affine_warp_matmul_matches_gather_oracle(rng):
    """The interpolation-matrix warp must reproduce the 4-tap gather
    bilinear exactly (same taps, same weights), rotation included."""
    k1, k2 = jax.random.split(rng)
    imgs = jax.random.uniform(k1, (3, 21, 17, 3)) * 255.0
    thetas = jnp.array([0.3, -0.7, 0.05])
    scales = jnp.array([0.8, 1.3, 1.0])
    c, s = jnp.cos(thetas) * scales, jnp.sin(thetas) * scales
    t = jax.random.uniform(k2, (3, 2), minval=-3.0, maxval=3.0)
    Ms = jnp.stack(
        [jnp.stack([c, -s, t[:, 0]], -1), jnp.stack([s, c, t[:, 1]], -1)],
        axis=1)
    for border in ("zero", "nearest"):
        got = imops.affine_warp_batch(imgs, Ms, (13, 19), border=border)
        want = jnp.stack([
            imops._affine_warp_gather(imgs[i], Ms[i], (13, 19), border=border)
            for i in range(3)])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-3)


def test_affine_warp_pallas_matches_gather_oracle(rng):
    """The Pallas TPU warp kernel (interpret mode here) must match the
    4-tap gather bilinear within its bf16 tap budget (<=~1 LSB on
    uint8-range pixels), rotation and both border modes included."""
    k1, k2 = jax.random.split(rng)
    imgs = jax.random.uniform(k1, (3, 21, 17, 3)) * 255.0
    thetas = jnp.array([0.3, -0.7, 0.05])
    scales = jnp.array([0.8, 1.3, 1.0])
    c, s = jnp.cos(thetas) * scales, jnp.sin(thetas) * scales
    t = jax.random.uniform(k2, (3, 2), minval=-3.0, maxval=3.0)
    Ms = jnp.stack(
        [jnp.stack([c, -s, t[:, 0]], -1), jnp.stack([s, c, t[:, 1]], -1)],
        axis=1)
    for border in ("zero", "nearest"):
        got = imops.affine_warp_batch_pallas(imgs, Ms, (13, 19),
                                             border=border, interpret=True)
        want = jnp.stack([
            imops._affine_warp_gather(imgs[i], Ms[i], (13, 19), border=border)
            for i in range(3)])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1.5)


@pytest.mark.slow
def test_affine_warp_pallas_xwindow_parity(rng):
    """The x-windowed path (112-wide output over a 160² source engages
    n_xb=2 lane windows, ops/image.py round 4) must match the einsum
    warp for realistic alignment transforms AND for extreme transforms
    that overflow the window (the per-block exact fallback)."""
    k1, _ = jax.random.split(rng)
    imgs = jax.random.uniform(k1, (2, 160, 160, 3)) * 255.0
    realistic = []
    for s, th, tx, ty in ((0.6, -0.2, -10.0, 4.0), (1.38, 0.25, 0.0, 7.0)):
        A = (1.0 / s) * np.array([[np.cos(th), -np.sin(th)],
                                  [np.sin(th), np.cos(th)]])
        realistic.append(np.hstack([A, np.array([[tx], [ty]])]))
    extreme = [
        np.array([[0.01, 0.0, 50.0], [0.0, 0.01, 50.0]]),   # tiny span
        np.array([[3.0, 0.5, 10.0], [-0.4, 2.5, 5.0]]),     # giant span
    ]
    for Ms in (realistic, extreme):
        Ms = jnp.asarray(np.stack(Ms), jnp.float32)
        want = imops.affine_warp_batch(imgs, Ms, (112, 112))
        for xb, xw in ((2, 0), (7, 2), (4, 2)):
            got = imops.affine_warp_batch_pallas(
                imgs, Ms, (112, 112), interpret=True, xblocks=xb, xwin=xw)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1.5,
                                       err_msg=f"xblocks={xb} xwin={xw}")


@pytest.mark.slow
def test_affine_warp_pallas_large_source_tile_shrink(rng):
    """The kernel's VMEM intermediates scale with the SOURCE image
    (wy: tp x H, rows: tp x W*C) — a large source must shrink the row
    tile, not blow VMEM.  At 500x600 the tile drops below the pure
    2048-px output bound; verify numerics are unchanged."""
    imgs = jax.random.uniform(rng, (1, 500, 600, 3)) * 255.0
    M = jnp.array([[[12.0, 0.0, 40.0], [0.0, 10.0, 30.0]]])
    got = imops.affine_warp_batch_pallas(imgs, M, (32, 32), interpret=True)
    want = imops._affine_warp_gather(imgs[0], M[0], (32, 32))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want),
                               atol=1.5)


def test_affine_warp_pallas_huge_source_falls_back():
    """Sources past ~10 MB (bf16 block) can't fit VMEM at any tile size;
    the pallas entry point must fall back to the XLA einsum path instead
    of failing to compile."""
    imgs = jnp.broadcast_to(
        jnp.arange(1400.0)[None, :, None, None], (1, 1400, 1300, 3))
    M = jnp.array([[[100.0, 0.0, 0.0], [0.0, 100.0, 0.0]]])
    got = imops.affine_warp_batch_pallas(imgs, M, (8, 8), interpret=True)
    want = imops.affine_warp_batch(imgs, M, (8, 8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_affine_warp_pallas_banded_tall_source(rng):
    """Sources taller than the band run the banded-K path: each output
    tile contracts only its own (scalar-prefetched) source-row band.
    A small band on a tall source exercises genuinely different per-tile
    offsets; mild rotation keeps every tile's tap span inside the band."""
    k1, k2 = jax.random.split(rng)
    imgs = jax.random.uniform(k1, (2, 60, 23, 3)) * 255.0
    thetas = jnp.array([0.08, -0.06])
    c, s = jnp.cos(thetas) * 1.7, jnp.sin(thetas) * 1.7
    t = jnp.array([[2.0, 1.0], [-1.0, 3.0]])
    Ms = jnp.stack(
        [jnp.stack([c, -s, t[:, 0]], -1), jnp.stack([s, c, t[:, 1]], -1)],
        axis=1)
    for border in ("zero", "nearest"):
        got = imops.affine_warp_batch_pallas(imgs, Ms, (32, 12),
                                             border=border, interpret=True,
                                             band=16)
        want = jnp.stack([
            imops._affine_warp_gather(imgs[i], Ms[i], (32, 12), border=border)
            for i in range(2)])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1.5)


def test_affine_warp_pallas_band_overflow_exact_fallback(rng):
    """A rotation whose tap span exceeds the band must NOT lose taps: the
    lax.cond falls back to a full-height band and stays exact."""
    imgs = jax.random.uniform(rng, (2, 60, 60, 3)) * 255.0
    theta = jnp.array([1.2, -1.1])  # ~68 deg: span >> 16-row band
    c, s = jnp.cos(theta) * 0.8, jnp.sin(theta) * 0.8
    Ms = jnp.stack(
        [jnp.stack([c, -s, jnp.array([30.0, 25.0])], -1),
         jnp.stack([s, c, jnp.array([20.0, 28.0])], -1)], axis=1)
    got = imops.affine_warp_batch_pallas(imgs, Ms, (24, 24), interpret=True,
                                         band=16)
    want = jnp.stack([
        imops._affine_warp_gather(imgs[i], Ms[i], (24, 24))
        for i in range(2)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1.5)


@pytest.mark.parametrize("c", [1, 2, 4])
def test_affine_warp_pallas_channel_counts(rng, c):
    """The native-layout kernel folds lanes->channels with per-slice
    matrices keyed on (s*128 + lane) mod c, so any small channel count
    works — including ones whose phase rotates across 128-lane slices
    (c=1 grayscale, c=2, c=4 RGBA)."""
    k1, k2 = jax.random.split(rng)
    imgs = jax.random.uniform(k1, (2, 37, 53, c)) * 255.0
    theta = jnp.array([0.2, -0.1])
    cs, sn = jnp.cos(theta), jnp.sin(theta)
    t = jax.random.uniform(k2, (2, 2), minval=-2.0, maxval=6.0)
    Ms = jnp.stack(
        [jnp.stack([cs, -sn, t[:, 0]], -1),
         jnp.stack([sn, cs, t[:, 1]], -1)], axis=1)
    got = imops.affine_warp_batch_pallas(imgs, Ms, (19, 23), interpret=True)
    want = jnp.stack([
        imops._affine_warp_gather(imgs[i], Ms[i], (19, 23))
        for i in range(2)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1.5)


def test_affine_warp_pallas_many_channels_fall_back(rng):
    """Channel counts past the fold-matrix budget (c > 8) take the XLA
    einsum path instead of failing to compile."""
    imgs = jax.random.uniform(rng, (1, 16, 15, 9)) * 255.0
    M = jnp.array([[[1.1, 0.0, 2.0], [0.0, 0.9, 1.0]]])
    got = imops.affine_warp_batch_pallas(imgs, M, (11, 12), interpret=True)
    want = imops.affine_warp_batch(imgs, M, (11, 12))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_affine_warp_correct_under_bf16_matmul_default(rng):
    """Regression: coordinate transforms must not flow through matmuls.

    On TPU the default matmul precision truncates operands to bf16
    mantissas; a `dst @ Ainv.T` coordinate transform then loses whole
    pixels (resolution 1.0 beyond magnitude 128), which showed up as
    ~116/255 pixel errors at 160x160 on chip.  Emulate that default here
    and require the warp to stay within the documented weight budget.
    """
    imgs = jax.random.uniform(rng, (2, 160, 160, 3)) * 255.0
    M = jnp.array([[[0.9, -0.2, 3.0], [0.2, 0.9, -1.0]]] * 2)
    want = imops.affine_warp_batch(imgs, M, (112, 112))
    with jax.default_matmul_precision("bfloat16"):
        got = imops.affine_warp_batch(imgs, M, (112, 112))
        oracle = imops._affine_warp_gather(imgs[0], M[0], (112, 112))
    assert float(jnp.max(jnp.abs(got - want))) < 2.0
    assert float(jnp.max(jnp.abs(oracle - want[0]))) < 2.0


def test_affine_warp_batch_bf16_close(rng):
    imgs = jax.random.uniform(rng, (2, 32, 32, 3)) * 255.0
    M = jnp.array([[[0.9, -0.2, 3.0], [0.2, 0.9, -1.0]]] * 2)
    f32 = imops.affine_warp_batch(imgs, M, (24, 24))
    bf16 = imops.affine_warp_batch(imgs, M, (24, 24),
                                   compute_dtype=jnp.bfloat16)
    assert float(jnp.max(jnp.abs(f32 - bf16))) < 1.5


def test_integer_image_outputs_round_not_truncate():
    """cv2's saturate_cast rounds; a bare astype truncates toward zero.
    A constant uint8 image through fractional-offset warps/crops must
    come back exactly — fp noise like 199.9999 must not become 199."""
    import numpy as np
    from alink_tpu.ops.image import (affine_warp_batch, crop_and_resize,
                                     affine_warp_batch_pallas)

    img = np.full((12, 12, 3), 200, np.uint8)
    M = jnp.asarray([[[1.0, 0.0, 0.75], [0.0, 1.0, 0.25]]])
    out = affine_warp_batch(jnp.asarray(img)[None], M, (8, 8))
    assert out.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(out)[0, 1:-1, 1:-1], 200)

    out = affine_warp_batch_pallas(jnp.asarray(img)[None], M, (8, 8),
                                   interpret=True)
    assert out.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(out)[0, 1:-1, 1:-1], 200)

    crops = crop_and_resize(jnp.asarray(img),
                            jnp.asarray([[1.25, 1.75, 9.0, 9.5]]), (6, 6))
    assert crops.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(crops), 200)
