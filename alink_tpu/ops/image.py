"""Batched image geometry ops (resize / affine warp / crop-resize).

These replace the OpenCV call sites in the reference (SURVEY.md section 2.3):

- ``resize``          — cv2.resize with INTER_LINEAR half-pixel sampling
  (committee.py:25, helper.py:152, readDFW.py:82, readMTP.py:116-119).
- ``affine_warp``     — cv2.warpAffine with a forward 2x3 matrix and zero
  border (face_preprocess.py:106, mtcnn_detector.py:655): output pixels
  sample the source at ``inv(M) @ (x, y, 1)`` with bilinear interpolation.
- ``crop_and_resize`` — the MTCNN pad-crop-resize idiom
  (mtcnn_detector.py:403-411, 437-445): integer box crop with zero padding
  outside the image, bilinear-resized to a fixed stage size — expressed as
  one gather-based sampling kernel, vmapped over a padded box budget.

All functions are shape-static and batch-first (vmap/jit friendly).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def resize(images: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC) images to ``size = (h, w)``."""
    single = images.ndim == 3
    if single:
        images = images[None]
    # antialias=False matches cv2.INTER_LINEAR on downscale (cv2 does not
    # low-pass filter; jax.image.resize does by default).
    out = jax.image.resize(
        images,
        (images.shape[0], size[0], size[1], images.shape[3]),
        method="bilinear",
        antialias=False,
    )
    return out[0] if single else out


def _bilinear_sample(
    img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray, border: str = "zero"
) -> jnp.ndarray:
    """Sample HWC ``img`` at float coords (ys, xs).

    ``border="zero"`` matches cv2 borderValue=0 (face_preprocess.py:106);
    ``border="nearest"`` clamps to the edge pixel like the keras
    fill_mode='nearest' used by the reference augmentation
    (code/helpers.py:127-138).
    """
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        if border == "nearest":
            return v
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        return jnp.where(inside[..., None], v, 0.0)

    top = tap(y0i, x0i) * (1 - wx) + tap(y0i, x0i + 1) * wx
    bot = tap(y0i + 1, x0i) * (1 - wx) + tap(y0i + 1, x0i + 1) * wx
    return top * (1 - wy) + bot * wy


def _affine_warp_gather(
    img: jnp.ndarray, M: jnp.ndarray, out_size: tuple[int, int],
    border: str = "zero",
) -> jnp.ndarray:
    """Gather-based reference warp (kept as the numerics oracle for tests;
    per-tap gathers are slow on TPU — the production path is the
    interpolation-matrix formulation in ``affine_warp_batch``)."""
    out_h, out_w = out_size
    A = M[:, :2]
    b = M[:, 2]
    Ainv = jnp.linalg.inv(A)
    ys, xs = jnp.meshgrid(
        jnp.arange(out_h, dtype=jnp.float32),
        jnp.arange(out_w, dtype=jnp.float32),
        indexing="ij",
    )
    # Elementwise coordinate transform, NOT `dst @ Ainv.T`: on TPU a matmul
    # runs with bf16 operand mantissas by default, which truncates pixel
    # coordinates (resolution 1.0 beyond magnitude 128!) into half-pixel
    # sampling errors.  Weights may be low-precision; coordinates may not.
    rx = xs - b[0]
    ry = ys - b[1]
    src_x = Ainv[0, 0] * rx + Ainv[0, 1] * ry
    src_y = Ainv[1, 0] * rx + Ainv[1, 1] * ry
    return _bilinear_sample(img, src_y, src_x, border=border)


def affine_warp_batch(
    imgs: jnp.ndarray,
    Ms: jnp.ndarray,
    out_size: tuple[int, int],
    border: str = "zero",
    compute_dtype=None,
    precision=None,
) -> jnp.ndarray:
    """Warp a batch of HWC images by forward 2x3 affines (cv2 semantics).

    Replaces the reference's per-face ``cv2.warpAffine`` loop
    (mtcnn_detector.py:606-656, face_preprocess.py:106).  Output pixel
    (x, y) samples the source at ``inv(M) @ (x, y, 1)`` with bilinear
    interpolation; ``border="zero"`` = borderValue=0, ``border="nearest"``
    = edge clamp.

    TPU formulation: a bilinear tap weight factorises per axis even under
    rotation — weight(h, w) = tri(Y - h) * tri(X - w) with
    tri(d) = max(0, 1 - |d|) — so the whole warp is two MXU contractions
    per image (sum over source rows, then source cols) instead of 4
    per-pixel gathers.  Out-of-image taps get zero weight, which IS the
    zero border; clamping the source coords first reproduces the nearest
    border.  Output rows are processed in `lax.scan` blocks so the
    (block, W, C) intermediate stays well inside HBM working-set limits.

    ``compute_dtype=jnp.bfloat16`` runs the contractions on the bf16 MXU
    path (f32 accumulation); weights are exact to ~2^-8, i.e. <=0.5 LSB on
    uint8-range pixels.

    Precision: on TPU the default matmul precision feeds the MXU bf16
    mantissas, giving <=1 LSB error on uint8-range pixels — comparable to
    cv2.warpAffine itself, which interpolates with 5-bit fixed-point
    weights (INTER_BITS=5, granularity 1/32).  Pass
    ``precision=jax.lax.Precision.HIGHEST`` for exact f32 taps.
    """
    n, h, w, _ = imgs.shape
    out_h, out_w = out_size
    cdt = compute_dtype or (imgs.dtype if imgs.dtype in (jnp.bfloat16,)
                            else jnp.float32)

    Ainv = jnp.linalg.inv(Ms[:, :, :2].astype(jnp.float32))  # (n, 2, 2)
    bvec = Ms[:, :, 2].astype(jnp.float32)                   # (n, 2) (bx, by)

    # Row-block size: keep the (n, R*out_w, W, C) intermediate ~<=128 MB.
    budget = 128 * 1024 * 1024 // max(
        1, n * out_w * w * imgs.shape[3] * jnp.dtype(cdt).itemsize)
    row_block = max(1, min(out_h, budget))
    n_blocks = -(-out_h // row_block)
    pad_h = n_blocks * row_block

    img_flat = imgs.reshape(n, h, w * imgs.shape[3]).astype(cdt)
    h_idx = jnp.arange(h, dtype=jnp.float32)
    w_idx = jnp.arange(w, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)

    def block(carry, y0):
        ys = y0 + jnp.arange(row_block, dtype=jnp.float32)
        # dst grid (R, out_w, 2) in (x, y); src = Ainv @ (dst - b)
        dst = jnp.stack(
            [jnp.broadcast_to(xs[None, :], (row_block, out_w)),
             jnp.broadcast_to(ys[:, None], (row_block, out_w))], axis=-1)
        rel = dst[None] - bvec[:, None, None, :]             # (n, R, ow, 2)
        # Elementwise 2x2 apply (see _affine_warp_gather): an einsum here
        # would truncate coordinates to bf16 mantissas on the TPU MXU.
        X = (Ainv[:, None, None, 0, 0] * rel[..., 0]
             + Ainv[:, None, None, 0, 1] * rel[..., 1])
        Y = (Ainv[:, None, None, 1, 0] * rel[..., 0]
             + Ainv[:, None, None, 1, 1] * rel[..., 1])
        if border == "nearest":
            X = jnp.clip(X, 0.0, w - 1.0)
            Y = jnp.clip(Y, 0.0, h - 1.0)
        P = row_block * out_w
        Y = Y.reshape(n, P)
        X = X.reshape(n, P)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(Y[..., None] - h_idx))  # (n,P,H)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(X[..., None] - w_idx))  # (n,P,W)
        rows = jnp.einsum("nph,nhd->npd", wy.astype(cdt), img_flat,
                          preferred_element_type=jnp.float32,
                          precision=precision)
        rows = rows.reshape(n, P, w, imgs.shape[3])          # (n, P, W, C)
        out = jnp.einsum("npw,npwc->npc", wx, rows.astype(jnp.float32))
        return carry, out.reshape(n, row_block, out_w, imgs.shape[3])

    _, blocks = jax.lax.scan(
        block, None, jnp.arange(n_blocks, dtype=jnp.float32) * row_block)
    out = jnp.moveaxis(blocks, 0, 1).reshape(n, pad_h, out_w, imgs.shape[3])
    return out[:, :out_h].astype(imgs.dtype)


def _warp_kernel(scal_ref, img_ref, seg_ref, out_ref, *, out_w: int,
                 rows_per_tile: int, h: int, w: int, c: int, border: str,
                 cdt):
    """Pallas body: warp one (rows_per_tile, out_w) output tile of image n.

    The tap-weight matrices never touch HBM — they are built in VMEM from
    broadcasted iotas against the tile's source coordinates, so the only
    HBM traffic is the source image (DMA'd once per image: the grid runs
    tiles innermost and Mosaic keeps a block whose index didn't change)
    and the output tile.  The H contraction is one MXU matmul; the W
    contraction multiplies per-pixel column weights into the row-slab and
    folds channels out with a static 0/1 segment matrix (second matmul).
    """
    i = pl.program_id(0)
    t = pl.program_id(1)
    tp = rows_per_tile * out_w

    a00 = scal_ref[i, 0]
    a01 = scal_ref[i, 1]
    a10 = scal_ref[i, 2]
    a11 = scal_ref[i, 3]
    bx = scal_ref[i, 4]
    by = scal_ref[i, 5]

    p = t * tp + jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    y = (p // out_w).astype(jnp.float32)
    x = (p % out_w).astype(jnp.float32)
    X = a00 * (x - bx) + a01 * (y - by)  # (tp, 1) source coords
    Y = a10 * (x - bx) + a11 * (y - by)
    if border == "nearest":
        X = jnp.clip(X, 0.0, w - 1.0)
        Y = jnp.clip(Y, 0.0, h - 1.0)

    h_idx = jax.lax.broadcasted_iota(jnp.int32, (tp, h), 1
                                     ).astype(jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(Y - h_idx))           # (tp, H)
    rows = jnp.dot(wy.astype(cdt), img_ref[0],
                   preferred_element_type=jnp.float32)        # (tp, W*C)
    wc_idx = (jax.lax.broadcasted_iota(jnp.int32, (tp, w * c), 1)
              // c).astype(jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(X - wc_idx))          # (tp, W*C)
    out_ref[0] = jnp.dot((rows * wx).astype(cdt), seg_ref[:],
                         preferred_element_type=jnp.float32)  # (tp, C)


@partial(jax.jit,
         static_argnames=("out_size", "border", "interpret"))
def affine_warp_batch_pallas(
    imgs: jnp.ndarray,
    Ms: jnp.ndarray,
    out_size: tuple[int, int],
    border: str = "zero",
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas TPU warp: same numerics contract as ``affine_warp_batch``.

    The einsum formulation above materialises (N, P, H) / (N, P, W*C)
    weight and row tensors in HBM — gigabytes of traffic for a 64-image
    alignment batch (measured 7.3 ms).  Here those live only in VMEM a
    tile at a time, so HBM traffic collapses to (read image + write chips)
    and the cost is the MXU contraction itself.

    Weights/taps are contracted in bfloat16 with f32 accumulation —
    tap weights are exact to ~2^-8, i.e. <=1 LSB on uint8-range pixels,
    same budget as cv2.warpAffine's 5-bit fixed-point taps and as the
    einsum path under default TPU matmul precision.
    """
    n, h, w, c = imgs.shape
    out_h, out_w = out_size
    cdt = jnp.bfloat16

    # The VMEM intermediates scale with the SOURCE image (wy: tp x H,
    # rows: tp x W*C, f32 + a bf16 cast each), and the source block
    # itself is DMA'd whole (h x w*c bf16).  Past ~1300^2 RGB the image
    # block alone exhausts VMEM — fall back to the XLA einsum path
    # (same numerics contract) rather than fail to compile.
    if h * w * c * 2 > 10 << 20:
        return affine_warp_batch(imgs, Ms, out_size, border=border)

    Ainv = jnp.linalg.inv(Ms[:, :, :2].astype(jnp.float32))
    scal = jnp.concatenate(
        [Ainv.reshape(n, 4), Ms[:, :, 2].astype(jnp.float32)], axis=1)

    # Tile sizing: <=2048 output pixels AND the source-scaled
    # intermediates within ~8 MB (tp * (H + W*C) * 6 bytes), so large
    # source frames shrink the tile instead of blowing VMEM.
    bytes_per_px = (h + w * c) * 6
    tile_px = max(out_w, min(2048, (8 << 20) // max(1, bytes_per_px)))
    rows_per_tile = max(1, min(out_h, tile_px // out_w))
    n_tiles = -(-out_h // rows_per_tile)
    tp = rows_per_tile * out_w

    seg = (jax.lax.broadcasted_iota(jnp.int32, (w * c, c), 0) % c
           == jax.lax.broadcasted_iota(jnp.int32, (w * c, c), 1)
           ).astype(cdt)

    out = pl.pallas_call(
        partial(_warp_kernel, out_w=out_w, rows_per_tile=rows_per_tile,
                h=h, w=w, c=c, border=border, cdt=cdt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # per-image Ainv/b scalars, whole in SMEM
            grid=(n, n_tiles),
            in_specs=[
                pl.BlockSpec((1, h, w * c), lambda i, t, scal: (i, 0, 0)),
                pl.BlockSpec((w * c, c), lambda i, t, scal: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, tp, c),
                                   lambda i, t, scal: (i, t, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * tp, c), jnp.float32),
        interpret=interpret,
    )(scal, imgs.reshape(n, h, w * c).astype(cdt), seg)
    return out[:, : out_h * out_w].reshape(
        n, out_h, out_w, c).astype(imgs.dtype)


def affine_warp(
    img: jnp.ndarray, M: jnp.ndarray, out_size: tuple[int, int],
    border: str = "zero",
) -> jnp.ndarray:
    """Single-image ``affine_warp_batch`` (cv2.warpAffine equivalent)."""
    return affine_warp_batch(img[None], M[None], out_size, border=border)[0]


def crop_and_resize(
    img: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: tuple[int, int],
    compute_dtype=None,
) -> jnp.ndarray:
    """Crop integer boxes [x1, y1, x2, y2] (inclusive, reference convention
    width = x2 - x1 + 1) from one HWC image and resize each to ``out_size``.

    Matches the MTCNN pad-crop-resize (mtcnn_detector.py:403-411): regions
    outside the image contribute zeros.  ``boxes``: (K, 4) float; output
    (K, out_h, out_w, C).  Uses cv2-style half-pixel sample grids so the
    result equals "zero-pad crop then cv2.resize(INTER_LINEAR)".

    TPU formulation: crop+scale is axis-separable, so each box becomes two
    bilinear interpolation matrices (rows: (out_h, H), cols: (out_w, W),
    weights ``max(0, 1 - |src - idx|)`` — zero outside the image, which IS
    the zero border) contracted on the MXU instead of per-tap gathers.
    """
    out_h, out_w = out_size
    h, w = img.shape[0], img.shape[1]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    sx = (x2 - x1 + 1.0) / out_w
    sy = (y2 - y1 + 1.0) / out_h
    src_y = ((jnp.arange(out_h, dtype=jnp.float32)[None, :] + 0.5)
             * sy[:, None] - 0.5 + y1[:, None])           # (K, out_h)
    src_x = ((jnp.arange(out_w, dtype=jnp.float32)[None, :] + 0.5)
             * sx[:, None] - 0.5 + x1[:, None])           # (K, out_w)
    wy = jnp.maximum(
        0.0, 1.0 - jnp.abs(src_y[:, :, None]
                           - jnp.arange(h, dtype=jnp.float32)))  # (K,oh,H)
    wx = jnp.maximum(
        0.0, 1.0 - jnp.abs(src_x[:, :, None]
                           - jnp.arange(w, dtype=jnp.float32)))  # (K,ow,W)
    # ``compute_dtype=bfloat16`` halves the HBM traffic of the weight and
    # row intermediates; tap weights are exact to ~2^-8, i.e. <=1 LSB on
    # uint8-range pixels — the budget the cascade's conv stages already
    # accept.  The coordinates above stay f32 (never through a matmul).
    cdt = compute_dtype or jnp.float32
    rows = jnp.einsum("koh,hwc->kowc", wy.astype(cdt), img.astype(cdt),
                      preferred_element_type=jnp.float32)
    return jnp.einsum("kpw,kowc->kopc", wx.astype(cdt), rows.astype(cdt),
                      preferred_element_type=jnp.float32).astype(img.dtype)
