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


def _cast_like(out: jnp.ndarray, dtype) -> jnp.ndarray:
    """Cast a float interpolation result back to the input dtype.

    Integer images round first (cv2's saturate_cast rounds; a bare
    astype truncates toward zero, a systematic ~0.5 LSB downward bias
    that would double the documented <=1 LSB-vs-cv2 budget)."""
    if jnp.issubdtype(jnp.dtype(dtype), jnp.integer):
        info = jnp.iinfo(jnp.dtype(dtype))
        out = jnp.clip(jnp.round(out), info.min, info.max)
    return out.astype(dtype)


def _inv2x2(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (..., 2, 2) matrices (adjugate / det).

    ``jnp.linalg.inv`` lowers to an LU custom lowering whose while-loops
    cost ~ms on TPU for a batch of these tiny matrices; the adjugate is
    four elementwise ops and stays off the bf16 matmul path entirely
    (these hold pixel-coordinate transforms).
    """
    a = A[..., 0, 0]
    b = A[..., 0, 1]
    c = A[..., 1, 0]
    d = A[..., 1, 1]
    det = a * d - b * c
    inv = jnp.stack([jnp.stack([d, -b], axis=-1),
                     jnp.stack([-c, a], axis=-1)], axis=-2)
    return inv / det[..., None, None]


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
    Ainv = _inv2x2(A)
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
    interp: str = "linear",
) -> jnp.ndarray:
    """Warp a batch of HWC images by forward 2x3 affines (cv2 semantics).

    ``interp="nearest"`` rounds sample coordinates to the nearest source
    pixel (scipy.ndimage order=0 semantics, round-half-up) — the
    interpolation old Keras augmentation used (ops/augment.py).

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

    Ainv = _inv2x2(Ms[:, :, :2].astype(jnp.float32))  # (n, 2, 2)
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
        if interp == "nearest":
            # ndimage order-0: round-half-up to the nearest grid point
            # (a rounded coordinate makes the tent weights one-hot).
            X = jnp.floor(X + 0.5)
            Y = jnp.floor(Y + 0.5)
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
    return _cast_like(out[:, :out_h], imgs.dtype)


def _warp_kernel(scal_ref, ylo_ref, xlo_ref, img_ref, out_ref, *,
                 out_w: int, rows_per_tile: int, band: int, wcn: int,
                 c: int, cpad: int, h: int, h_pad: int, w: int,
                 border: str, n_xb: int = 1, xwin: int = 0):
    """Pallas body: warp one (rows_per_tile, out_w) output tile of image i.

    The image block (1, h, wcn) holds the source in its NATIVE lane
    order — lane ``l`` is pixel ``x = l // c``, channel ``l % c`` (w*c
    lanes zero-padded to a 128-multiple) — and stays f32: the band slice
    is cast to bf16 in VMEM per step (~65K elements, negligible), so the
    wrapper needs NO relayout prep at all.  (The previous kernel required
    a bf16 channel-interleave 3->4 pad — a lane-granularity relayout that
    cost ~0.5 ms/64 per batch in the pipeline — and its power-of-two
    channel pad inflated the lane count 640 vs 512 for 160x160x3.)

    The block's index depends only on the outer grid axis, so Mosaic
    keeps it resident across the inner tile steps and double-buffers the
    next image's fetch behind compute.  (A manual per-tile HBM->VMEM DMA
    of just the band measured 4x SLOWER — 12.6 vs 3.0 ms/64 — because an
    in-kernel dma.wait() serialises memory behind every grid step.)

    Banded-K formulation (``band < h``): the H contraction of tile t only
    touches ``band`` consecutive source rows (the tile's bilinear tap
    span, located by the scalar-prefetched 8-aligned offset
    ``ylo_ref[i, t]`` — ``pl.multiple_of`` carries the alignment proof
    Mosaic needs for the dynamic sublane slice).  With band=128 the MXU
    matmul runs at K=128 with zero K-padding, vs K=h rounded up (h=160
    pads to 256: 2x wasted FLOPs).  A tile whose tap span exceeds the
    band (very large rotation/downscale) is handled EXACTLY by a
    ``pl.when``-predicated full-height contraction for just that tile —
    per-tile predication on the scalar core, because an XLA-level
    ``lax.cond`` between two whole pallas programs measured ~6 ms of
    pure branch overhead (9.1 vs 2.9 ms/64 for the identical program
    unconditioned).

    The W contraction avoids the N=C lane-pad disaster (C=3 pads to 128:
    a 42x-padded (tp, W*C)@(W*C, C) matmul) by folding lanes->channels
    per 128-lane slice: per-pixel column weights (from the slice's
    lane->x map ``(s*128 + l) // c``) multiply into the slice, and a
    per-slice 0/1 fold matrix (from the lane->channel map
    ``(s*128 + l) % c``) contracts its 128 lanes to ``cpad`` output
    channels on the MXU.  Per-slice folds handle the channel-phase
    rotation of 128 % c != 0, which is what frees the input from the
    power-of-two channel pad.

    Tap weights are built in VMEM from broadcasted iotas — they never
    touch HBM.

    X-windowing (round 4, ``n_xb > 1``): the output row tile is split
    into ``n_xb`` column blocks, and each block contracts only the
    ``xwin`` consecutive 128-lane source slices its bilinear taps can
    touch, located by the scalar-prefetched 128-aligned lane offset
    ``xlo_ref[i, tb]`` — the same banding idea as the rows, applied to
    the lane dim (Mosaic supports the dynamic minor-dim slice at
    128-multiples; benchmarks/exp_dyn_lane_slice.py).  A block whose
    tap lanes do not fit the window (xlo = -1) is overwritten by the
    same exact full fallback as a row-band overflow.
    """
    i = pl.program_id(0)
    tb = pl.program_id(1)
    if n_xb == 1:
        t = tb
        bw = out_w
    else:
        t = tb // n_xb
        bw = out_w // n_xb
    tp = rows_per_tile * bw

    a00 = scal_ref[i, 0]
    a01 = scal_ref[i, 1]
    a10 = scal_ref[i, 2]
    a11 = scal_ref[i, 3]
    bx = scal_ref[i, 4]
    by = scal_ref[i, 5]

    # TRANSPOSED orientation (round 3): output pixels live in LANES and
    # channels in SUBLANES, so the out block is (cpad, tp) and the out
    # array (n, cpad, n_blocks·tp) — physical layout == logical bytes.
    # The previous (tp, cpad) orientation put cpad=8 in the minor dim,
    # which HBM tiling T(8, 128) pads to 128 lanes: the output store
    # alone measured 1.11 ms/64 vs 0.034 ms for the same logical bytes
    # lane-packed (benchmarks/exp_pack_probe.py) — ~half the kernel's
    # total runtime was writing padding.
    p = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1)
    y = (t * rows_per_tile + p // bw).astype(jnp.float32)
    if n_xb == 1:
        x = (p % bw).astype(jnp.float32)
    else:
        x = ((tb % n_xb) * bw + p % bw).astype(jnp.float32)
    X = a00 * (x - bx) + a01 * (y - by)  # (1, tp) source coords
    Y = a10 * (x - bx) + a11 * (y - by)
    if border == "nearest":
        X = jnp.clip(X, 0.0, w - 1.0)
        Y = jnp.clip(Y, 0.0, h - 1.0)

    sub = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)       # hoisted
    lmap = jax.lax.broadcasted_iota(jnp.int32, (cpad, 128), 1)
    cmap = jax.lax.broadcasted_iota(jnp.int32, (cpad, 128), 0)

    def accum_chunk(acc, y0, lane0=None):
        """Add one K=``band`` H-contraction chunk at row offset ``y0``.

        Per 128-lane slice s of the source:  rowsT = img_sᵀ @ wyᵀ is the
        transposed H-dot ((128, band) @ (band, tp) — the (band, 128)
        slice transpose is a VMEM-local shuffle Mosaic lowers exactly);
        per-pixel column weights multiply in, and the per-slice 0/1 fold
        contracts source lanes → cpad output channels with the OUTPUT
        pixel staying in lanes: acc += fold_sᵀ (cpad, 128) @ z (128, tp).
        Same FLOPs as the untransposed form; zero-pad rows of the image
        block contribute exactly 0 (taps at rows ≥ h only ever carry
        weight when the zero-border semantics want 0 anyway).

        ``lane0 = None``: contract every static 128-lane slice.
        Otherwise contract the ``xwin`` slices starting at the traced
        128-aligned lane offset ``lane0``.
        """
        row = (y0 + jax.lax.broadcasted_iota(jnp.int32, (band, tp), 0)
               ).astype(jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(Y - row)
                         ).astype(jnp.bfloat16)                  # (band, tp)
        n_s = wcn // 128 if lane0 is None else xwin
        for s in range(n_s):
            if lane0 is None:
                base = s * 128
                img_s = img_ref[0, pl.ds(y0, band), base:base + 128]
                gl = sub + base                                  # (128, 1)
                fold_s = ((lmap + base) % c == cmap
                          ).astype(jnp.bfloat16)                 # (cpad, 128)
            else:
                base = pl.multiple_of(lane0 + s * 128, 128)
                img_s = img_ref[0, pl.ds(y0, band), pl.ds(base, 128)]
                gl = sub + base
                fold_s = ((lmap + base) % c == cmap).astype(jnp.bfloat16)
            rowsT = jnp.dot(img_s.astype(jnp.bfloat16).T, wy,
                            preferred_element_type=jnp.float32)  # (128, tp)
            xmap = (gl // c).astype(jnp.float32)
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(X - xmap))       # (128, tp)
            z = (rowsT * wx).astype(jnp.bfloat16)
            acc = acc + jnp.dot(fold_s, z,
                                preferred_element_type=jnp.float32)
        return acc                                               # (cpad, tp)

    zero = jnp.zeros((cpad, tp), jnp.float32)

    def full_tile():
        # Exact fallback: contract every ``band`` chunk of the padded
        # height over every static lane slice (disjoint offsets, so
        # taps are counted once).
        acc = zero
        for k in range(h_pad // band):
            acc = accum_chunk(acc, k * band)
        out_ref[0] = acc

    banded_y = band < h
    y_lo_raw = ylo_ref[i, t] if banded_y else jnp.int32(0)
    # _band_offsets aligns down to 8; Mosaic needs the proof.
    y_lo = pl.multiple_of(jnp.maximum(y_lo_raw, 0), 8)
    if n_xb > 1:
        x_lo_raw = xlo_ref[i, tb]
        x_lo = pl.multiple_of(jnp.maximum(x_lo_raw, 0), 128)
        # Common path: banded rows AND windowed lanes, unconditionally
        # (garbage for overflow blocks); the rare overflow block is
        # overwritten by the pl.when full pass — only the never-taken
        # branch may be predicated (BENCHMARKS.md round-2: predicating
        # the common path broke Mosaic's pipelining, +0.9 ms/64).
        out_ref[0] = accum_chunk(zero, y_lo, x_lo)
        pl.when((y_lo_raw < 0) | (x_lo_raw < 0))(full_tile)
    elif banded_y:
        out_ref[0] = accum_chunk(zero, y_lo)
        pl.when(y_lo_raw < 0)(full_tile)
    else:
        full_tile()


def _banded_warp_call(imgsn, scal, ylo, xlo, out_size, band, rows_per_tile,
                      h, w, c, cpad, border, interpret, n_xb=1, xwin=0):
    """One pallas_call of the warp kernel (banded iff ``band < h``).

    ``imgsn``: (n, h_pad, wcn) f32, lane l = x*c + ch, zero-padded to a
    128-multiple of lanes AND to ``h_pad`` = band-multiple rows (the
    zero rows contribute exactly 0 to the contraction — see
    ``_warp_kernel``).  ``ylo``: (n, n_tiles) int32 8-aligned band
    offsets with 0 <= ylo <= h - band (ignored when band == h).
    ``xlo``: (n, n_tiles·n_xb) int32 128-aligned lane-window offsets,
    -1 = overflow (ignored when n_xb == 1).

    Output is TRANSPOSED: (n, cpad, n_blocks·tp) — output pixels in the
    128-lane dim, channels in sublanes — so the HBM store is lane-packed
    instead of T(8, 128)-padding an 8-lane minor dim 16x
    (benchmarks/exp_pack_probe.py: 1.11 vs 0.034 ms/64 for identical
    logical bytes).
    """
    n, h_pad, wcn = imgsn.shape
    out_h, out_w = out_size
    n_tiles = -(-out_h // rows_per_tile)
    n_blocks = n_tiles * n_xb
    tp = rows_per_tile * out_w // n_xb

    out = pl.pallas_call(
        partial(_warp_kernel, out_w=out_w, rows_per_tile=rows_per_tile,
                band=band, wcn=wcn, c=c, cpad=cpad, h=h, h_pad=h_pad,
                w=w, border=border, n_xb=n_xb, xwin=xwin),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # per-image Ainv/b + band rows + lanes
            grid=(n, n_blocks),
            in_specs=[pl.BlockSpec((1, h_pad, wcn),
                                   lambda i, t, scal, ylo, xlo: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, cpad, tp),
                                   lambda i, t, scal, ylo, xlo: (i, 0, t)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, cpad, n_blocks * tp), jnp.float32),
        interpret=interpret,
    )(scal, ylo, xlo, imgsn)
    return out


def _band_offsets(Ainv, bvec, out_size, rows_per_tile, band, h, border):
    """Per-(image, tile) 8-aligned source-row band offsets, -1 = overflow.

    The bilinear taps of output tile t cover source rows
    [floor(Ymin), floor(Ymax)+1] where Y is linear in (x, y), so its
    extrema sit at the tile's corners.  A tile whose in-image tap rows
    do not fit inside [ylo, ylo + band) gets offset -1 — the kernel
    runs that tile with a full-height contraction (exactness is never
    sacrificed to the banding).
    """
    out_h, out_w = out_size
    n_tiles = -(-out_h // rows_per_tile)
    ts = jnp.arange(n_tiles, dtype=jnp.float32) * rows_per_tile
    ys = jnp.stack([ts, ts + rows_per_tile - 1.0], -1)        # (T, 2)
    xs = jnp.array([0.0, out_w - 1.0], jnp.float32)
    a10 = Ainv[:, 1, 0][:, None, None, None]
    a11 = Ainv[:, 1, 1][:, None, None, None]
    bx = bvec[:, 0][:, None, None, None]
    by = bvec[:, 1][:, None, None, None]
    Yc = (a10 * (xs[None, None, None, :] - bx)
          + a11 * (ys[None, :, :, None] - by))                # (n, T, 2, 2)
    if border == "nearest":
        Yc = jnp.clip(Yc, 0.0, h - 1.0)
    Ymin = jnp.floor(jnp.min(Yc, axis=(2, 3)))
    Ymax = jnp.floor(jnp.max(Yc, axis=(2, 3))) + 1.0
    ylo = jnp.clip(Ymin, 0.0, float(h - band)).astype(jnp.int32)
    ylo = (ylo // 8) * 8  # 8-aligned slice offsets; align-down only widens
    rmax = jnp.minimum(Ymax, float(h - 1))
    fits = rmax - ylo.astype(jnp.float32) <= band - 1
    return jnp.where(fits, ylo, -1)


def _xband_offsets(Ainv, bvec, out_size, rows_per_tile, n_xb, xwin,
                   w, c, wcn, border):
    """Per-(image, row-tile, x-block) 128-aligned lane-window offsets,
    -1 = the block's tap lanes exceed the ``xwin``-slice window.

    X is linear in (x, y), so its extrema over a block sit at the block
    corners.  Tap columns cover [floor(Xmin), floor(Xmax)+1] clamped to
    the image (out-of-image taps carry zero weight and need no lanes);
    lanes cover [c*colmin, c*colmax + c - 1].
    """
    out_h, out_w = out_size
    n_tiles = -(-out_h // rows_per_tile)
    bw = out_w // n_xb
    ts = jnp.arange(n_tiles, dtype=jnp.float32) * rows_per_tile
    ys = jnp.stack([ts, ts + rows_per_tile - 1.0], -1)        # (T, 2)
    x0 = jnp.arange(n_xb, dtype=jnp.float32) * bw
    xs = jnp.stack([x0, x0 + bw - 1.0], -1)                   # (B, 2)
    a00 = Ainv[:, 0, 0][:, None, None, None, None]
    a01 = Ainv[:, 0, 1][:, None, None, None, None]
    bx = bvec[:, 0][:, None, None, None, None]
    by = bvec[:, 1][:, None, None, None, None]
    # (n, T, B, 2, 2): X at the four corners of every block.
    Xc = (a00 * (xs[None, None, :, :, None] - bx)
          + a01 * (ys[None, :, None, None, :] - by))
    if border == "nearest":
        Xc = jnp.clip(Xc, 0.0, w - 1.0)
    cmin = jnp.clip(jnp.floor(jnp.min(Xc, axis=(3, 4))), 0.0, float(w - 1))
    cmax = jnp.clip(jnp.floor(jnp.max(Xc, axis=(3, 4))) + 1.0, 0.0,
                    float(w - 1))
    lmin = cmin * c
    lmax = cmax * c + (c - 1)
    xlo = jnp.clip((lmin // 128) * 128, 0.0, float(wcn - xwin * 128))
    fits = lmax <= xlo + xwin * 128 - 1
    return jnp.where(fits, xlo, -1.0).astype(jnp.int32).reshape(
        Ainv.shape[0], n_tiles * n_xb)


@partial(jax.jit,
         static_argnames=("out_size", "border", "interpret", "band",
                          "xblocks", "xwin"))
def affine_warp_batch_pallas(
    imgs: jnp.ndarray,
    Ms: jnp.ndarray,
    out_size: tuple[int, int],
    border: str = "zero",
    interpret: bool = False,
    band: int = 128,
    xblocks: int = 0,
    xwin: int = 0,
) -> jnp.ndarray:
    """Pallas TPU warp: same numerics contract as ``affine_warp_batch``.

    The einsum formulation above materialises (N, P, H) / (N, P, W*C)
    weight and row tensors in HBM — gigabytes of traffic for a 64-image
    alignment batch (measured 7.3 ms).  Here those live only in VMEM a
    tile at a time, so HBM traffic collapses to (read image + write
    chips) and the cost is the contraction itself — banded to K=``band``
    source rows per output tile (see ``_warp_kernel``), which for
    face-alignment transforms cuts the H matmul to its pad-free
    minimum.  If any tile's tap span exceeds the band (very large
    rotations / downscales), a per-tile ``pl.when`` reruns that tile
    with a full-height band, so results are exact for every transform.

    The source enters the kernel in its native (h, w*c) lane order and
    native f32 — no relayout prep (see ``_warp_kernel``).

    Weights/taps are contracted in bfloat16 with f32 accumulation —
    tap weights are exact to ~2^-8, i.e. <=1 LSB on uint8-range pixels,
    same budget as cv2.warpAffine's 5-bit fixed-point taps and as the
    einsum path under default TPU matmul precision.
    """
    n, h, w, c = imgs.shape
    out_h, out_w = out_size

    wcn = -(-(w * c) // 128) * 128
    banded = h > band
    band_eff = band if banded else h
    h_blk = -(-h // band_eff) * band_eff  # kernel block rows (band-padded)

    # VMEM plan: the double-buffered f32 image block plus the per-tile
    # intermediates (wy bf16: 2*band B/px, rows f32: 4*wcn B/px, wx/z
    # temporaries ~1 KB/px) must fit the ~16 MB scoped budget.  Large
    # sources shrink the row tile; sources whose block alone blows the
    # budget fall back to the XLA einsum path (same numerics contract)
    # rather than fail to compile.
    img_bytes = 2 * h_blk * wcn * 4
    per_px = 2 * band_eff + 4 * wcn + 1056
    if c > 8 or img_bytes + out_w * per_px > 13 << 20:
        return affine_warp_batch(imgs, Ms, out_size, border=border)
    tile_px = max(out_w, min(2048, ((13 << 20) - img_bytes) // per_px))
    rows_per_tile = max(1, min(out_h, tile_px // out_w))
    # Snap down to a divisor of out_h when that keeps >=half the tile:
    # e.g. out_h=112 snaps 18 -> 16 (7 exact tiles), avoiding the 12.5%
    # of output rows the ceil-tiling would compute and store as waste.
    for d in range(rows_per_tile, 0, -1):
        if out_h % d == 0:
            if 2 * d >= rows_per_tile:
                rows_per_tile = d
            break

    # Lane-window option (round 4, generalised round 5): split each row
    # tile into ``xblocks`` column blocks and contract only the
    # ``xwin``-slice window the block's taps touch (see _warp_kernel) —
    # the lane-dim analogue of the row band.  Round 4 hardcoded
    # xwin = total_slices - 1 (only ever skipping ONE slice), which at
    # xblocks=2 measured a wash (benchmarks/exp_warp_xwin.py: the 25%
    # slice skip lost to the doubled grid).  ``xwin`` is now explicit:
    # narrow column blocks (e.g. xblocks=7 -> bw=16 at out_w=112, tap
    # span <=25 source cols = 75 lanes) fit a 2-slice window, skipping
    # HALF the per-slice work (H-dots AND weight builds) of a 4-slice
    # source.  A window covers lane spans up to xwin*128 - 127 (the
    # 128-alignment slack), so xwin >= 2 is the useful minimum; any
    # tile whose taps overflow the window falls back to the exact
    # full pass (xlo = -1), so the choice is performance-only.
    # ``rows_per_tile`` is re-picked so tp = rows*bw stays a multiple
    # of 128 (the out-block lane dim), minimising padded output rows,
    # capped at band/2 rows so the y-band keeps headroom for taps.
    #
    # DEFAULT ON for alignment-shaped warps (round 5, measured:
    # benchmarks/exp_warp_xwin.py — bw=16/xwin=2 is ~15% faster on
    # mixed alignment transforms and ~35% on frame-filling faces than
    # the unwindowed kernel, and within noise on extreme downscales
    # where the window barely fits): small outputs whose width splits
    # into 16-px column blocks over a 3+-slice source engage
    # (out_w/16, 2) automatically.  A tap span that overflows the
    # 129-lane window only costs the exact per-tile fallback.
    # ``xblocks=0`` = auto (the default); ``1`` = explicitly unwindowed
    # (A/B probes); ``>1`` = explicit block count.
    n_xb = xblocks
    if n_xb == 0:
        if out_w % 16 == 0 and out_w <= 256 and wcn // 128 >= 3:
            # Auto: 16-px column blocks; an explicit ``xwin`` rides the
            # auto block count (the caller tunes window width only).
            n_xb = out_w // 16
            xwin = xwin or 2
        else:
            n_xb = 1
    xw = 0
    if n_xb > 1 and out_w % n_xb == 0:
        import math as _math

        total_slices = wcn // 128
        bw = out_w // n_xb
        want = xwin if xwin else total_slices - 1
        if 2 <= want < total_slices:
            g = 128 // _math.gcd(bw, 128)
            cap = min(out_h, max(g, band // 2))
            cand = [r for r in range(g, cap + 1, g) if r * bw <= tile_px]
            if cand:
                rows_per_tile = min(
                    cand, key=lambda r: (-(-out_h // r) * r - out_h, -r))
                xw = want
            else:
                n_xb = 1
        else:
            n_xb = 1
    else:
        n_xb = 1
    if xw == 0:
        n_xb = 1

    n_tiles = -(-out_h // rows_per_tile)
    tp = rows_per_tile * out_w

    Ainv = _inv2x2(Ms[:, :, :2].astype(jnp.float32))
    bvec = Ms[:, :, 2].astype(jnp.float32)
    scal = jnp.concatenate([Ainv.reshape(n, 4), bvec], axis=1)

    imgsn = imgs.astype(jnp.float32).reshape(n, h, w * c)
    if wcn > w * c or h_blk > h:
        imgsn = jnp.pad(imgsn, ((0, 0), (0, h_blk - h),
                                (0, wcn - w * c)))

    if banded:
        ylo = _band_offsets(Ainv, bvec, out_size, rows_per_tile,
                            band, h, border)
    else:
        band = h
        ylo = jnp.zeros((n, n_tiles), jnp.int32)

    if n_xb > 1:
        xlo = _xband_offsets(Ainv, bvec, out_size, rows_per_tile,
                             n_xb, xw, w, c, wcn, border)
    else:
        xlo = jnp.zeros((n, n_tiles * n_xb), jnp.int32)
    cpad = 8
    out = _banded_warp_call(imgsn, scal, ylo, xlo, out_size=out_size,
                            band=band, rows_per_tile=rows_per_tile,
                            h=h, w=w, c=c, cpad=cpad, border=border,
                            interpret=interpret, n_xb=n_xb, xwin=xw)
    # (n, cpad, P) lane-packed -> NHWC: the slice+transpose reads/writes
    # only the logical bytes (XLA relayout, measured ~0.007 ms/64
    # standalone) — vs ~1.1 ms/64 the kernel paid to store a (P, 8)
    # minor dim padded to 128 lanes.
    if n_xb == 1:
        chips = jnp.swapaxes(out[:, :c, : out_h * out_w], 1, 2)
        return _cast_like(chips.reshape(n, out_h, out_w, c), imgs.dtype)
    # Blocked layout: (n, cpad, T, XB, rpt, bw) -> (n, H, W, C).
    bw = out_w // n_xb
    chips = out[:, :c].reshape(n, c, n_tiles, n_xb, rows_per_tile, bw)
    chips = chips.transpose(0, 2, 4, 3, 5, 1)
    return _cast_like(
        chips.reshape(n, n_tiles * rows_per_tile, out_w, c)[:, :out_h],
        imgs.dtype)


def affine_warp(
    img: jnp.ndarray, M: jnp.ndarray, out_size: tuple[int, int],
    border: str = "zero",
) -> jnp.ndarray:
    """Single-image ``affine_warp_batch`` (cv2.warpAffine equivalent)."""
    return affine_warp_batch(img[None], M[None], out_size, border=border)[0]


def _crop_weights(boxes, out_size, h, w):
    """Per-box separable bilinear interpolation matrices.

    Returns wy (K, out_h, H) and wx (K, out_w, W) f32 tap weights with
    cv2-style half-pixel sample grids, coordinates clamped INTO the box:
    when the box is smaller than out_size (upscale, e.g. 20 px P-Net
    boxes -> 24x24 R-Net crops) the half-pixel grid extends past the box
    edge, and the reference's crop-then-cv2.resize replicates the crop's
    own border row there — it never reads image pixels outside the box.
    For downscale the grid already stays inside, so the clamp is a no-op.
    Out-of-image taps get zero weight, which IS the zero border.
    """
    out_h, out_w = out_size
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    sx = (x2 - x1 + 1.0) / out_w
    sy = (y2 - y1 + 1.0) / out_h
    src_y = ((jnp.arange(out_h, dtype=jnp.float32)[None, :] + 0.5)
             * sy[:, None] - 0.5 + y1[:, None])           # (K, out_h)
    src_x = ((jnp.arange(out_w, dtype=jnp.float32)[None, :] + 0.5)
             * sx[:, None] - 0.5 + x1[:, None])           # (K, out_w)
    src_y = jnp.clip(src_y, y1[:, None], y2[:, None])
    src_x = jnp.clip(src_x, x1[:, None], x2[:, None])
    wy = jnp.maximum(
        0.0, 1.0 - jnp.abs(src_y[:, :, None]
                           - jnp.arange(h, dtype=jnp.float32)))  # (K,oh,H)
    wx = jnp.maximum(
        0.0, 1.0 - jnp.abs(src_x[:, :, None]
                           - jnp.arange(w, dtype=jnp.float32)))  # (K,ow,W)
    return wy, wx


def _crop_epilogue(out, offset, scale, out_dtype, in_dtype):
    """Fused affine post-transform ``(out - offset) * scale`` on the f32
    accumulator BEFORE the out_dtype cast.  This is how the cascade folds
    preprocess.mtcnn's centering into the crop: casting raw uint8-range
    pixels to bf16 quantises mid-gray values (~128) at ~1.0 spacing, but
    the centered-and-scaled values live in [-1, 1] where bf16 spacing is
    ~2^-9 — the cast loses <0.01 pixel LSB instead of up to 0.5."""
    if offset is not None:
        out = out - jnp.float32(offset)
    if scale is not None:
        out = out * jnp.float32(scale)
    if out_dtype is not None:
        return out.astype(out_dtype)
    if ((offset is not None or scale is not None)
            and jnp.issubdtype(jnp.dtype(in_dtype), jnp.integer)):
        # The affine fold moves values out of the input's integer range
        # ([-1, 1] for the mtcnn fold) — casting back would collapse the
        # crops to {0, 1}.  Centered output stays float.
        return out
    return _cast_like(out, in_dtype)


def crop_and_resize(
    img: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: tuple[int, int],
    compute_dtype=None,
    out_dtype=None,
    offset: float | None = None,
    scale: float | None = None,
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
    wy, wx = _crop_weights(boxes, out_size, h, w)
    # ``compute_dtype=bfloat16`` halves the HBM traffic of the weight and
    # row intermediates; tap weights are exact to ~2^-8, i.e. <=1 LSB on
    # uint8-range pixels — the budget the cascade's conv stages already
    # accept.  The coordinates stay f32 (never through a matmul).
    # ``out_dtype`` lets a bf16 consumer (the R/O-Net towers) skip the
    # f32 round trip of the crop batch entirely.
    cdt = compute_dtype or jnp.float32
    rows = jnp.einsum("koh,hwc->kowc", wy.astype(cdt), img.astype(cdt),
                      preferred_element_type=jnp.float32)
    out = jnp.einsum("kpw,kowc->kopc", wx.astype(cdt), rows.astype(cdt),
                     preferred_element_type=jnp.float32)
    return _crop_epilogue(out, offset, scale, out_dtype, img.dtype)


def crop_and_resize_gather(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    img_ids: jnp.ndarray,
    out_size: tuple[int, int],
    compute_dtype=None,
    out_dtype=None,
    offset: float | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """Per-candidate crops across an image batch (the crowd profile's
    pooled-budget path, detect/cascade.py).

    ``images``: (N, H, W, C); ``boxes``: (T, 4); ``img_ids``: (T,) int —
    candidate t crops box t from image ``img_ids[t]``.  Same numerics
    contract as ``crop_and_resize``; regions outside the image contribute
    zeros.

    TPU formulation: the separable interpolation of ``crop_and_resize``
    with a leading candidate axis; the per-candidate source image enters
    the y-pass batched einsum through a row gather of the (N, H, W*C)
    flat batch.  The gather materialises a (T, H, W*C) compute-dtype
    intermediate — candidates arriving SORTED BY IMAGE make those rows
    HBM-contiguous runs (the pooling path sorts; unsorted inputs are
    merely slower).  Measured in-pipeline at ~0.6-1.6 ms per pooled
    stage at the crowd defaults (benchmarks/bench_crowd.py,
    BENCHMARKS.md round-5 dense table) — pooling-invariant, small next
    to the pooled towers it feeds.
    """
    out_h, out_w = out_size
    n, h, w, c = images.shape
    wy, wx = _crop_weights(boxes, out_size, h, w)
    cdt = compute_dtype or jnp.float32
    flat = images.astype(cdt).reshape(n, h, w * c)
    gath = flat[img_ids]                                # (T, H, W*C)
    rows = jnp.einsum("toh,thd->tod", wy.astype(cdt), gath,
                      preferred_element_type=jnp.float32)
    rows = rows.reshape(-1, out_h, w, c)
    out = jnp.einsum("tpw,towc->topc", wx.astype(cdt), rows.astype(cdt),
                     preferred_element_type=jnp.float32)
    return _crop_epilogue(out, offset, scale, out_dtype, images.dtype)
