"""Output-packed convolution (built; MEASURED NOT PROFITABLE on v5e).

Verdict from benchmarks/bench_packconv.py (2026-08-17): XLA's conv
emitter already runs the cascade-tower shapes at ~30-50 TF/s (R-Net
conv1 0.118 ms for the 8192-crop batch; O-Net conv1 0.508 ms) — the MXU
K/N-padding argument below does NOT translate into wall-clock, while
this packing's patch assembly ((p+2)^2 strided slices concatenated on a
3-48 deep channel axis) is lane-relayout-bound and loses 10-40x
(e.g. rnet1: 5.2 ms packed vs 0.118 plain).  The towers' real cost is
the bandwidth-bound glue at partial lane tiles — addressed by the
crop-grouped towers (models/mtcnn.py groups) instead.  Kept as a
standalone documented op; not integrated anywhere.

Original hypothesis: a VALID 3x3 conv with Cin=3..48 and Cout=10..64
maps onto MXU matmuls of K = kh*kw*Cin and N = Cout — for P-Net's conv1
that is K=27, N=10, i.e. 1.6% of a 128x128 MXU pass.

The packing: compute a p x p block of output pixels per matmul row.
Each block reads a (p+kh-1) x (p+kw-1) input patch, so the matmul
becomes

    (B * Hb * Wb,  P*P*Cin) @ (P*P*Cin,  p*p*Cout),   P = p + kh - 1

with the packed weight matrix W[(dy, dx, ci), (oy, ox, co)] =
kernel[dy-oy, dx-ox, ci, co] where in range, else 0.  Utilisation for
P-Net conv1 at p=4 rises from 1.6% to ~18% of the MXU pass (a ~12x
denser matmul); R/O-Net conv2/3 shapes gain ~2-3x.  Patch extraction is
(p+kh-1)^2 strided slices + a concat (pure XLA, fuses into the matmul's
operand), and the output block layout folds back with one reshape/
transpose (depth-to-space).

Numerics: identical contraction in a different summation order — same
bf16/f32 class as ``lax.conv`` with ``preferred_element_type=float32``.
Equivalence is asserted against lax.conv in tests/test_packconv.py.

Reference provenance: the towers this accelerates are the MXNet det1-3
networks of code/mtcnn_detector.py:52-65.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax


def _pack_weights(kernel: jnp.ndarray, p: int) -> jnp.ndarray:
    """(kh, kw, Cin, Cout) -> (P*P*Cin, p*p*Cout) block weight matrix."""
    kh, kw, cin, cout = kernel.shape
    P, Q = p + kh - 1, p + kw - 1
    w = jnp.zeros((P, Q, cin, p, p, cout), kernel.dtype)
    for oy in range(p):
        for ox in range(p):
            w = w.at[oy:oy + kh, ox:ox + kw, :, oy, ox, :].add(kernel)
    return w.reshape(P * Q * cin, p * p * cout)


def packed_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    p: int = 4,
    preferred_element_type=jnp.float32,
) -> jnp.ndarray:
    """VALID stride-1 conv of NHWC ``x`` with HWIO ``kernel``, computed
    as one dense matmul over p x p output blocks.

    Returns (B, H-kh+1, W-kw+1, Cout), matching
    ``lax.conv_general_dilated(..., padding='VALID')``.
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    ho, wo = h - kh + 1, w - kw + 1
    if ho <= 0 or wo <= 0:
        raise ValueError(f"input {h}x{w} too small for {kh}x{kw} VALID conv")
    p = min(p, ho, wo)
    P, Q = p + kh - 1, p + kw - 1
    hb, wb = -(-ho // p), -(-wo // p)

    # Zero-pad so every p x p output block has a full input patch.
    need_h = (hb - 1) * p + P
    need_w = (wb - 1) * p + Q
    xp = jnp.pad(x, ((0, 0), (0, need_h - h), (0, need_w - w), (0, 0)))

    # Patches via strided slices: rows[dy] selects input rows i*p + dy.
    cols = []
    for dy in range(P):
        for dx in range(Q):
            sl = lax.slice(
                xp,
                (0, dy, dx, 0),
                (b, dy + (hb - 1) * p + 1, dx + (wb - 1) * p + 1, cin),
                (1, p, p, 1),
            )  # (B, Hb, Wb, Cin)
            cols.append(sl)
    patches = jnp.concatenate(cols, axis=-1)  # (B, Hb, Wb, P*Q*Cin)

    wmat = _pack_weights(kernel, p)
    out = jnp.dot(patches.reshape(b * hb * wb, P * Q * cin), wmat,
                  preferred_element_type=preferred_element_type)
    out = out.reshape(b, hb, wb, p, p, cout)
    # Depth-to-space: (B, Hb, p, Wb, p, C) -> (B, Hb*p, Wb*p, C).
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hb * p, wb * p, cout)
    out = out[:, :ho, :wo]
    out = out.astype(preferred_element_type)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv_flops(shape_in, kernel_shape) -> int:
    """Useful MACs*2 of the VALID conv (for benchmark accounting)."""
    b, h, w, cin = shape_in
    kh, kw, _, cout = kernel_shape
    return 2 * b * (h - kh + 1) * (w - kw + 1) * kh * kw * cin * cout
