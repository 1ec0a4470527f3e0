"""Int8 3x3 convolution as a Pallas implicit-GEMM kernel, with a
chainable flat activation layout for whole-stage int8 inference.

Why this exists: the v5e MXU runs int8 at 2x its bf16 rate, and plain XLA
reaches that rate for *matmuls* (measured 376 TOPS vs 177 TFLOP/s bf16 on
this chip) but NOT for convolutions (int8 conv lowers to only ~+27% over
bf16, ``benchmarks/bench_int8_conv.py``).  The ArcFace LResNet100E-II
embedder (reference: ``code/face_model.py:28-41``) is conv-bound and at
the bf16 roofline already (BENCHMARKS.md), so the remaining headroom
requires expressing the conv as int8 matmuls without materialising an
im2col in HBM (which would make it bandwidth-bound).

Kernel formulation (implicit GEMM on a flat padded layout):

- **Flat layout**: a batch of zero-padded images lives in one 2D int8
  array of shape (lead + n * r, C).  Row ``lead + i * r + (y+1)*Wp +
  (x+1)`` holds the channels of pixel (y, x) of image i, where
  ``Wp >= W + 2`` pad columns absorb horizontal wrap-around, the tail of
  each image's ``r`` rows absorbs vertical halos, and the ``lead`` rows
  of zeros at the top let the first tile's taps read in-bounds.  All
  non-pixel rows are zero.
- A 3x3 tap (dy, dx) is then a pure row shift by ``(dy-1)*Wp + (dx-1)``
  — the 9 taps are 9 MXU matmuls whose A operands are *sublane-shifted
  slices of the same DMA'd VMEM tile*, SSA-accumulated in int32.  Mosaic
  feeds misaligned slices to the MXU essentially for free; measured 340
  TOPS (padded) at the dominant LResNet100 stage shape, vs 143 TOPS for
  an explicit in-VMEM im2col (copy-bound) and ~100 TOPS for per-tap
  int32 output shifting (accumulator-traffic-bound).
- The grid tiles the *global* row space; images are invisible to the
  kernel.  Output rows carry the SAME layout as input rows, so convs
  chain without leaving the format; a fused epilogue masks every
  non-pixel row back to zero (the next conv's taps rely on it).
- Epilogues (fused, per output channel):
    * ``affine``:      out = acc * scale + bias            (bf16/f32)
    * ``prelu_quant``: z = acc * scale + bias;
                       d = z if z >= 0 else alpha * z;     (PReLU)
                       out = clip(round(d * qscale))       (int8)
  ``prelu_quant`` keeps a whole BN-Conv-BN-PReLU-Conv IR-unit chain
  (reference ``code/face_model.py`` topology) inside int8 flat layout
  with zero intermediate HBM round-trips in higher precision.

Channel counts are padded to 128 lanes (int8 lane tile), row counts to
32 (int8 sublane tile).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rup(x: int, m: int) -> int:
    return -(-x // m) * m


def quantize(x: jnp.ndarray, scale) -> jnp.ndarray:
    """Symmetric int8 quantisation: round(x / scale) clipped to [-127, 127]."""
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


class FlatLayout(NamedTuple):
    """Geometry of the chainable flat activation buffer (see module doc)."""

    n: int       # images
    h: int       # pixel rows
    w: int       # pixel cols
    wp: int      # padded row width (>= w + 2, multiple of 8)
    r: int       # rows per image (multiple of lcm(32, wp))
    lead: int    # zero rows at the top (multiple of 32, >= wp + 2)

    @property
    def rows(self) -> int:
        return self.lead + self.n * self.r


def flat_layout(n: int, h: int, w: int) -> FlatLayout:
    wp = _rup(w + 2, 8)
    lcm = wp * 32 // math.gcd(wp, 32)
    r = _rup((h + 2) * wp, lcm)
    lead = _rup(wp + 2, 32)
    return FlatLayout(n, h, w, wp, r, lead)


def nhwc_to_flat(x: jnp.ndarray, lo: FlatLayout) -> jnp.ndarray:
    """(N, H, W, C) -> conv *input* format: (lead + N*r, C), zeros in all
    non-pixel rows.  Conv *outputs* are headless (no lead band); use
    ``add_lead`` to feed one conv's output into the next."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, lo.wp - w - 1), (0, 0)))
    xf = xp.reshape(n, (h + 2) * lo.wp, c)
    xf = jnp.pad(xf, ((0, 0), (0, lo.r - (h + 2) * lo.wp), (0, 0)))
    xf = xf.reshape(n * lo.r, c)
    return jnp.pad(xf, ((lo.lead, 0), (0, 0)))


def add_lead(f: jnp.ndarray, lo: FlatLayout) -> jnp.ndarray:
    """Headless conv output -> conv input format (prepend lead zeros)."""
    return jnp.pad(f[:lo.n * lo.r], ((lo.lead, 0), (0, 0)))


def flat_to_nhwc(f: jnp.ndarray, lo: FlatLayout) -> jnp.ndarray:
    """Headless flat rows (>= N*r, C) -> (N, H, W, C) pixel rows."""
    c = f.shape[-1]
    body = f[:lo.n * lo.r].reshape(lo.n, lo.r, c)
    body = body[:, lo.wp:(lo.h + 1) * lo.wp].reshape(
        lo.n, lo.h, lo.wp, c)
    return body[:, :, 1:lo.w + 1]


def _conv_kernel(x_hbm, w_ref, s_ref, b_ref, a_ref, q_ref, o_ref, xs, sem,
                 *, lo: FlatLayout, tm: int, tin: int, epilogue: str,
                 out_dtype):
    """One row-tile grid step (see module docstring).

    x_hbm: (rows, cin) int8 in ANY/HBM — halo tile DMA'd per step.
    w_ref: (9, cin, cout) int8 VMEM, tap k = dy * 3 + dx.
    s_ref/b_ref: (1, cout) f32 dequant scale / bias.
    a_ref/q_ref: (1, cout) f32 PReLU alpha / requant scale
        (prelu_quant epilogue; ignored for affine).
    o_ref: (tm, cout) out block, same flat layout as the input.
    xs:    (tin, cin) int8 scratch covering taps for out rows
        [t*tm, t*tm + tm).  Out row q is pixel-space (headless); its
        taps live at input rows q + lead - wp - 1 + {0 .. 2wp+2}, so the
        DMA starts at the aligned input row t*tm and the tap base
        ``lead - wp - 1`` is >= 0 because lead >= wp + 2.
    """
    wp, r, lead = lo.wp, lo.r, lo.lead
    t = pl.program_id(0)
    dma = pltpu.make_async_copy(x_hbm.at[pl.ds(t * tm, tin), :], xs, sem)
    dma.start()
    dma.wait()
    acc = None
    base = lead - wp - 1  # out row q reads rows q + base + {0..2wp+2}
    for k in range(9):
        dy, dx = divmod(k, 3)
        off = base + dy * wp + dx
        p = jax.lax.dot_general(
            xs[off:off + tm, :], w_ref[k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = p if acc is None else acc + p
    z = acc.astype(jnp.float32) * s_ref[:] + b_ref[:]
    # Validity mask: pixel rows only — everything else must stay zero so
    # the next conv's taps read true zero padding.
    q = t * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
    rp = q % r
    col = rp % wp
    valid = ((col >= 1) & (col <= lo.w)
             & (rp >= wp) & (rp < (lo.h + 1) * wp))
    if epilogue == "affine":
        o_ref[:] = jnp.where(valid, z, 0.0).astype(out_dtype)
    elif epilogue == "prelu_quant":
        d = jnp.where(z >= 0, z, a_ref[:] * z)
        q8 = jnp.clip(jnp.round(d * q_ref[:]), -127, 127)
        o_ref[:] = jnp.where(valid, q8, 0).astype(jnp.int8)
    else:
        raise ValueError(f"unknown epilogue {epilogue!r}")


def conv3x3_s1_int8_flat(
    xf: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    lo: FlatLayout,
    alpha: jnp.ndarray | None = None,
    quant_scale: jnp.ndarray | None = None,
    epilogue: str = "affine",
    out_dtype=jnp.bfloat16,
    vmem_budget_bytes: int = 8 * 1024 * 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stride-1 SAME 3x3 conv on the flat layout (chainable).

    Args:
        xf: (>= lo.rows, Cin) int8 flat activations (``nhwc_to_flat``).
        w: (3, 3, Cin, Cout) int8 weights (HWIO).
        scale/bias: (Cout,) f32 dequant scale / bias (BatchNorm folded).
        alpha/quant_scale: (Cout,) f32 for the ``prelu_quant`` epilogue.
    Returns:
        (rows', Cout) *headless* flat activations (rows' >= lo.n * lo.r,
        no lead band) — ``add_lead`` before the next
        ``conv3x3_s1_int8_flat``, or ``flat_to_nhwc`` to leave the
        format.
    """
    cin = w.shape[2]
    cout = w.shape[3]
    cin_p = _rup(cin, 128)
    cout_p = _rup(cout, 128)
    if xf.shape[1] == cin and cin_p != cin:
        xf = jnp.pad(xf, ((0, 0), (0, cin_p - cin)))
    elif xf.shape[1] != cin_p:
        raise ValueError(
            f"xf has {xf.shape[1]} channels; weights expect {cin} "
            f"(padded {cin_p})")
    if cin_p != cin:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))
    if cout_p != cout:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, cout_p - cout)))
        scale = jnp.pad(scale, (0, cout_p - cout))
        bias = jnp.pad(bias, (0, cout_p - cout))
        if alpha is not None:
            alpha = jnp.pad(alpha, (0, cout_p - cout))
        if quant_scale is not None:
            quant_scale = jnp.pad(quant_scale, (0, cout_p - cout))

    o_dt = jnp.int8 if epilogue == "prelu_quant" else out_dtype
    osz = jnp.dtype(o_dt).itemsize
    fixed = 2 * 9 * cin_p * cout_p + 8 * 8 * cout_p
    per_row = cin_p + cout_p * (4 + 2 * osz)
    body = lo.n * lo.r
    tm = max(32, min(4096,
                     _rup((vmem_budget_bytes - fixed) // per_row, 32) - 64,
                     _rup(body, 32)))
    n_tiles = -(-body // tm)
    tin = _rup(tm + lo.lead + lo.wp + 2, 32)

    need = n_tiles * tm + tin - tm
    if xf.shape[0] < need:
        xf = jnp.pad(xf, ((0, need - xf.shape[0]), (0, 0)))
    else:
        xf = xf[:need]

    ones = jnp.ones((1, cout_p), jnp.float32)
    a_in = ones if alpha is None else alpha[None].astype(jnp.float32)
    q_in = ones if quant_scale is None else (
        quant_scale[None].astype(jnp.float32))

    wk = w.reshape(9, cin_p, cout_p)
    kern = functools.partial(_conv_kernel, lo=lo, tm=tm, tin=tin,
                             epilogue=epilogue, out_dtype=out_dtype)
    vspec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda t: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # manual halo DMA
            vspec((9, cin_p, cout_p)),
            vspec((1, cout_p)), vspec((1, cout_p)),
            vspec((1, cout_p)), vspec((1, cout_p)),
        ],
        out_specs=pl.BlockSpec((tm, cout_p), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tm, cout_p), o_dt),
        scratch_shapes=[
            pltpu.VMEM((tin, cin_p), jnp.int8),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * tm * 9 * cin_p * cout_p,
            bytes_accessed=(n_tiles * (tin * cin_p + tm * cout_p * osz)
                            + 9 * cin_p * cout_p),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, wk, scale[None].astype(jnp.float32),
      bias[None].astype(jnp.float32), a_in, q_in)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "vmem_budget_bytes", "interpret"))
def conv3x3_s1_int8(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    out_dtype=jnp.bfloat16,
    vmem_budget_bytes: int = 8 * 1024 * 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stride-1 SAME 3x3 conv, NHWC API: int8 in, fused dequant out.

    Args:
        x: (N, H, W, Cin) int8 activations.
        w: (3, 3, Cin, Cout) int8 weights (HWIO).
        scale: (Cout,) f32 per-channel dequant scale (act_scale * w_scale).
        bias: (Cout,) f32 per-channel bias (folded BatchNorm).
    Returns:
        (N, H, W, Cout) ``out_dtype`` = scale * (x (*) w) + bias.
    """
    n, h, wdt, _ = x.shape
    lo = flat_layout(n, h, wdt)
    out = conv3x3_s1_int8_flat(
        nhwc_to_flat(x, lo), w, scale, bias, lo, out_dtype=out_dtype,
        vmem_budget_bytes=vmem_budget_bytes, interpret=interpret)
    return flat_to_nhwc(out, lo)[..., :w.shape[3]]


def conv3x3_s1_int8_reference(x, w, scale, bias, out_dtype=jnp.bfloat16):
    """XLA reference (same semantics) for parity tests."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.int32), w.astype(jnp.int32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * scale + bias).astype(out_dtype)
