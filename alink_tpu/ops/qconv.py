"""Int8 3x3 convolution as a Pallas implicit-GEMM kernel.

Why this exists: the v5e MXU runs int8 at 2x its bf16 rate, and plain XLA
reaches that rate for *matmuls* (measured 376 TOPS vs 177 TFLOP/s bf16 on
this chip) but NOT for convolutions (int8 conv lowers to only ~+27% over
bf16, ``benchmarks/bench_int8_conv.py``).  The ArcFace LResNet100E-II
embedder (reference: ``code/face_model.py:28-41``) is conv-bound and at
the bf16 roofline already (BENCHMARKS.md), so the remaining 2x headroom
requires expressing the conv as int8 matmuls without materialising an
im2col in HBM (which would make it bandwidth-bound).

Kernel formulation (implicit GEMM on a flat padded layout):

- Each zero-padded image occupies ``R`` consecutive rows of one giant 2D
  array: row ``p = y * Wp + x`` holds the ``Cin`` channels of pixel
  (y, x), with ``Wp >= W + 2`` pad columns absorbing horizontal
  wrap-around and the inter-image row gap absorbing vertical halos.  A
  3x3 tap (dy, dx) is then a pure row shift by ``dy * Wp + dx``.
- The grid tiles the *global* row space (images are invisible to the
  kernel): per tile, the unshifted input block is DMA'd once and
  multiplied by each of the 9 tap weight matrices — perfectly aligned
  (rows, Cin) @ (Cin, Cout) int8 matmuls with int32 accumulation; the
  tap shift is applied to the *output* of each matmul (a sublane-shifted
  VPU add into the accumulator), never to the MXU operands.
- Per-output-channel dequantisation scale and bias (BatchNorm folding)
  are fused into the epilogue.
- Pad-column/pad-row outputs are computed as garbage and sliced off on
  the XLA side; the tap reads of garbage output rows may cross image
  boundaries, which is harmless for the same reason.

Channel counts are padded to 128 lanes (int8 lane tile), row counts to
32 (int8 sublane tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rup(x: int, m: int) -> int:
    return -(-x // m) * m


def quantize(x: jnp.ndarray, scale) -> jnp.ndarray:
    """Symmetric int8 quantisation: round(x / scale) clipped to [-127, 127]."""
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def _conv_kernel(x_hbm, w_ref, s_ref, b_ref, o_ref, xs, sem,
                 *, wp: int, tm: int, tin: int, out_dtype):
    """One row-tile grid step (see module docstring).

    x_hbm: (rows, cin) int8 in ANY/HBM — halo tile DMA'd per step.
    w_ref: (9, cin, cout) int8 VMEM, tap k = dy * 3 + dx.
    s_ref/b_ref: (1, cout) f32 dequant scale / bias.
    o_ref: (tm, cout) out block.
    xs:    (tin, cin) int8 scratch, tin >= tm + 2 * wp + 2 halo rows.

    The 9 taps are 9 matmuls whose A operands are *sublane-shifted
    slices of the same VMEM buffer*, accumulated as SSA values.  Mosaic
    feeds the misaligned slices to the MXU essentially for free and
    chains the accumulation — measured 340 TOPS padded at 14x14x256
    (dominant LResNet100 stage), vs 143 TOPS for an explicit in-VMEM
    im2col (the copies cost ~40%) and ~100 TOPS for per-tap int32
    output shifting (12+ bytes/elem of VMEM accumulator traffic).
    """
    t = pl.program_id(0)
    dma = pltpu.make_async_copy(x_hbm.at[pl.ds(t * tm, tin), :], xs, sem)
    dma.start()
    dma.wait()
    acc = None
    for k in range(9):
        dy, dx = divmod(k, 3)
        off = dy * wp + dx
        p = jax.lax.dot_general(
            xs[off:off + tm, :], w_ref[k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = p if acc is None else acc + p
    o_ref[:] = (acc.astype(jnp.float32) * s_ref[:] +
                b_ref[:]).astype(out_dtype)


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
    """Stride-1 SAME 3x3 conv: int8 in, int32 accumulate, fused dequant.

    Args:
        x: (N, H, W, Cin) int8 activations.
        w: (3, 3, Cin, Cout) int8 weights (HWIO).
        scale: (Cout,) f32 per-channel dequant scale (act_scale * w_scale).
        bias: (Cout,) f32 per-channel bias (folded BatchNorm).
    Returns:
        (N, H, W, Cout) ``out_dtype`` = scale * (x (*) w) + bias.
    """
    n, h, wdt, cin = x.shape
    cout = w.shape[3]
    cin_p = _rup(cin, 128)
    cout_p = _rup(cout, 128)
    wp = _rup(wdt + 2, 8)

    if cin_p != cin:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cin_p - cin)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))
    if cout_p != cout:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, cout_p - cout)))
        scale = jnp.pad(scale, (0, cout_p - cout))
        bias = jnp.pad(bias, (0, cout_p - cout))

    r = _rup((h + 2) * wp, 32)            # rows per image
    total = n * r
    # Tile rows: fill the VMEM budget.  Per tile row: xs int8, the int32
    # accumulator, a double-buffered out block; the tap weights (double-
    # buffered by the pipeline even though constant) are a fixed cost.
    osz = jnp.dtype(out_dtype).itemsize
    fixed = 2 * 9 * cin_p * cout_p + 4 * 8 * cout_p
    per_row = cin_p + cout_p * (4 + 2 * osz)
    tm = max(32, min(4096,
                     _rup((vmem_budget_bytes - fixed) // per_row, 32) - 64,
                     _rup(total, 32)))
    n_tiles = -(-total // tm)
    tin = _rup(tm + 2 * wp + 2, 32)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - wdt - 1), (0, 0)))
    xf = xp.reshape(n, (h + 2) * wp, cin_p)
    xf = jnp.pad(xf, ((0, 0), (0, r - (h + 2) * wp), (0, 0)))
    xf = xf.reshape(total, cin_p)
    xf = jnp.pad(xf, ((0, n_tiles * tm - total + tin - tm), (0, 0)))

    # Tap-major weights: wk[dy*3+dx] = w[dy, dx] as (cin, cout).
    wk = w.reshape(9, cin_p, cout_p)
    kern = functools.partial(_conv_kernel, wp=wp, tm=tm, tin=tin,
                             out_dtype=out_dtype)
    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # manual halo DMA
            pl.BlockSpec((9, cin_p, cout_p), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout_p), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout_p), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, cout_p), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tm, cout_p), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tin, cin_p), jnp.int8),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * tin * 9 * cin_p * cout_p,
            bytes_accessed=(n_tiles * tin * cin_p
                            + n_tiles * tm * cout_p * 2
                            + 9 * cin_p * cout_p),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, wk, scale[None].astype(jnp.float32),
      bias[None].astype(jnp.float32))

    out = out[:total].reshape(n, r, cout_p)
    out = out[:, :h * wp, :cout].reshape(n, h, wp, cout)
    return out[:, :, :wdt]


def conv3x3_s1_int8_reference(x, w, scale, bias, out_dtype=jnp.bfloat16):
    """XLA reference (same semantics) for parity tests."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.int32), w.astype(jnp.int32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * scale + bias).astype(out_dtype)
