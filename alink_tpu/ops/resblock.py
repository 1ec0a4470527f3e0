"""Fused bf16 ResNet bottleneck blocks on the chainable flat layout.

Why: the VGGFace-ResNet50 teacher (reference: code/siamese.py:203-216)
measures only ~44 TF/s under XLA's conv emitter, and the stage ablation in
BENCHMARKS.md attributes it: the bottleneck 1x1 convs at 56²x256 have
arithmetic intensity ~51 FLOP/byte, so every block round-trips its ~400 MB
activation tensor through HBM several times and stage 1 caps at the
bandwidth roofline (~42 TF/s), not the MXU.  Fusing a whole
1x1 -> 3x3 -> 1x1 (+ residual, BN and relu folded) block into one kernel
reads x once and writes out once: AI rises to ~136 FLOP/byte and the block
becomes MXU-bound.

Layout: the same flat padded row scheme as ops/qconv.py (rows = pixels,
lanes = channels, `wp` pad columns absorb horizontal wrap, `lead` zero
rows absorb the first tile's taps) — a 3x3 tap is a sublane shift, so the
spatial conv is 9 shifted MXU matmuls over a y1 band computed in-VMEM.
Blocks chain without leaving the format, so a whole ResNet stage costs
one read of its input and one write of its output per block.

Semantics: stride-1 bottleneck only (13 of ResNet50's 16 blocks; strided
blocks and the stem stay on XLA).  BatchNorm is inference-mode folded to
scale/shift (the backbone runs frozen, code/siamese.py:215-216).

MEASURED OUTCOME (BENCHMARKS.md): numerically correct at bf16 parity but
57 TF/s real at the stage-2 shape vs XLA's 86 — the per-tap matmuls'
K=N=Cm are too small for the MXU (and stage1's Cm=64 pads 4x), while
XLA's emitter already fuses the BN/relu chains this kernel was built to
save.  Kept as a standalone op (like ops/qconv.py); the shipped
VGGFaceResNet50 forward stays on XLA.  ``vggface_resnet50_fused_apply``
(models/resnet.py) remains the integration point if the economics change
(e.g. wider mid-channels or an int8 activation path).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alink_tpu.ops.qconv import (FlatLayout, _rup, add_lead, flat_layout,
                                 flat_to_nhwc, nhwc_to_flat)


class BottleneckWeights(NamedTuple):
    """One stride-1 bottleneck, BN folded to (scale, shift).

    w1: (Cin, Cm)   1x1 reduce      s1/b1: (Cm,)
    w3: (3, 3, Cm, Cm) 3x3          s2/b2: (Cm,)
    w2: (Cm, Cout)  1x1 expand      s3/b3: (Cout,)
    wp: (Cin, Cout) projection shortcut (None = identity, Cin == Cout)
    sp/bp: (Cout,) projection BN
    """

    w1: jnp.ndarray
    s1: jnp.ndarray
    b1: jnp.ndarray
    w3: jnp.ndarray
    s2: jnp.ndarray
    b2: jnp.ndarray
    w2: jnp.ndarray
    s3: jnp.ndarray
    b3: jnp.ndarray
    wp: jnp.ndarray | None = None
    sp: jnp.ndarray | None = None
    bp: jnp.ndarray | None = None


def _block_kernel(x_hbm, w1_ref, w3_ref, w2_ref, wp_ref, sc1_ref, sc2_ref,
                  sc3_ref, scp_ref, o_ref, xs, y1s, sem, *, lo: FlatLayout,
                  tm: int, tin: int, has_proj: bool):
    """One row-tile: the whole bottleneck with y1/y2 resident in VMEM.

    xs covers x flat rows [t*tm, t*tm + tin).  The y1 band for the 3x3
    spans out rows [t*tm - wp - 1, t*tm + tm + wp + 1), i.e. xs rows
    [lead - wp - 1, lead - wp - 1 + tm + 2wp + 2) — in range because
    lead >= wp + 2.  Non-pixel rows are masked to zero at every stage
    whose bias could make them nonzero (they are the next tap's padding).

    The y1 band is staged through the ``y1s`` VMEM scratch so the 9 tap
    operands are *ref slices* (the MXU reads VMEM at a sublane offset for
    free) — slicing a live value instead forces a register relayout per
    tap, which measured ~4x slower end to end.
    """
    wp_, r, lead = lo.wp, lo.r, lo.lead
    t = pl.program_id(0)
    dma = pltpu.make_async_copy(x_hbm.at[pl.ds(t * tm, tin), :], xs, sem)
    dma.start()
    dma.wait()

    tb = tm + 2 * wp_ + 2

    def valid_mask(q0, rows):
        q = q0 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        rp = q % r
        col = rp % wp_
        return ((col >= 1) & (col <= lo.w)
                & (rp >= wp_) & (rp < (lo.h + 1) * wp_))

    # y1 = relu(bn1(x @ w1)) on the halo band, masked to pixel rows.
    xband = xs[lead - wp_ - 1: lead - wp_ - 1 + tb, :]
    y1 = jax.lax.dot_general(xband, w1_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    y1 = jnp.maximum(y1 * sc1_ref[0:1] + sc1_ref[1:2], 0.0)
    y1 = jnp.where(valid_mask(t * tm - wp_ - 1, tb), y1, 0.0)
    y1s[0:tb] = y1.astype(jnp.bfloat16)

    # 3x3 as 9 sublane-shifted matmuls (ref-sliced from scratch),
    # SSA-accumulated in f32.
    acc = None
    for k in range(9):
        dy, dx = divmod(k, 3)
        off = dy * wp_ + dx
        p = jax.lax.dot_general(
            y1s[off:off + tm, :], w3_ref[k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = p if acc is None else acc + p
    y2 = jnp.maximum(acc * sc2_ref[0:1] + sc2_ref[1:2], 0.0)
    y2 = y2.astype(jnp.bfloat16)

    # y3 = bn3(y2 @ w2); shortcut (projected or identity); relu; mask.
    y3 = jax.lax.dot_general(y2, w2_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    y3 = y3 * sc3_ref[0:1] + sc3_ref[1:2]
    sc = xs[lead:lead + tm, :]
    if has_proj:
        shortcut = jax.lax.dot_general(
            sc, wp_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        shortcut = shortcut * scp_ref[0:1] + scp_ref[1:2]
    else:
        shortcut = sc.astype(jnp.float32)
    out = jnp.maximum(y3 + shortcut, 0.0)
    out = jnp.where(valid_mask(t * tm, tm), out, 0.0)
    o_ref[:] = out.astype(jnp.bfloat16)


def _pad_lanes(a, target, axis=-1):
    pad = target - a.shape[axis]
    if pad == 0:
        return a
    cfg = [(0, 0)] * a.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(a, cfg)


def bottleneck_s1_flat(
    xf: jnp.ndarray,
    wts: BottleneckWeights,
    lo: FlatLayout,
    vmem_budget_bytes: int = 10 * 1024 * 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused stride-1 bottleneck on flat activations (chainable).

    Args:
        xf: (>= lo.rows, Cin_padded) bf16 flat input (``nhwc_to_flat`` /
            ``add_lead`` format, WITH lead rows).
    Returns:
        (rows', Cout_padded) *headless* bf16 flat rows — ``add_lead``
        before the next block, or ``flat_to_nhwc`` to exit.
    """
    cin, cm = wts.w1.shape
    cout = wts.w2.shape[1]
    cin_p = _rup(cin, 128)
    cm_p = _rup(cm, 128)
    cout_p = _rup(cout, 128)
    has_proj = wts.wp is not None
    if not has_proj and cin_p != cout_p:
        raise ValueError("identity shortcut requires Cin == Cout")

    if xf.shape[1] == cin and cin_p != cin:
        xf = jnp.pad(xf, ((0, 0), (0, cin_p - cin)))
    elif xf.shape[1] != cin_p:
        raise ValueError(f"xf channels {xf.shape[1]} != {cin} ({cin_p})")

    w1 = _pad_lanes(_pad_lanes(wts.w1, cin_p, 0), cm_p).astype(jnp.bfloat16)
    w3 = _pad_lanes(_pad_lanes(wts.w3, cm_p, 2), cm_p).astype(
        jnp.bfloat16).reshape(9, cm_p, cm_p)
    w2 = _pad_lanes(_pad_lanes(wts.w2, cm_p, 0), cout_p).astype(jnp.bfloat16)
    if has_proj:
        wproj = _pad_lanes(_pad_lanes(wts.wp, cin_p, 0), cout_p).astype(
            jnp.bfloat16)
        sp = _pad_lanes(wts.sp[None], cout_p)
        bp = _pad_lanes(wts.bp[None], cout_p)
    else:
        # Dummy: the kernel's has_proj=False branch never reads it, but a
        # full (Cin, Cout) zero buffer would still occupy VMEM (8.4 MB at
        # stage-4 widths, collapsing the row tile).
        wproj = jnp.zeros((8, 128), jnp.bfloat16)
        sp = jnp.ones((1, cout_p), jnp.float32)
        bp = jnp.zeros((1, cout_p), jnp.float32)

    # (2, C) stacked scale/shift per BN.
    sc1 = jnp.concatenate([_pad_lanes(wts.s1[None], cm_p),
                           _pad_lanes(wts.b1[None], cm_p)]).astype(jnp.float32)
    sc2 = jnp.concatenate([_pad_lanes(wts.s2[None], cm_p),
                           _pad_lanes(wts.b2[None], cm_p)]).astype(jnp.float32)
    sc3 = jnp.concatenate([_pad_lanes(wts.s3[None], cout_p),
                           _pad_lanes(wts.b3[None], cout_p)]).astype(
        jnp.float32)
    scp = jnp.concatenate([sp, bp]).astype(jnp.float32)

    fixed = 2 * (cin_p * cm_p + 9 * cm_p * cm_p + cm_p * cout_p
                 + (cin_p * cout_p if has_proj else 0)) \
        + 4 * 8 * (2 * cm_p + 2 * cout_p)
    # Per out row: xs (cin bf16) + y1 band (cm bf16) + acc/y2 (cm f32+bf16)
    # + y3/out (cout f32 + bf16).
    per_row = 2 * cin_p + 2 * cm_p + 6 * cm_p + 6 * cout_p
    body = lo.n * lo.r
    tm = max(32, min(2048,
                     _rup((vmem_budget_bytes - fixed) // per_row, 32) - 64,
                     _rup(body, 32)))
    n_tiles = -(-body // tm)
    tin = _rup(tm + lo.lead + lo.wp + 2, 32)

    need = n_tiles * tm + tin - tm
    if xf.shape[0] < need:
        xf = jnp.pad(xf, ((0, need - xf.shape[0]), (0, 0)))
    else:
        xf = xf[:need]

    kern = functools.partial(_block_kernel, lo=lo, tm=tm, tin=tin,
                             has_proj=has_proj)
    vspec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda t: (0,) * len(shape), memory_space=pltpu.VMEM)
    flops_mm = 2 * (cin_p * cm_p + 9 * cm_p * cm_p + cm_p * cout_p
                    + (cin_p * cout_p if has_proj else 0))
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # manual halo DMA
            vspec((cin_p, cm_p)),
            vspec((9, cm_p, cm_p)),
            vspec((cm_p, cout_p)),
            vspec(tuple(wproj.shape)),
            vspec((2, cm_p)), vspec((2, cm_p)),
            vspec((2, cout_p)), vspec((2, cout_p)),
        ],
        out_specs=pl.BlockSpec((tm, cout_p), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tm, cout_p), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((tin, cin_p), jnp.bfloat16),
            pltpu.VMEM((_rup(tm + 2 * lo.wp + 2, 32), cm_p), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n_tiles * tm * flops_mm,
            bytes_accessed=n_tiles * 2 * (tin * cin_p + tm * cout_p),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, w1, w3, w2, wproj, sc1, sc2, sc3, scp)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bottleneck_chain(
    x: jnp.ndarray,
    blocks: tuple[BottleneckWeights, ...],
    interpret: bool = False,
) -> jnp.ndarray:
    """Run a chain of stride-1 bottlenecks: NHWC in, NHWC out, flat layout
    held across the whole chain (one HBM read + write per block)."""
    n, h, w, c = x.shape
    lo = flat_layout(n, h, w)
    xf = nhwc_to_flat(x.astype(jnp.bfloat16), lo)
    for wts in blocks:
        xf = add_lead(bottleneck_s1_flat(xf, wts, lo, interpret=interpret),
                      lo)
    cout = blocks[-1].w2.shape[1]
    return flat_to_nhwc(xf[lo.lead:], lo)[..., :cout]
