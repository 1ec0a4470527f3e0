"""Probe what actually bounds the banded warp kernel (~2.2 ms/64).

exp_warp_kernel_split.py showed it is NOT compute-bound: stripping the
VPU weight math (mxu_only) or bf16-ifying it moves nothing.  Remaining
suspects: (a) per-grid-step overhead — 448 steps at ~5 us each; (b) the
narrow (tp, 4)-lane output block whose HBM store uses 4/128 lanes.

Variants (all banded, no pl.when, zero border, image threaded):
  slicewise16   H-dot sliced per 128-lane group (rows_s never
                materialises as (tp, wc)) — same 448 steps
  slicewise36   256 steps (VMEM freed by slicing lets tiles grow)
  slicewise56   128 steps
  outpad128_16  original whole-wc dot, but out block (1, tp, 128)
                (store uses all lanes; slice to 4 outside)
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alink_tpu.ops.image import _band_offsets, _inv2x2
from alink_tpu.ops.umeyama import arcface_template, umeyama

N, SIZE = 64, 160
OUT = (112, 112)
BAND, C4 = 128, 4


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, x, iters=50):
    @jax.jit
    def chain(a0, n):
        def body(i, carry):
            a, acc = carry
            out = fn(a)
            return a + (0.0 * acc).astype(a.dtype), \
                acc + jnp.mean(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, (a0, jnp.float32(0.0)))[1]

    sync(chain(x, 2))
    t0 = time.perf_counter(); sync(chain(x, 0))
    ov = time.perf_counter() - t0
    t0 = time.perf_counter(); sync(chain(x, iters))
    dt = (time.perf_counter() - t0 - ov) / iters * 1000.0
    print(json.dumps({"variant": name, "ms_per_64": round(dt, 3)}),
          flush=True)
    return dt


def _kernel(scal_ref, ylo_ref, img_ref, out_ref, *, out_w, rows_per_tile,
            band, wc, c4, mode, out_lanes):
    i = pl.program_id(0)
    t = pl.program_id(1)
    tp = rows_per_tile * out_w
    a00, a01 = scal_ref[i, 0], scal_ref[i, 1]
    a10, a11 = scal_ref[i, 2], scal_ref[i, 3]
    bx, by = scal_ref[i, 4], scal_ref[i, 5]

    p = t * tp + jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    y = (p // out_w).astype(jnp.float32)
    x = (p % out_w).astype(jnp.float32)
    X = a00 * (x - bx) + a01 * (y - by)
    Y = a10 * (x - bx) + a11 * (y - by)

    y_lo = pl.multiple_of(jnp.maximum(ylo_ref[i, t], 0), 8)
    row = (y_lo + jax.lax.broadcasted_iota(jnp.int32, (tp, band), 1)
           ).astype(jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(Y - row)).astype(jnp.bfloat16)

    lane4 = (jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
             // c4).astype(jnp.float32)
    acc = None
    if mode == "slicewise":
        for s in range(wc // 128):
            rows_s = jnp.dot(wy, img_ref[0, pl.ds(y_lo, band),
                                         s * 128:(s + 1) * 128],
                             preferred_element_type=jnp.float32)
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(
                X - (lane4 + float(s * (128 // c4)))))
            z = rows_s * wx
            acc = z if acc is None else acc + z
    else:
        rows = jnp.dot(wy, img_ref[0, pl.ds(y_lo, band)],
                       preferred_element_type=jnp.float32)
        for s in range(wc // 128):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(
                X - (lane4 + float(s * (128 // c4)))))
            z = rows[:, s * 128:(s + 1) * 128] * wx
            acc = z if acc is None else acc + z
    fold = (jax.lax.broadcasted_iota(jnp.int32, (128, out_lanes), 0) % c4
            == jax.lax.broadcasted_iota(jnp.int32, (128, out_lanes), 1)
            ).astype(jnp.bfloat16)
    out_ref[0] = jnp.dot(acc.astype(jnp.bfloat16), fold,
                         preferred_element_type=jnp.float32)


def call_var(imgs4, scal, ylo, mode, rows_per_tile, out_lanes=C4,
             band=BAND):
    n, h, wc = imgs4.shape
    out_h, out_w = OUT
    n_tiles = -(-out_h // rows_per_tile)
    tp = rows_per_tile * out_w
    return pl.pallas_call(
        partial(_kernel, out_w=out_w, rows_per_tile=rows_per_tile,
                band=band, wc=wc, c4=C4, mode=mode, out_lanes=out_lanes),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n, n_tiles),
            in_specs=[pl.BlockSpec((1, h, wc),
                                   lambda i, t, scal, ylo: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, tp, out_lanes),
                                   lambda i, t, scal, ylo: (i, t, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * tp, out_lanes),
                                       jnp.float32),
    )(scal, ylo, imgs4)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (N, SIZE, SIZE, 3),
                              jnp.float32, 0.0, 255.0)
    tmpl = arcface_template(OUT)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    sc = jax.random.uniform(k1, (N, 1, 1), jnp.float32, 0.8, 1.3)
    off = jax.random.uniform(k2, (N, 1, 2), jnp.float32, 5.0, 40.0)
    jit_ = jax.random.normal(k3, (N, 5, 2)) * 1.5
    sane = tmpl[None] * sc + off + jit_
    Ms = jax.vmap(lambda l: umeyama(l, tmpl))(sane)

    wc = -(-(SIZE * C4) // 128) * 128
    imgs4 = jnp.pad(imgs.astype(jnp.bfloat16),
                    ((0, 0), (0, 0), (0, 0), (0, 1))).reshape(
        N, SIZE, SIZE * C4)
    if wc > SIZE * C4:
        imgs4 = jnp.pad(imgs4, ((0, 0), (0, 0), (0, wc - SIZE * C4)))
    Ainv = _inv2x2(Ms[:, :, :2].astype(jnp.float32))
    bvec = Ms[:, :, 2].astype(jnp.float32)
    scal = jnp.concatenate([Ainv.reshape(N, 4), bvec], axis=1)

    ref = None
    for name, mode, rpt, ol, band in (
        ("whole16_b128", "whole", 16, C4, 128),
        ("outpad128_16", "whole", 16, 128, 128),
        ("whole16_b64", "whole", 16, C4, 64),
        ("whole16_b32", "whole", 16, C4, 32),
        ("outpad128_b32", "whole", 16, 128, 32),
    ):
        ylo = _band_offsets(Ainv, bvec, OUT, rpt, band, SIZE, "zero")
        novf = int(jnp.sum(ylo < 0))
        got = jax.jit(lambda z, m=mode, r=rpt, o=ol, yl=ylo, b=band: call_var(
            z, scal, yl, m, r, o, b))(imgs4)
        got = got[:, :, :3]
        oh, ow = OUT
        # reassemble tiles (block t covers output rows [t*rpt, t*rpt+rpt))
        got = got.reshape(N, -(-oh // rpt) * rpt, ow, 3)[:, :oh]
        if ref is None:
            ref = got
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(got - ref)))
        print(json.dumps({"variant": name, "overflow": novf,
                          "max_err_vs_first": err}), flush=True)
        ylo_ = ylo
        timed(name, lambda z, m=mode, r=rpt, o=ol, yl=ylo_, b=band: call_var(
            z, scal, yl, m, r, o, b), imgs4)


if __name__ == "__main__":
    main()
