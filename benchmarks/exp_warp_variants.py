"""Experiment: attribute the Pallas align-warp's 3.0 ms/64 cost.

Hypotheses: (a) per-grid-step overhead (64 sequential steps, one per
image); (b) the (tp, W*C) integer-div iota weight build on the VPU.
Variants:
  base     shipped kernel (one image per grid step, `// c` iota)
  fdiv     float-multiply wc_idx build (no integer div)
  g8       8 images per grid step (amortised step overhead)
  g8_fdiv  both
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alink_tpu.ops.umeyama import arcface_template, umeyama

N, SIZE = 64, 160
OUT = (112, 112)


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def _kernel(scal_ref, img_ref, seg_ref, out_ref, *, out_w, rows_per_tile,
            h, w, c, cdt, group, fdiv):
    t = pl.program_id(1)
    tp = rows_per_tile * out_w

    def one(g, _):
        i = pl.program_id(0) * group + g
        a00 = scal_ref[i, 0]
        a01 = scal_ref[i, 1]
        a10 = scal_ref[i, 2]
        a11 = scal_ref[i, 3]
        bx = scal_ref[i, 4]
        by = scal_ref[i, 5]
        p = t * tp + jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
        y = (p // out_w).astype(jnp.float32)
        x = (p % out_w).astype(jnp.float32)
        X = a00 * (x - bx) + a01 * (y - by)
        Y = a10 * (x - bx) + a11 * (y - by)
        h_idx = jax.lax.broadcasted_iota(jnp.int32, (tp, h), 1
                                         ).astype(jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(Y - h_idx))
        rows = jnp.dot(wy.astype(cdt), img_ref[g],
                       preferred_element_type=jnp.float32)
        if fdiv == "fdiv":
            fidx = jax.lax.broadcasted_iota(
                jnp.int32, (tp, w * c), 1).astype(jnp.float32)
            wc_idx = jnp.floor((fidx + 0.5) * (1.0 / c))
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(X - wc_idx))
        elif fdiv == "minimal":
            fidx = jax.lax.broadcasted_iota(
                jnp.int32, (tp, w * c), 1).astype(jnp.float32)
            wx = X - fidx  # no div/abs/max: VPU floor bound
        else:
            wc_idx = (jax.lax.broadcasted_iota(jnp.int32, (tp, w * c), 1)
                      // c).astype(jnp.float32)
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(X - wc_idx))
        out_ref[g] = jnp.dot((rows * wx).astype(cdt), seg_ref[:],
                             preferred_element_type=jnp.float32)
        return 0

    if group == 1:
        one(0, 0)
    else:
        jax.lax.fori_loop(0, group, one, 0)


@partial(jax.jit, static_argnames=("out_size", "group", "fdiv"))
def warp_variant(imgs, Ms, out_size, group=1, fdiv=False):
    n, h, w, c = imgs.shape
    out_h, out_w = out_size
    cdt = jnp.bfloat16
    Ainv = jnp.linalg.inv(Ms[:, :, :2].astype(jnp.float32))
    scal = jnp.concatenate(
        [Ainv.reshape(n, 4), Ms[:, :, 2].astype(jnp.float32)], axis=1)
    bytes_per_px = (h + w * c) * 6
    tile_px = max(out_w, min(2048, (8 << 20) // max(1, bytes_per_px)))
    rows_per_tile = max(1, min(out_h, tile_px // out_w))
    n_tiles = -(-out_h // rows_per_tile)
    tp = rows_per_tile * out_w
    seg = (jax.lax.broadcasted_iota(jnp.int32, (w * c, c), 0) % c
           == jax.lax.broadcasted_iota(jnp.int32, (w * c, c), 1)
           ).astype(cdt)
    out = pl.pallas_call(
        partial(_kernel, out_w=out_w, rows_per_tile=rows_per_tile,
                h=h, w=w, c=c, cdt=cdt, group=group, fdiv=fdiv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // group, n_tiles),
            in_specs=[
                pl.BlockSpec((group, h, w * c), lambda i, t, scal: (i, 0, 0)),
                pl.BlockSpec((w * c, c), lambda i, t, scal: (0, 0)),
            ],
            out_specs=pl.BlockSpec((group, tp, c),
                                   lambda i, t, scal: (i, t, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * tp, c), jnp.float32),
    )(scal, imgs.reshape(n, h, w * c).astype(cdt), seg)
    return out[:, : out_h * out_w].reshape(n, out_h, out_w, c)


def timed(name, fn, *args, iters=50):
    @jax.jit
    def chain(n, *a):
        def body(i, acc):
            out = fn(a[0], a[1] + 0.0 * acc)
            return acc + jnp.mean(out)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    sync(chain(2, *args))
    t0 = time.perf_counter()
    sync(chain(0, *args))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(iters, *args))
    dt = (time.perf_counter() - t0 - ovh) / iters * 1000.0
    print(json.dumps({"variant": name, "ms_per_64": round(dt, 3)}),
          flush=True)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (N, SIZE, SIZE, 3),
                              jnp.float32, 0.0, 255.0)
    lmk = jax.random.uniform(jax.random.PRNGKey(1), (N, 5, 2),
                             jnp.float32, 30.0, 130.0)
    template = arcface_template(OUT)
    Ms = jax.vmap(lambda l: umeyama(l, template))(lmk)

    # correctness cross-check against the shipped kernel
    from alink_tpu.ops.image import affine_warp_batch_pallas
    ref = affine_warp_batch_pallas(imgs, Ms, OUT)
    got = warp_variant(imgs, Ms, OUT, fdiv="fdiv")
    print(json.dumps({"check": "fdiv", "max_err":
                      float(jnp.max(jnp.abs(got - ref)))}), flush=True)

    timed("base_g1", lambda im, m: warp_variant(im, m, OUT, fdiv="base"),
          imgs, Ms)
    timed("fdiv_g1", lambda im, m: warp_variant(im, m, OUT, fdiv="fdiv"),
          imgs, Ms)
    timed("minimal_g1", lambda im, m: warp_variant(im, m, OUT,
                                                   fdiv="minimal"),
          imgs, Ms)


if __name__ == "__main__":
    main()
